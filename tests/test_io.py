"""I/O round trips: XMF+RAW volumetric fields, VTK polydata, History CSV,
checkpoint save/load, file cache."""

import os
import tempfile

import numpy as np
import pytest

import odil_tpu as odil


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_raw_xmf_roundtrip(dtype):
    u = np.arange(2 * 3 * 4, dtype=dtype).reshape(2, 3, 4)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "field.xdmf2")
        odil.write_raw_with_xmf(u, path, spacing=(0.5, 1.0, 2.0), name="phi", cell=True)
        back, meta = odil.read_raw_with_xmf(path)
        np.testing.assert_array_equal(back, u)
        assert meta["name"] == "phi"
        assert meta["cell"] is True
        assert meta["count"] == (2, 3, 4)


def test_raw_xmf_2d_promotion():
    u = np.random.rand(3, 4).astype(np.float64)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "f.xdmf2")
        odil.write_raw_with_xmf(u, path, spacing=(1, 1), name="u")
        back, meta = odil.read_raw_with_xmf(path)
        np.testing.assert_array_equal(back[0], u)


def test_vtk_poly_ascii():
    points = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=float)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "poly.vtk")
        odil.write_vtk_poly(
            path,
            points,
            polygons=[[0, 1, 2]],
            point_fields={"val": np.array([1.0, 2.0, 3.0])},
            cell_fields={"cid": np.array([7.0])},
        )
        text = open(path, "rb").read().decode()
        assert "POLYDATA" in text
        assert "SCALARS val float" in text
        assert "SCALARS cid float" in text


def test_history_csv(tmp_path):
    os.chdir(tmp_path)
    h = odil.History(csvpath="h.csv", warmup=1)
    h.append("epoch", 0)
    h.append("loss", 1.0)
    h.write()
    h.append("epoch", 1)
    h.append("loss", 0.5)
    h.append("extra", 3.0)  # Late column joins during warmup.
    h.write()
    h.append("epoch", 2)
    h.append("loss", 0.25)
    h.append("extra", 4.0)
    h.write()
    lines = open("h.csv").read().strip().split("\n")
    assert lines[0] == "epoch,loss,extra"
    assert len(lines) == 4  # header + 3 rows
    # Resume via pickle.
    h.save("h.pickle")
    h2 = odil.History()
    h2.load("h.pickle")
    assert h2.get("epoch")[-1] == 2


def test_checkpoint_roundtrip(tmp_path):
    domain = odil.Domain(cshape=(4, 4), dimnames=["x", "y"], multigrid=True, mg_convert_all=False)
    state = domain.init_state(
        odil.State(
            fields={
                "u": np.random.rand(4, 4),
                "mg": domain.regular_to_multigrid(np.random.rand(4, 4)),
                "net": domain.make_neural_net([2, 3, 1]),
                "a": [1.0, 2.0],
            }
        )
    )
    path = str(tmp_path / "ckpt.pickle")
    odil.core.checkpoint_save(domain, state, path, optstate={"m": [np.zeros(3)]})
    state2 = domain.init_state(
        odil.State(
            fields={
                "u": None,
                "mg": domain.regular_to_multigrid(np.zeros((4, 4))),
                "net": domain.make_neural_net([2, 3, 1]),
                "a": [0.0, 0.0],
            }
        )
    )
    opt = odil.core.checkpoint_load(domain, state2, path)
    np.testing.assert_allclose(np.asarray(domain.pack_state(state2)), np.asarray(domain.pack_state(state)))
    assert "m" in opt


def test_cache_to_file(tmp_path):
    calls = []

    @odil.cache.cache_to_file(str(tmp_path / "c.pickle"))
    def slow(x):
        calls.append(x)
        return x * 2

    assert slow(3) == 6
    assert slow(3) == 6
    assert calls == [3]


def test_checkpoint_resume_with_optimizer_slots(tmp_path):
    """Training resumed from a checkpoint with Adam slots continues the
    moment estimates (improvement over the reference, which restarts them)."""
    import argparse

    os.chdir(tmp_path)
    domain = odil.Domain(cshape=(8, 8), dimnames=["x", "y"], multigrid=False)
    ref = np.random.RandomState(0).rand(8, 8)

    def operator(ctx):
        return [ctx.field("u") - ctx.extra.ref]

    def make():
        state = domain.init_state(odil.State(fields={"u": None}))
        extra = argparse.Namespace(ref=domain.cast(ref))
        return odil.Problem(operator, domain, extra), state

    args = argparse.Namespace(
        epochs=50, epoch_start=0, lr=0.1,
        report_every=0, history_every=0, plot_every=0, checkpoint_every=0,
        history_full=0, frames=0, callback_update_state=0,
        bfgs_m=10, bfgs_maxls=20, bfgs_pgtol=None,
        adam_epsilon=None, adam_beta_1=None, adam_beta_2=None,
    )
    problem, state = make()
    odil.util.optimize_grad(args, "adamn", problem, state)
    opt = problem._active_optimizer
    assert opt.slots is not None and "m" in opt.slots
    odil.core.checkpoint_save(domain, state, "ck.pickle", optstate=opt.slots)

    # Resume and verify slots are used (step continues, loss keeps dropping).
    problem2, state2 = make()
    optstate = odil.core.checkpoint_load(domain, state2, "ck.pickle")
    assert optstate is not None and "m" in optstate
    problem2.resume_opt_state = optstate
    loss_mid = problem2.eval_loss_grad(state2)[0]
    args2 = argparse.Namespace(**{**vars(args), "epochs": 100, "epoch_start": 50})
    odil.util.optimize_grad(args2, "adamn", problem2, state2)
    loss_end = problem2.eval_loss_grad(state2)[0]
    assert loss_end < loss_mid


def test_profile_dir_capture(tmp_path):
    """--profile_dir wraps the optimizer run in a jax.profiler trace."""
    import argparse

    os.chdir(tmp_path)
    domain = odil.Domain(cshape=(8,), dimnames=["x"])

    def operator(ctx):
        return [ctx.field("u") - 1.0]

    state = domain.init_state(odil.State(fields={"u": None}))
    problem = odil.Problem(operator, domain)
    args = argparse.Namespace(
        epochs=5, epoch_start=0, lr=0.1,
        report_every=0, history_every=0, plot_every=0, checkpoint_every=0,
        history_full=0, frames=0, callback_update_state=0,
        bfgs_m=10, bfgs_maxls=20, bfgs_pgtol=None,
        adam_epsilon=None, adam_beta_1=None, adam_beta_2=None,
        profile_dir=str(tmp_path / "trace"),
    )
    odil.util.optimize_grad(args, "adamn", problem, state)
    assert (tmp_path / "trace").exists()


def test_orbax_async_checkpointer_roundtrip(tmp_path):
    """Orbax async save/restore of fields + optimizer slots; restore
    defaults to the latest step."""
    from odil_tpu.checkpoint import AsyncCheckpointer

    domain = odil.Domain(cshape=(8, 4), dimnames=["x", "y"])
    rng = np.random.RandomState(0)
    u0 = rng.rand(8, 4).astype(domain.dtype)
    state = domain.init_state(
        odil.State(fields={"u": odil.Field(u0.copy()), "a": odil.Array(np.arange(3.0))})
    )
    ckpt = AsyncCheckpointer(str(tmp_path / "ckpt"))
    optstate = {"m": [np.full((8, 4), 0.5, domain.dtype)], "step": np.asarray(7.0)}
    ckpt.save(domain, state, 10, optstate=optstate)
    # A later step becomes the latest.
    state.fields["u"].array = u0 * 2
    ckpt.save(domain, state, 20)
    ckpt.wait()

    state2 = domain.init_state(odil.State(fields={"u": None, "a": odil.Array(np.zeros(3))}))
    out = ckpt.restore(domain, state2)  # latest (20): no optimizer payload
    assert out is None
    np.testing.assert_allclose(np.asarray(state2.fields["u"].array), u0 * 2, rtol=1e-6)
    out10 = ckpt.restore(domain, state2, step=10)
    np.testing.assert_allclose(np.asarray(state2.fields["u"].array), u0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.fields["a"].array), np.arange(3.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out10["m"][0]), 0.5)
    assert float(np.asarray(out10["step"])) == 7.0
    ckpt.close()


def test_orbax_checkpoint_format_flag(tmp_path):
    """--checkpoint_format orbax routes the periodic checkpoint task
    through the async checkpointer."""
    import argparse

    os.chdir(tmp_path)
    domain = odil.Domain(cshape=(8,), dimnames=["x"])

    def operator(ctx):
        return [ctx.field("u") - 1.0]

    state = domain.init_state(odil.State(fields={"u": None}))
    problem = odil.Problem(operator, domain)
    args = argparse.Namespace(
        epochs=4, epoch_start=0, lr=0.1,
        report_every=0, history_every=0, plot_every=0, checkpoint_every=2,
        checkpoint_format="orbax",
        history_full=0, frames=0, callback_update_state=0,
        bfgs_m=10, bfgs_maxls=20, bfgs_pgtol=None,
        adam_epsilon=None, adam_beta_1=None, adam_beta_2=None,
    )
    callback = odil.util.make_callback(problem, args)
    odil.util.optimize_grad(args, "adamn", problem, state, callback=callback)
    assert callback.cbinfo.orbax is not None
    callback.cbinfo.orbax.wait()
    assert callback.cbinfo.orbax.latest_step() == 4
    from odil_tpu.checkpoint import AsyncCheckpointer

    state2 = domain.init_state(odil.State(fields={"u": None}))
    opt2 = AsyncCheckpointer("checkpoint_orbax")
    optstate = opt2.restore(domain, state2, step=2)
    assert optstate is not None and "m" in optstate  # Adam slots were saved
    np.testing.assert_allclose(
        np.asarray(state2.fields["u"].array).mean(), 
        np.asarray(domain.field(state, "u")).mean(), atol=0.5)
