"""SPMD sharding: loss/grad on a multi-device mesh must match single-device,
and the full training step must compile and run with sharded fields.

Runs on the 8 virtual CPU devices configured in conftest.py (the driver's
dryrun uses the same mechanism)."""

import argparse

import jax
import numpy as np
import pytest

import odil_tpu as odil
from odil_tpu import parallel

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def poisson_like_problem(mesh=None, partition=None, N=16):
    domain = odil.Domain(
        cshape=(N, N),
        dimnames=["x", "y"],
        dtype=np.float64,
        mesh=mesh,
        partition=partition,
    )
    xx, yy = domain.points()
    rhs = np.sin(np.asarray(xx) * np.pi) * np.asarray(yy)

    def operator(ctx):
        mod = ctx.mod
        u = ctx.field("u")
        uxm = ctx.field("u", -1, 0)
        uxp = ctx.field("u", 1, 0)
        uym = ctx.field("u", 0, -1)
        uyp = ctx.field("u", 0, 1)
        hx, hy = ctx.step()
        lap = (uxp - 2 * u + uxm) / hx**2 + (uyp - 2 * u + uym) / hy**2
        return [lap - ctx.extra.rhs, u * 0.1]

    extra = argparse.Namespace(rhs=domain.cast(rhs))
    state = domain.init_state(odil.State(fields={"u": np.random.RandomState(0).rand(N, N)}))
    return odil.Problem(operator, domain, extra), state


def test_mesh_from_spec():
    mesh = parallel.mesh_from_spec("x:2,y:4")
    assert mesh.axis_names == ("x", "y")
    assert mesh.devices.shape == (2, 4)
    mesh = parallel.mesh_from_spec("x:-1")
    assert mesh.devices.size == 8


def test_sharded_loss_matches_single_device():
    problem0, state0 = poisson_like_problem()
    loss0, grads0, terms0, names0, norms0 = problem0.eval_loss_grad(state0)

    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem1, state1 = poisson_like_problem(mesh=mesh, partition={"x": "x", "y": "y"})
    # Sharding must actually be applied to the state array.
    sharding = state1.fields["u"].array.sharding
    assert not sharding.is_fully_replicated
    loss1, grads1, terms1, names1, norms1 = problem1.eval_loss_grad(state1)

    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1), rtol=1e-12)
    for g0, g1 in zip(grads0, grads1):
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-12, atol=1e-12)


def test_sharded_training_step_runs():
    mesh = parallel.mesh_from_spec("x:2,y:2")
    problem, state = poisson_like_problem(mesh=mesh, partition={"x": "x", "y": "y"})
    args = argparse.Namespace(
        epochs=10,
        epoch_start=0,
        lr=0.05,
        report_every=0,
        history_every=0,
        plot_every=0,
        checkpoint_every=0,
        history_full=0,
        frames=0,
        callback_update_state=0,
        bfgs_m=10,
        bfgs_maxls=20,
        bfgs_pgtol=None,
        adam_epsilon=None,
        adam_beta_1=None,
        adam_beta_2=None,
    )
    loss_before = problem.eval_loss_grad(state)[0]
    odil.util.optimize_grad(args, "adamn", problem, state)
    loss_after = problem.eval_loss_grad(state)[0]
    assert loss_after < loss_before


def test_sharded_multigrid_state():
    """Multigrid decomposition with sharded fine level compiles and runs."""
    mesh = parallel.mesh_from_spec("x:2")
    domain = odil.Domain(
        cshape=(16, 16),
        dimnames=["x", "y"],
        dtype=np.float64,
        multigrid=True,
        mesh=mesh,
        partition={"x": "x"},
    )

    def operator(ctx):
        return [ctx.field("u") - 1.0]

    state = domain.init_state(odil.State(fields={"u": None}))
    problem = odil.Problem(operator, domain)
    loss, grads, *_ = problem.eval_loss_grad(state)
    assert np.isfinite(np.asarray(loss))


def test_shard_state_arrays_and_replicated():
    mesh = parallel.mesh_from_spec("x:2,y:2")
    domain = odil.Domain(cshape=(8, 8), dimnames=["x", "y"], mesh=mesh, partition={"x": "x", "y": "y"})
    state = domain.init_state(odil.State(fields={"u": np.zeros((8, 8)), "a": odil.Array(np.zeros(3))}))
    arrays = domain.arrays_from_state(state)
    placed = parallel.shard_state_arrays(domain, arrays)
    assert not placed[0].sharding.is_fully_replicated
    rep = parallel.replicated(mesh)
    assert rep.is_fully_replicated


def test_multi_start_data_parallel():
    """Batched multi-start training through the standard Adam optimizer,
    with the instance axis sharded over the mesh (data parallelism)."""
    import jax.numpy as jnp

    from odil_tpu.optim.adam import AdamOptimizer

    problem, state = poisson_like_problem(N=8)
    mesh = parallel.mesh_from_spec("b:4")
    loss_b, stacked = parallel.multi_start(
        problem, state, nstarts=4, seed=1, scale=0.5, mesh=mesh, batch_axis="b"
    )
    assert stacked[0].shape[0] == 4
    assert not stacked[0].sharding.is_fully_replicated

    loss0 = float(loss_b(stacked, {"epoch": 0})[0])
    opt = AdamOptimizer(dtype=problem.domain.dtype)
    opt.bind(loss_b, tracers=problem.tracers, task_epochs=[50], names=["fu", "reg"])
    out, _ = opt.run(stacked, epochs=50, lr=0.05)
    loss1 = float(loss_b(out, {"epoch": 0})[0])
    assert loss1 < loss0 * 0.5, (loss0, loss1)

    # Every instance improved, not just the mean.
    per_instance = jax.vmap(lambda a: problem.make_loss_fn(state)[0](a, {"epoch": 0})[0])
    l0 = np.asarray(per_instance([s for s in stacked]))
    l1 = np.asarray(per_instance([o for o in out]))
    assert np.all(l1 < l0)


def test_multi_start_per_instance_data():
    """Batched inverse problems with different measurement data per
    instance: a frozen data Field is overridden per instance and each
    instance must recover ITS OWN target."""
    import jax.numpy as jnp

    from odil_tpu.optim.adam import AdamOptimizer

    domain = odil.Domain(cshape=(8, 8), dimnames=["x", "y"])

    def operator(ctx):
        return [ctx.field("u") - ctx.field("g", frozen=True)]

    state = domain.init_state(
        odil.State(fields={"u": None, "g": odil.Field(np.zeros(domain.size()))})
    )
    problem = odil.Problem(operator, domain)
    nstarts = 3
    targets = np.stack([np.full((8, 8), c, dtype=domain.dtype) for c in (1.0, -2.0, 0.5)])
    loss_b, stacked = parallel.multi_start(
        problem, state, nstarts=nstarts, seed=0, scale=0.1,
        per_instance={"g": targets},
    )
    opt = AdamOptimizer(dtype=domain.dtype)
    opt.bind(loss_b, tracers=problem.tracers, task_epochs=[400], names=[""])
    out, _ = opt.run(stacked, epochs=400, lr=0.05)
    # Field order: u then g.
    u_out = np.asarray(out[0])
    for i, c in enumerate((1.0, -2.0, 0.5)):
        assert abs(u_out[i].mean() - c) < 0.05, (i, u_out[i].mean())
    # The frozen data field stayed at its per-instance values.
    np.testing.assert_allclose(np.asarray(out[1]), targets, atol=1e-5)


def test_multi_start_per_instance_validation():
    problem, state = poisson_like_problem(N=8)
    with pytest.raises(KeyError):
        parallel.multi_start(problem, state, 2, per_instance={"nope": np.zeros((2, 8, 8))})
    with pytest.raises(ValueError):
        parallel.multi_start(problem, state, 2, per_instance={"u": np.zeros((3, 8, 8))})


def test_divisibility_fallback_warns_once(capsys):
    """A finest-level axis that does not divide its mesh axis replicates AND
    logs a warning (once); coarse multigrid levels replicate silently."""
    import io as _io
    import sys

    import odil_tpu.util as util

    mesh = parallel.mesh_from_spec("x:8")
    domain = odil.Domain(cshape=(12, 12), dimnames=["x", "y"], mesh=mesh, partition={"x": "x"})
    buf = _io.StringIO()
    old_stream, old_echo = util._log_sink.stream, util._log_sink.echo
    util.set_log_file(buf, echo=False)
    try:
        s = domain.field_sharding(shape=(12, 12))  # 12 % 8 != 0 -> replicate + warn
        assert s.is_fully_replicated
        domain.field_sharding(shape=(12, 12))  # repeated: no second warning
        domain.field_sharding(shape=(6, 6))  # coarse level: silent
    finally:
        util.set_log_file(old_stream, echo=old_echo)
    text = buf.getvalue()
    assert text.count("warning: replicating dim 'x'") == 1
    assert "size 12" in text


def test_divisible_axis_no_warning():
    import io as _io

    import odil_tpu.util as util

    mesh = parallel.mesh_from_spec("x:2")
    domain = odil.Domain(cshape=(16, 16), dimnames=["x", "y"], mesh=mesh, partition={"x": "x"})
    buf = _io.StringIO()
    old_stream, old_echo = util._log_sink.stream, util._log_sink.echo
    util.set_log_file(buf, echo=False)
    try:
        s = domain.field_sharding(shape=(16, 16))
        assert not s.is_fully_replicated
    finally:
        util.set_log_file(old_stream, echo=old_echo)
    assert buf.getvalue() == ""


# ---------------------------------------------------------------------------
# Second-order (matrix-free Gauss-Newton) under sharding: the GSPMD mesh is
# the TPU-native scaling path for gn -- CG dot products and the multilevel
# preconditioner probes become psums automatically.  Reference capability
# being scaled: src/odil/util.py:152-187 + linsolver.py.
# ---------------------------------------------------------------------------


def gn_args(linsolver, epochs=2, damp=0):
    # A 1e-12-level iterate comparison needs CONVERGED linear solves whose
    # SOLUTION accuracy is not condition-limited (solution error ~ cond *
    # relative residual, and an unconverged iterate is sensitive to the
    # mesh psums' reduction order -- drift, not a bug).  The V-cycle lane
    # converges undamped to machine precision; the Jacobi/BPX lanes get a
    # Levenberg damp large enough that cond(J^T J + damp^2 I) ~ 1, so the
    # equality exercises the sharded jvp/vjp/dot machinery (rhs = -J^T r)
    # at full precision rather than CG asymptotics.
    return argparse.Namespace(
        epochs=epochs, epoch_start=0, linsolver=linsolver,
        linsolver_tol=1e-12, linsolver_damp=damp, linsolver_dampdiag=0,
        linsolver_maxiter=400, linsolver_precond_every=0, seed=0,
        nlvl=100, smooth_pre=3, ndirect=3,
    )


@pytest.mark.parametrize(
    "linsolver,damp", [("vcycle", 0), ("multigrid", 1e4), ("cg", 1e4)]
)
def test_gauss_newton_sharded_matches_single_device(linsolver, damp):
    """A GN step (V-cycle / BPX / Hutchinson-Jacobi preconditioned CG) on the
    8-device mesh reproduces the single-device iterate."""
    from odil_tpu.newton import optimize_gauss_newton

    problem0, state0 = poisson_like_problem(N=32)
    optimize_gauss_newton(gn_args(linsolver, damp=damp), problem0, state0)
    u0 = np.asarray(problem0.domain.field(state0, "u"))

    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem1, state1 = poisson_like_problem(
        mesh=mesh, partition={"x": "x", "y": "y"}, N=32
    )
    assert not state1.fields["u"].array.sharding.is_fully_replicated
    optimize_gauss_newton(gn_args(linsolver, damp=damp), problem1, state1)
    u1 = np.asarray(problem1.domain.field(state1, "u"))
    # 5e-11: the in-jit sharding constraint (Problem._constrain_fields)
    # reorders reduction fusions slightly, drifting the CG dot products by
    # ~1e-11 at these damping levels.
    np.testing.assert_allclose(u1, u0, rtol=0, atol=5e-11 * max(1.0, np.abs(u0).max()))


def test_gauss_newton_sharded_wave():
    """GN on the wave fixture (two coupled fields, hist-2 stencil) under a
    time partition matches single-device."""
    from odil_tpu.models import wave as wv
    from odil_tpu.newton import optimize_gauss_newton

    problem0, state0, _ = wv.build(nt=16, nx=16, multigrid=False, dtype=np.float64)
    optimize_gauss_newton(gn_args("cg", damp=1e4), problem0, state0)
    u0 = np.asarray(problem0.domain.field(state0, "u"))

    mesh = parallel.mesh_from_spec("t:4")
    problem1, state1, _ = wv.build(
        nt=16, nx=16, multigrid=False, dtype=np.float64,
        mesh=mesh, partition={"t": "t"},
    )
    optimize_gauss_newton(gn_args("cg", damp=1e4), problem1, state1)
    u1 = np.asarray(problem1.domain.field(state1, "u"))
    np.testing.assert_allclose(u1, u0, rtol=0, atol=1e-11 * max(1.0, np.abs(u0).max()))


def test_gspmd_node_axis_shards_unevenly():
    """A node-located time axis (N+1 entries over k devices) genuinely
    shards under plain GSPMD (--mesh, no halo): the in-jit uneven sharding
    constraint (Problem._constrain_fields) keeps the partition that the
    storage layout must drop.  Pinned by (a) loss+grad equality with the
    unsharded evaluation and (b) the compiled module containing a
    collective-permute (the partitioned-roll signature), which a t:8-only
    mesh admits only if t is truly partitioned -- and (c) no replication
    warning."""
    from odil_tpu.models import veltracer as vt

    problem0, state0, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=True, dtype=np.float64
    )
    loss_fn0, arrays0 = problem0.make_loss_fn(state0)
    vg0 = jax.jit(jax.value_and_grad(loss_fn0, has_aux=True))
    (l0, _), g0 = vg0(arrays0, {"epoch": 0})

    import io as _io

    import odil_tpu.util as util

    mesh = parallel.mesh_from_spec("t:8")
    buf = _io.StringIO()
    old_stream, old_echo = util._log_sink.stream, util._log_sink.echo
    util.set_log_file(buf, echo=False)
    try:
        problem1, state1, _ = vt.build(
            nt=16, nx=16, ny=16, kernel="xla", multigrid=True,
            dtype=np.float64, mesh=mesh, partition={"t": "t"},
        )
        loss_fn1, arrays1 = problem1.make_loss_fn(state1)
        arrays1 = parallel.shard_state_arrays(problem1.domain, arrays1)
        vg1 = jax.jit(jax.value_and_grad(loss_fn1, has_aux=True))
        (l1, _), g1 = vg1(arrays1, {"epoch": 0})
    finally:
        util.set_log_file(old_stream, echo=old_echo)
    assert "warning: replicating" not in buf.getvalue()
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-12, atol=0)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11,
            atol=1e-12 * max(1.0, float(np.abs(np.asarray(b)).max())),
        )
    txt = vg1.lower(arrays1, {"epoch": 0}).compile().as_text()
    assert "collective-permute" in txt, "t axis did not partition"


def test_gauss_newton_halo_matches_single_device():
    """GN through the halo residual map (shard_map + ppermute exchange,
    halo.make_halo_residual_fn) reproduces the single-device iterate.  The
    Jacobi preconditioner's Hutchinson probes draw over the padded residual
    space, so the CG path differs; the converged iterate must not."""
    from odil_tpu.newton import optimize_gauss_newton

    problem0, state0 = poisson_like_problem(N=32)
    args0 = gn_args("cg", damp=1e4)
    optimize_gauss_newton(args0, problem0, state0)
    u0 = np.asarray(problem0.domain.field(state0, "u"))

    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem1, state1 = poisson_like_problem(
        mesh=mesh, partition={"x": "x", "y": "y"}, N=32
    )
    args1 = gn_args("cg", damp=1e4)
    args1.halo = 1
    optimize_gauss_newton(args1, problem1, state1)
    u1 = np.asarray(problem1.domain.field(state1, "u"))
    np.testing.assert_allclose(u1, u0, rtol=0, atol=1e-9 * max(1.0, np.abs(u0).max()))


def test_halo_residual_fn_matches_plain():
    """The halo residual map equals the plain one up to a fixed permutation
    plus structurally-zero ghost rows: sorted magnitudes (with the zero pad
    stripped) agree, and so do J^T r and the normal matvec's pullback."""
    problem0, state0 = poisson_like_problem(N=16)
    f0, x0 = problem0.residual_fn(state0)

    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem1, state1 = poisson_like_problem(
        mesh=mesh, partition={"x": "x", "y": "y"}, N=16
    )
    f1, x1 = problem1.residual_fn(state1, halo=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=0, atol=0)

    r0 = np.asarray(f0(x0))
    r1 = np.asarray(f1(x1))
    assert f1.term_names == f0.term_names
    pad = len(r1) - len(r0)
    assert pad >= 0
    s0, s1 = np.sort(np.abs(r0)), np.sort(np.abs(r1))
    if pad:
        assert s1[:pad].max() == 0.0
        s1 = s1[pad:]
    np.testing.assert_allclose(s1, s0, rtol=1e-13, atol=1e-13)

    def jtr(f, x):
        r, pb = jax.vjp(f, x)
        return np.asarray(pb(r)[0])

    np.testing.assert_allclose(jtr(f1, x1), jtr(f0, x0), rtol=1e-11, atol=1e-9)
    v = problem0.domain.cast(np.random.RandomState(3).randn(x0.size))
    jv0 = jax.jvp(f0, (x0,), (v,))[1]
    jv1 = jax.jvp(f1, (x1,), (v,))[1]
    _, pb0 = jax.vjp(f0, x0)
    _, pb1 = jax.vjp(f1, x1)
    np.testing.assert_allclose(
        np.asarray(pb1(jv1)[0]), np.asarray(pb0(jv0)[0]), rtol=1e-11, atol=1e-9
    )
