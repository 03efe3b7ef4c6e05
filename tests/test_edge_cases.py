"""Edge cases: geometry validation, context caching under jit, linsolver
damping, checkpoint skip_missing, odd dimensions."""

import argparse

import numpy as np
import pytest

import odil_tpu as odil


def test_invalid_multigrid_size_raises():
    with pytest.raises(ValueError):
        odil.Domain(cshape=(12, 12), dimnames=["x", "y"], multigrid=True)


def test_mg_nlvl_cap():
    domain = odil.Domain(cshape=(64, 64), dimnames=["x", "y"], multigrid=True, mg_nlvl=3)
    assert domain.mg_nlvl == 3
    assert domain.mg_cshapes == [(64, 64), (32, 32), (16, 16)]


def test_domain_1d_and_6d():
    d1 = odil.Domain(cshape=(16,), dimnames=["x"])
    pts = d1.points()  # No dims requested -> tuple of per-axis arrays.
    assert isinstance(pts, tuple) and np.asarray(pts[0]).shape == (16,)
    assert np.asarray(d1.points("x")).shape == (16,)
    d6 = odil.Domain(cshape=[4] * 6, dimnames=["x", "y", "z", "sx", "sy", "sz"])
    assert d6.get_field_shape() == (4,) * 6


def test_context_cache_shares_under_jit():
    """Repeated ctx.field calls with the same descriptor trace one sample."""
    import jax

    domain = odil.Domain(cshape=(8,), dimnames=["x"])
    state = domain.init_state(odil.State(fields={"u": None}))
    calls = []

    def operator(ctx):
        a = ctx.field("u", 1)
        b = ctx.field("u", 1)
        calls.append(a is b)
        return [a + b]

    problem = odil.Problem(operator, domain)
    problem.eval_loss_grad(state)
    assert all(calls)


def test_field_wrong_shift_count():
    domain = odil.Domain(cshape=(4, 4), dimnames=["x", "y"])
    state = domain.init_state(odil.State(fields={"u": None}))
    ctx = domain.get_context(state)
    with pytest.raises(RuntimeError):
        ctx.field("u", 1)


def test_array_with_shift_raises():
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    state = domain.init_state(odil.State(fields={"a": odil.Array(np.zeros(3))}))
    ctx = domain.get_context(state)
    with pytest.raises(RuntimeError):
        ctx.field("a", 1)


def test_uninitialized_state_raises():
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    problem = odil.Problem(lambda ctx: [ctx.field("u")], domain)
    with pytest.raises(RuntimeError):
        problem.eval_loss_grad(odil.State(fields={"u": None}))


def test_linsolver_damping_flags():
    """Levenberg damping shifts the Newton solution away from exact."""
    import scipy.sparse as sp

    domain = odil.Domain(cshape=(4, 4), dimnames=["x", "y"], dtype=np.float64)
    ref = np.random.RandomState(0).rand(4, 4)

    def operator(ctx):
        return [ctx.field("u") - ctx.extra.ref]

    state = domain.init_state(odil.State(fields={"u": None}))
    problem = odil.Problem(operator, domain, argparse.Namespace(ref=domain.cast(ref)))
    vector, matrix = problem.linearize(state)
    args = argparse.Namespace(
        linsolver="direct", linsolver_maxiter=None, linsolver_tol=1e-12,
        linsolver_damp=0.0, linsolver_dampdiag=0.0,
    )
    from odil_tpu.linsolver import solve

    exact = solve(matrix, -np.asarray(vector), args, {}, "direct")
    args.linsolver_damp = 1.0
    damped = solve(matrix, -np.asarray(vector), args, {}, "direct")
    assert np.linalg.norm(damped) < np.linalg.norm(exact)


def test_checkpoint_skip_missing(tmp_path):
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    state = domain.init_state(odil.State(fields={"u": None}))
    path = str(tmp_path / "c.pickle")
    odil.core.checkpoint_save(domain, state, path)
    state2 = domain.init_state(odil.State(fields={"u": None, "extra_key": None}))
    odil.core.checkpoint_load(domain, state2, path)  # skip_missing default
    with pytest.raises(RuntimeError):
        odil.core.checkpoint_load(domain, state2, path, skip_missing=False)


def test_history_unknown_late_column_raises(tmp_path):
    import os

    os.chdir(tmp_path)
    h = odil.History(csvpath="h.csv", warmup=0)
    h.append("a", 1.0)
    h.write()
    h.append("a", 2.0)
    h.append("b", 3.0)  # New column after the header froze.
    with pytest.raises(RuntimeError):
        h.write()


def test_history_str_and_bool_columns(tmp_path):
    """str columns (the --linsolver_history lin_status idiom, util.py) and
    bools must stream to CSV and backfill: born-at-0 columns need no
    numeric placeholder, late-born ones backfill ''/False, and the None
    placeholder append reuses the column's typed zero."""
    import os

    os.chdir(tmp_path)
    h = odil.History(csvpath="h.csv", warmup=1)
    h.append("loss", 1.0)
    h.append("lin_status", "converged")
    h.write()
    h.append("loss", 0.5)
    h.append("lin_status", None)  # placeholder -> "" (typed zero)
    h.append("ok", True)  # late-born within warmup: backfills False at row 0
    h.write()
    assert h.get("lin_status") == ["converged", ""]
    assert h.get("ok") == [False, True]
    h.save("h.pickle")
    with open("h.csv") as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f]
    icol = header.index("lin_status")
    assert [r[icol] for r in rows] == ["converged", ""]
    h2 = odil.History()
    h2.load("h.pickle")
    assert h2.get("ok") == [False, True]
