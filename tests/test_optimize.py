"""End-to-end optimization recovers known fields across all staggered
locations, Array and NeuralNet unknowns, with multigrid decomposition on.

Mirrors reference `tests/test_optimize.py` (RMS < 1e-2 after 1000 epochs)
and extends it with the device-resident L-BFGS and the gating of the scan
chunk scheduler.
"""

import argparse

import numpy as np
import pytest

import odil_tpu as odil
from odil_tpu.optim import EarlyStopError


def operator(ctx):
    extra = ctx.extra
    res = []
    for key in ["uc", "un", "ufx", "ufy"]:
        res += [(key, ctx.field(key) - extra.ref[key])]
    res += [("a", ctx.field("a") - extra.ref["a"])]
    net_a = ctx.neural_net("net")(ctx.field("a"))[0]
    res += [("net_a", net_a - extra.ref["net_a"])]
    return res


def make_problem(multigrid=1):
    domain = odil.Domain(
        cshape=(8, 4),
        dimnames=["x", "y"],
        lower=(0, 0),
        upper=(2, 1),
        multigrid=multigrid,
    )
    dtype = domain.dtype

    state = odil.State(
        fields={
            "uc": odil.Field(np.zeros(domain.size(loc="cc")), loc="cc"),
            "un": odil.Field(np.zeros(domain.size(loc="nn")), loc="nn"),
            "ufx": odil.Field(np.zeros(domain.size(loc="nc")), loc="nc"),
            "ufy": odil.Field(np.zeros(domain.size(loc="cn")), loc="cn"),
            "a": odil.Array(np.zeros(5)),
            "net": domain.make_neural_net([1, 7, 1]),
        }
    )
    state = domain.init_state(state)

    def func(x, y):
        return x * 0.25 + y * 0.5

    extra = argparse.Namespace()
    extra.ref = {
        "uc": func(*map(np.asarray, domain.points(loc="cc"))),
        "un": func(*map(np.asarray, domain.points(loc="nn"))),
        "ufx": func(*map(np.asarray, domain.points(loc="nc"))),
        "ufy": func(*map(np.asarray, domain.points(loc="cn"))),
        "a": np.arange(5, dtype=dtype),
    }
    extra.ref["net_a"] = extra.ref["a"] * 0.5
    problem = odil.Problem(operator, domain, extra)
    return problem, state


def run_and_check(opt, epochs=1000, lr=0.1, tol=1e-2):
    problem, state = make_problem()
    domain = problem.domain
    extra = problem.extra
    args = argparse.Namespace(
        epochs=epochs,
        epoch_start=0,
        lr=lr,
        report_every=100,
        history_every=0,
        plot_every=0,
        checkpoint_every=0,
        history_full=0,
        frames=0,
        callback_update_state=0,
        bfgs_m=10,
        bfgs_maxls=50,
        bfgs_pgtol=None,
        adam_epsilon=None,
        adam_beta_1=None,
        adam_beta_2=None,
        max_chunk=512,
    )
    try:
        odil.util.optimize_grad(args, opt, problem, state, callback=None)
    except EarlyStopError:
        pass
    errs = [np.asarray(domain.field(state, k)) - extra.ref[k] for k in ["uc", "un", "ufx", "ufy", "a"]]
    errs.append(
        np.asarray(domain.neural_net(state, "net")(domain.field(state, "a"))[0]) - extra.ref["net_a"]
    )
    error = np.sqrt(sum(np.mean(np.square(e)) for e in errs))
    assert error < tol, f"opt={opt} error={error}"


def test_adam_recovers_fields():
    odil.runtime.mod.random.set_seed(1)
    np.random.seed(1)
    run_and_check("adamn", epochs=1000, lr=0.1)


def test_lbfgs_device_recovers_fields():
    odil.runtime.mod.random.set_seed(1)
    np.random.seed(1)
    run_and_check("lbfgs", epochs=600, lr=0.1, tol=1e-2)


def test_lbfgsb_scipy_recovers_fields():
    odil.runtime.mod.random.set_seed(1)
    np.random.seed(1)
    run_and_check("lbfgsb", epochs=1000, lr=0.1)


def test_gd_runs():
    odil.runtime.mod.random.set_seed(1)
    np.random.seed(1)
    run_and_check("gd", epochs=2000, lr=0.1, tol=0.5)


def test_task_epoch_planner():
    from odil_tpu.optim.base import plan_chunks

    # Chunks must end exactly at task epochs.
    tasks = [10, 20, 25, 100]
    chunks = list(plan_chunks(0, 100, tasks, max_chunk=512))
    assert sum(chunks) == 100
    ends = np.cumsum(chunks)
    for t in tasks:
        assert t in ends
    # Dense schedule when no task info.
    assert list(plan_chunks(0, 5, None)) == [1] * 5


def test_compute_task_epochs():
    args = argparse.Namespace(
        report_every=100, history_every=10, plot_every=0, checkpoint_every=0, history_full=5
    )
    tasks = odil.util.compute_task_epochs(args, 0, 100)
    assert 10 in tasks and 100 in tasks
    assert 3 in tasks  # history_full
    assert 11 not in tasks


def test_epoch_tracer_semantics_in_scan():
    """The scanned Adam loop must feed tracers['epoch'] = N-1 when computing
    epoch N, matching the reference's callback-driven tracer update order
    (annealed loss terms depend on this)."""
    import jax.numpy as jnp

    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    seen = []

    def operator(ctx):
        u = ctx.field("u")
        w = 2.0 ** (-ctx.tracers["epoch"] / 10.0)
        return [(u - 1.0) * w]

    state = domain.init_state(odil.State(fields={"u": None}))
    problem = odil.Problem(operator, domain)
    loss_fn, arrays = problem.make_loss_fn(state)

    # Eager reference: epoch N uses tracer N-1.
    import jax

    x = [jnp.asarray(a) for a in arrays]
    m = [jnp.zeros_like(a) for a in x]
    v = [jnp.zeros_like(a) for a in x]
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-7
    for epoch in range(1, 6):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(x, {"epoch": epoch - 1})
        t = float(epoch)
        alpha = lr * (1 - b2**t) ** 0.5 / (1 - b1**t)
        m = [mi + (g - mi) * (1 - b1) for mi, g in zip(m, grads)]
        v = [vi + (jnp.square(g) - vi) * (1 - b2) for vi, g in zip(v, grads)]
        x = [xi - mi * alpha / (jnp.sqrt(vi) + eps) for xi, mi, vi in zip(x, m, v)]

    # Scanned optimizer.
    from odil_tpu.optim.adam import AdamOptimizer

    opt = AdamOptimizer(dtype=domain.dtype)
    opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[5], names=[""])
    out, _ = opt.run([jnp.asarray(a) for a in arrays], epochs=5, lr=lr)
    tol = 1e-6 if domain.dtype == np.float64 else 1e-4
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]), rtol=tol, atol=tol)


def test_problem_without_jit():
    """ODIL_JIT=0 semantics: Problem with jit=False still evaluates."""
    domain = odil.Domain(cshape=(4, 4), dimnames=["x", "y"])
    ref = np.random.RandomState(0).rand(4, 4)

    def operator(ctx):
        return [ctx.field("u") - ctx.extra.ref]

    state = domain.init_state(odil.State(fields={"u": None}))
    problem = odil.Problem(operator, domain, argparse.Namespace(ref=domain.cast(ref)), jit=False)
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    assert np.isfinite(loss)
    values, names2 = problem.eval_operator(state)
    assert names2 == names
