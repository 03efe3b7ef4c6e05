"""Newton linearization: one exact step on a linear problem.

Mirrors reference `tests/test_newton.py` (RMS < 1e-6 after a single
linearize + normal-equations solve), covering staggered-location conversion
with shift, masked boundary rows, an Array with full Jacobian, and a linear
NeuralNet.  The reference skips this test for JAX (`test_newton.py:116-118`);
here it runs natively.  Also validates the matrix-free Gauss-Newton step
against the same fixture.
"""

import argparse
import os

import numpy as np
import pytest
import scipy.sparse as sp

import odil_tpu as odil

# The dtype matrix (tests/Makefile) drives this file at both precisions,
# like the reference's optimize matrix (/root/reference/tests/Makefile:15-16).
# fp32 tolerances: one Newton step on the linear fixture solves to about
# sqrt(eps_f32); CG stagnates near 1e-7 instead of 1e-14.
DTYPE = np.float32 if os.environ.get("ODIL_DTYPE") == "float32" else np.float64
F32 = DTYPE is np.float32
TOL_STEP = 3e-4 if F32 else 1e-6
TOL_MENU = 1e-3 if F32 else 1e-5
CG_TOL = 1e-7 if F32 else 1e-14


def operator(ctx):
    mod = ctx.mod
    extra = ctx.extra
    args = extra.args
    res = []

    # Face values read at cells: derivative equation.
    u_xm = ctx.field("ufx", 0, 0, loc="cc")
    u_xp = ctx.field("ufx", 1, 0, loc="cc")
    hx = ctx.step("x")
    res += [(u_xp - u_xm) / hx - extra.ref["dudx"]]

    # Boundary rows at x=0, masked elsewhere.
    ufx = ctx.field("ufx")
    ixfx = ctx.indices("x", loc="nc")
    mask = mod.where(ixfx == 0, ctx.cast(1), ctx.cast(0))
    res += [(ufx - extra.ref["ufx"]) * mask]

    # Cell average of the two faces.
    uc = ctx.field("uc")
    res += [(u_xp + u_xm) * 0.5 - uc]

    # Non-grid array: full Jacobian.
    a = ctx.field("a")
    res += [a - extra.ref["a"]]

    # Linear neural network.
    net_out = ctx.neural_net("net")(*extra.ref["net_in"])
    for i in range(args.Nnet):
        res += [(f"net{i}", net_out[i] - extra.ref["net_out"][i])]
    return res


def make_problem(Nx=3, Ny=2, Na=5, Nnet=5, seed=1000):
    np.random.seed(seed)
    odil.runtime.mod.random.set_seed(seed)
    domain = odil.Domain(
        cshape=(Nx, Ny),
        dimnames=["x", "y"],
        lower=(0, 0),
        upper=(Nx, Ny),
        dtype=DTYPE,
    )
    dtype = domain.dtype
    state = odil.State(
        fields={
            "uc": odil.Field(np.ones(domain.size(loc="cc")), loc="cc"),
            "ufx": odil.Field(np.ones(domain.size(loc="nc")), loc="nc"),
            "a": odil.Array(np.zeros(Na, dtype=dtype)),
            "net": domain.make_neural_net([Nnet, Nnet], activation="none"),
        }
    )
    state = domain.init_state(state)

    def func(x, y):
        return 0.25 * x * y

    def func_x(x, y):
        return 0.25 * y

    extra = argparse.Namespace()
    xc, yc = map(np.asarray, domain.points(loc="cc"))
    xfx, yfx = map(np.asarray, domain.points(loc="nc"))
    extra.ref = {
        "uc": func(xc, yc),
        "ufx": func(xfx, yfx),
        "dudx": func_x(xc, yc),
        "a": np.linspace(0, 1, Na, dtype=dtype),
        "net_in": np.random.rand(Nnet, Nnet + 1),
        "net_out": np.random.rand(Nnet, Nnet + 1),
    }
    extra.args = argparse.Namespace(Nnet=Nnet)
    problem = odil.Problem(operator, domain, extra)
    return problem, state


def check_state(problem, state, tol=None):
    tol = TOL_STEP if tol is None else tol
    domain = problem.domain
    extra = problem.extra
    errors = {}
    for key in ["ufx", "uc", "a"]:
        value = np.asarray(domain.field(state, key))
        errors[key] = np.sqrt(np.mean(np.square(value - extra.ref[key])))
    net_out = domain.neural_net(state, "net")(*extra.ref["net_in"])
    errors["net_out"] = np.sqrt(np.mean(np.square(np.asarray(net_out) - extra.ref["net_out"])))
    for key, err in errors.items():
        assert err < tol, f"{key}: {err}"


def test_one_newton_step_exact():
    problem, state = make_problem()
    domain = problem.domain
    vector, matrix = problem.linearize(state)
    vector = np.asarray(vector)
    delta = sp.linalg.spsolve((matrix.T @ matrix).tocsc(), -matrix.T @ vector)
    packed = np.asarray(domain.pack_state(state))
    domain.unpack_state(domain.mod.cast(packed + delta, domain.dtype), state)
    check_state(problem, state)


def test_gauss_newton_matrix_free_exact():
    import jax

    problem, state = make_problem()
    domain = problem.domain
    from odil_tpu.newton import gauss_newton_step

    f, x = problem.residual_fn(state)
    x, info = jax.jit(lambda x: gauss_newton_step(f, x, damp=0.0, tol=CG_TOL, maxiter=500))(x)
    domain.unpack_state(x, state)
    check_state(problem, state)


def test_eval_operator_grad_consistency():
    """Jacobian-vector products of the assembled matrix must match jvp of
    the residual function."""
    import jax

    problem, state = make_problem()
    _, matrix = problem.linearize(state)
    f, x0 = problem.residual_fn(state)
    rng = np.random.default_rng(0)
    v = rng.normal(size=x0.shape)
    jv_matrix = matrix @ v
    jv_ad = np.asarray(jax.jvp(f, (x0,), (problem.domain.mod.cast(v, problem.domain.dtype),))[1])
    tol = 1e-4 if F32 else 1e-9
    np.testing.assert_allclose(jv_matrix, jv_ad, rtol=tol, atol=tol)


def test_optimize_newton_driver():
    problem, state = make_problem()
    args = argparse.Namespace(
        epochs=1,
        epoch_start=0,
        linsolver="direct",
        linsolver_maxiter=None,
        linsolver_tol=CG_TOL,
        linsolver_damp=0,
        linsolver_dampdiag=0,
        linsolver_verbose=0,
        linsolver_history=0,
    )
    odil.util.optimize_newton(args, problem, state)
    check_state(problem, state)


@pytest.mark.parametrize("linsolver", ["lsqr", "multigrid", "bicgstab"])
def test_linsolver_menu(linsolver):
    problem, state = make_problem()
    args = argparse.Namespace(
        epochs=1,
        epoch_start=0,
        linsolver=linsolver,
        linsolver_maxiter=2000,
        linsolver_tol=CG_TOL,
        linsolver_damp=0,
        linsolver_dampdiag=0,
        linsolver_verbose=0,
        linsolver_history=0,
    )
    odil.util.optimize_newton(args, problem, state)
    check_state(problem, state, tol=TOL_MENU)


def test_gauss_newton_preconditioned():
    """Jacobi-preconditioned matrix-free GN matches the unpreconditioned
    solution on the linear fixture."""
    import jax

    problem, state = make_problem()
    domain = problem.domain
    from odil_tpu.newton import estimate_normal_diag, gauss_newton_step

    f, x = problem.residual_fn(state)
    diag = estimate_normal_diag(f, x, jax.random.PRNGKey(0), nprobe=16)
    x, info = jax.jit(
        lambda x, d: gauss_newton_step(f, x, tol=CG_TOL, maxiter=500, precond_diag=d)
    )(x, diag)
    domain.unpack_state(x, state)
    check_state(problem, state)


def test_optimize_gauss_newton_driver_preconditioned():
    problem, state = make_problem()
    args = argparse.Namespace(
        epochs=2,
        epoch_start=0,
        seed=3,
        linsolver="multigrid",
        linsolver_maxiter=500,
        linsolver_tol=CG_TOL,
        linsolver_damp=0,
        linsolver_dampdiag=0,
    )
    odil.util.optimize(args, "gn", problem, state)
    check_state(problem, state)


def test_linearize_scalar_residual_term():
    """A scalar residual from grid samples (heat_tmax's one-point
    measurement) must assemble into a single Jacobian row."""
    import jax

    domain = odil.Domain(cshape=(3, 4), dimnames=["t", "x"], dtype=DTYPE)
    state = domain.init_state(
        odil.State(fields={"u": odil.Field(np.random.RandomState(0).rand(3, 4), loc="cc")})
    )

    def operator(ctx):
        u = ctx.field("u")
        return [("grid", u - 1.0), ("point", 2.0 * (u[-1, 1] - 0.5))]

    problem = odil.Problem(operator, domain)
    vector, matrix = problem.linearize(state)
    assert matrix.shape == (12 + 1, 12)
    # The scalar row touches exactly one unknown with coefficient 2.
    row = matrix.tocsr()[12].toarray().ravel()
    assert np.count_nonzero(row) == 1
    assert row[2 * 4 + 1] == 2.0
    # And matches the jvp of the residual function.
    f, x0 = problem.residual_fn(state)
    v = np.random.RandomState(1).normal(size=x0.shape)
    jv = np.asarray(jax.jvp(f, (x0,), (domain.mod.cast(v, domain.dtype),))[1])
    np.testing.assert_allclose(matrix @ v, jv, atol=1e-4 if F32 else 1e-12)


def test_gauss_newton_heat_tmax_model():
    """Matrix-free GN on the tmax-inference model: the scalar unknown moves
    toward the true value."""
    from odil_tpu.models import heat as model

    problem, state, extra = model.build_tmax(nt=16, nx=16, multigrid=False)
    args = argparse.Namespace(
        epochs=5, epoch_start=0, seed=0,
        linsolver="cg", linsolver_maxiter=300, linsolver_tol=1e-10,
        linsolver_damp=1e-3, linsolver_dampdiag=0,
    )
    t0 = float(np.asarray(problem.domain.field(state, "coeff"))[0])
    odil.util.optimize(args, "gn", problem, state)
    t1 = float(np.asarray(problem.domain.field(state, "coeff"))[0])
    assert abs(t1 - 4.5) < abs(t0 - 4.5), (t0, t1)


def test_bpx_preconditioner_accelerates_cg():
    """Squared-BPX multilevel preconditioning must beat plain CG decisively
    on the Poisson normal equations (the reference needs PyAMG for this)."""
    import jax
    import jax.numpy as jnp

    from odil_tpu.models import poisson as pmodel
    from odil_tpu.newton import make_bpx_preconditioner

    problem, state, extra = pmodel.build(
        n=64, ndim=2, ref="hat", rhs="discrete", dtype=DTYPE, multigrid=False
    )
    f, x = problem.residual_fn(state)
    r0, pb = jax.vjp(f, x)

    def nm(v):
        return pb(jax.jvp(f, (x,), (v,))[1])[0]

    rhs = -pb(r0)[0]
    M = make_bpx_preconditioner(problem.domain, state, nm, x, jax.random.PRNGKey(0), nprobe=4)
    d_plain, _ = jax.scipy.sparse.linalg.cg(nm, rhs, tol=1e-12, maxiter=200)
    d_bpx, _ = jax.scipy.sparse.linalg.cg(nm, rhs, tol=1e-12, maxiter=200, M=M)
    loss_plain = float(jnp.mean(f(x + d_plain) ** 2))
    loss_bpx = float(jnp.mean(f(x + d_bpx) ** 2))
    assert loss_bpx < loss_plain * 0.05, (loss_plain, loss_bpx)


def test_optimize_gn_bpx_driver():
    """The gn driver with --linsolver multigrid solves Poisson far better
    than the unpreconditioned run at the same CG budget."""
    from odil_tpu.models import poisson as pmodel

    results = {}
    for linsolver in ["direct", "multigrid"]:  # 'direct' -> plain CG in gn
        problem, state, extra = pmodel.build(
            n=64, ndim=2, ref="hat", rhs="discrete", dtype=DTYPE, multigrid=False
        )
        args = argparse.Namespace(
            epochs=2, epoch_start=0, seed=0,
            linsolver=linsolver, linsolver_maxiter=150, linsolver_tol=1e-12,
            linsolver_damp=0, linsolver_dampdiag=0,
        )
        odil.util.optimize(args, "gn", problem, state)
        err = np.sqrt(np.mean((np.asarray(problem.domain.field(state, "u")) - extra.ref_u) ** 2))
        results[linsolver] = float(err)
    assert results["multigrid"] < results["direct"] * 0.2, results


def test_vcycle_preconditioner_spd_and_solves():
    """The geometric V-cycle (Chebyshev-Jacobi smoothing, exact coarse
    solve) must be symmetric positive definite -- a valid CG preconditioner
    -- and accelerate CG decisively at a small iteration budget."""
    import jax
    import jax.numpy as jnp

    from odil_tpu.models import poisson as pmodel
    from odil_tpu.newton import make_vcycle_preconditioner

    problem, state, extra = pmodel.build(
        n=32, ndim=2, ref="hat", rhs="discrete", dtype=DTYPE, multigrid=False
    )
    f, x = problem.residual_fn(state)
    r0, pb = jax.vjp(f, x)

    def nm(v):
        return pb(jax.jvp(f, (x,), (v,))[1])[0]

    M = make_vcycle_preconditioner(
        problem.domain, state, nm, x, jax.random.PRNGKey(0), degree=3, nprobe=4, npower=8
    )
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(x.size), dtype=x.dtype)
    v = jnp.asarray(rng.randn(x.size), dtype=x.dtype)
    a, b = float(jnp.vdot(M(u), v)), float(jnp.vdot(u, M(v)))
    assert abs(a - b) <= (1e-5 if F32 else 1e-10) * abs(a)  # symmetric
    assert float(jnp.vdot(u, M(u))) > 0  # positive definite
    rhs = -pb(r0)[0]
    d_plain, _ = jax.scipy.sparse.linalg.cg(nm, rhs, tol=1e-12, maxiter=30)
    d_mg, _ = jax.scipy.sparse.linalg.cg(nm, rhs, tol=1e-12, maxiter=30, M=M)
    loss_plain = float(jnp.mean(f(x + d_plain) ** 2))
    loss_mg = float(jnp.mean(f(x + d_mg) ** 2))
    assert loss_mg < loss_plain * 0.05, (loss_plain, loss_mg)


def test_optimize_gn_vcycle_driver():
    """--linsolver vcycle through the gn driver recovers the Poisson field."""
    from odil_tpu.models import poisson as pmodel

    problem, state, extra = pmodel.build(
        n=16, ndim=2, ref="hat", rhs="discrete", dtype=np.float64, multigrid=False
    )
    args = argparse.Namespace(
        epochs=2, epoch_start=0, seed=0,
        linsolver="vcycle", linsolver_maxiter=30, linsolver_tol=1e-12,
        linsolver_damp=0, linsolver_dampdiag=0,
    )
    odil.util.optimize(args, "gn", problem, state)
    err = np.sqrt(np.mean((np.asarray(problem.domain.field(state, "u")) - extra.ref_u) ** 2))
    assert err < 1e-3, err


def test_vcycle_multifield_joint_hierarchy():
    """The V-cycle's joint multi-field layout (coupled unknowns u, v with a
    shared hierarchy) must stay symmetric and reach the GN optimum."""
    import jax
    import jax.numpy as jnp

    from odil_tpu.newton import make_vcycle_preconditioner

    np.random.seed(0)
    N = 32
    domain = odil.Domain(cshape=(N, N), dimnames=["x", "y"], dtype=np.float64)
    xx, yy = map(np.asarray, domain.points())
    u_ref = np.sin(2 * np.pi * xx) * np.sin(4 * np.pi * yy)

    def operator(ctx):
        hx, hy = ctx.step()
        u = ctx.field("u")
        lap = (
            (ctx.field("u", 1, 0) - 2 * u + ctx.field("u", -1, 0)) / hx**2
            + (ctx.field("u", 0, 1) - 2 * u + ctx.field("u", 0, -1)) / hy**2
        )
        return [lap + ctx.field("v"), u - ctx.extra.u_ref, 0.01 * ctx.field("v")]

    state = domain.init_state(odil.State(fields={"u": None, "v": None}))
    problem = odil.Problem(operator, domain, argparse.Namespace(u_ref=domain.cast(u_ref)))
    f, x = problem.residual_fn(state)
    r0, pb = jax.vjp(f, x)

    def nm(w):
        return pb(jax.jvp(f, (x,), (w,))[1])[0]

    M = make_vcycle_preconditioner(
        domain, state, nm, x, jax.random.PRNGKey(0), nprobe=4, npower=8
    )
    u = jnp.asarray(np.random.randn(x.size), dtype=x.dtype)
    w = jnp.asarray(np.random.randn(x.size), dtype=x.dtype)
    a, b = float(jnp.vdot(M(u), w)), float(jnp.vdot(u, M(w)))
    assert abs(a - b) <= 1e-10 * abs(a)
    d_mg, _ = jax.scipy.sparse.linalg.cg(nm, -pb(r0)[0], tol=1e-13, maxiter=40, M=M)
    d_pl, _ = jax.scipy.sparse.linalg.cg(nm, -pb(r0)[0], tol=1e-13, maxiter=40)
    loss_mg = float(jnp.mean(f(x + d_mg) ** 2))
    loss_pl = float(jnp.mean(f(x + d_pl) ** 2))
    assert loss_mg <= loss_pl * 1.2, (loss_mg, loss_pl)
