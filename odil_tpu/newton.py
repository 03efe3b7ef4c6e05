"""Matrix-free Gauss-Newton: the TPU-native replacement for sparse Newton.

The reference assembles an explicit sparse Jacobian on the host and solves
the normal equations with scipy/PyAMG (``src/odil/core.py:1113-1217``,
``src/odil/linsolver.py``).  Here the products  J v  and  J^T w  are exactly
``jax.jvp`` / ``jax.vjp`` of the concatenated-residual function, so the
damped normal equations

    (J^T J + damp^2 I + dampdiag^2 diag(J^T J)) delta = -J^T r

are solved by (preconditioned) conjugate gradients entirely on device,
inside one jitted step -- no Jacobian is ever materialized (SURVEY.md §7
"Newton without scipy").  Two accelerations:

- **Jacobi preconditioning** with diag(J^T J) estimated exactly-in-
  expectation by Hutchinson probes: diag = E[(J^T z)^2], z Rademacher over
  the residual space.  This plays the role of the reference's PyAMG
  ``multigrid`` linear solver (``src/odil/linsolver.py:61-72``) without any
  host matrix.
- With multigrid-decomposed unknowns the residual function already maps from
  the decomposed basis, so CG runs geometrically preconditioned for free;
  the reference's Newton cannot use multigrid at all
  (``examples/wave/README.md:25-30``).
"""

from argparse import Namespace
from functools import partial

import jax
import jax.numpy as jnp

from .util import printlog

__all__ = ["gauss_newton_step", "estimate_normal_diag", "optimize_gauss_newton"]


def estimate_normal_diag(f, x, key, nprobe=8):
    """Hutchinson estimate of diag(J^T J) at x: E[(J^T z)^2] with Rademacher
    z over the residual space (exact in expectation, nprobe-sample mean)."""
    r0, pullback = jax.vjp(f, x)

    def probe(key):
        z = jax.random.rademacher(key, r0.shape, dtype=x.dtype)
        return jnp.square(pullback(z)[0])

    keys = jax.random.split(key, nprobe)
    return jnp.mean(jax.vmap(probe)(keys), axis=0)


def gauss_newton_step(f, x, damp=0.0, dampdiag=0.0, tol=1e-6, maxiter=100, precond_diag=None):
    """One Gauss-Newton update for residual function `f` at point `x`.

    precond_diag: optional diag(J^T J) estimate; enables Jacobi
    preconditioning and the dampdiag term.  Jittable."""
    r0, pullback = jax.vjp(f, x)

    def normal_matvec(v):
        jv = jax.jvp(f, (x,), (v,))[1]
        av = pullback(jv)[0]
        if damp:
            av = av + (damp * damp) * v
        if dampdiag and precond_diag is not None:
            av = av + (dampdiag * dampdiag) * precond_diag * v
        return av

    M = None
    if precond_diag is not None:
        inv = 1.0 / jnp.maximum(precond_diag + damp * damp, 1e-30)

        def M(v):  # noqa: E731
            return inv * v

    rhs = -pullback(r0)[0]
    delta, _ = jax.scipy.sparse.linalg.cg(normal_matvec, rhs, tol=tol, maxiter=maxiter, M=M)
    loss = jnp.mean(jnp.square(r0))
    return x + delta, {"loss": loss}


def optimize_gauss_newton(args, problem, state, callback=None, **kwargs):
    """Newton driver using the matrix-free Gauss-Newton step.

    Flags reused from the linsolver group: --linsolver_tol, --linsolver_damp,
    --linsolver_dampdiag, --linsolver_maxiter (CG iterations); 'multigrid'
    or 'cg' as --linsolver selects Jacobi preconditioning."""
    domain = problem.domain
    f, x = problem.residual_fn(state)
    damp = getattr(args, "linsolver_damp", 0.0) or 0.0
    dampdiag = getattr(args, "linsolver_dampdiag", 0.0) or 0.0
    tol = getattr(args, "linsolver_tol", 1e-6)
    maxiter = getattr(args, "linsolver_maxiter", None) or 100
    use_precond = getattr(args, "linsolver", "") in ("multigrid", "cg") or dampdiag > 0

    if use_precond:

        @jax.jit
        def step(x, key):
            diag = estimate_normal_diag(f, x, key, nprobe=8)
            return gauss_newton_step(
                f, x, damp=damp, dampdiag=dampdiag, tol=tol, maxiter=maxiter, precond_diag=diag
            )

    else:
        step = jax.jit(
            lambda x, key: gauss_newton_step(f, x, damp=damp, tol=tol, maxiter=maxiter)
        )

    def eval_pinfo():
        loss, _, terms, names, norms = problem.eval_loss_grad(state)
        return {"terms": terms, "names": names, "norms": norms, "loss": loss}

    printlog(
        "Running Gauss-Newton (matrix-free CG{}) optimizer".format(
            ", Jacobi-preconditioned" if use_precond else ""
        )
    )
    if callback:
        callback(state, args.epoch_start, eval_pinfo())

    key = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    evals = 0
    for epoch in range(args.epoch_start, args.epochs):
        key, sub = jax.random.split(key)
        x, info = step(x, sub)
        evals += 1
        domain.unpack_state(x, state)
        if callback:
            callback(state, epoch + 1, eval_pinfo())
    arrays = domain.arrays_from_state(state)
    optinfo = Namespace(epochs=args.epochs, evals=evals)
    return arrays, optinfo
