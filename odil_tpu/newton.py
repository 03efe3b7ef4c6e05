"""Matrix-free Gauss-Newton: the TPU-native replacement for sparse Newton.

The reference assembles an explicit sparse Jacobian on the host and solves
the normal equations with scipy/PyAMG (``src/odil/core.py:1113-1217``,
``src/odil/linsolver.py``).  Here the products  J v  and  J^T w  are exactly
``jax.jvp`` / ``jax.vjp`` of the concatenated-residual function, so the
normal equations

    (J^T J + damp^2 I) delta = -J^T r

are solved by conjugate gradients entirely on device, inside one jitted
step -- no Jacobian is ever materialized (SURVEY.md §7 "Newton without
scipy").  With multigrid-decomposed unknowns the same code automatically
runs in the decomposed basis, which acts as a geometric-multigrid
preconditioner; the reference's Newton cannot use multigrid at all
(``examples/wave/README.md:25-30``).
"""

from argparse import Namespace
from functools import partial

import jax
import jax.numpy as jnp

from .util import printlog

__all__ = ["gauss_newton_step", "optimize_gauss_newton"]


def gauss_newton_step(f, x, damp=0.0, tol=1e-6, maxiter=100):
    """One Gauss-Newton update for residual function `f` at point `x`.

    Returns (x_new, info) where info carries the residual loss and the CG
    iteration count.  Jittable."""
    r0, pullback = jax.vjp(f, x)

    def normal_matvec(v):
        jv = jax.jvp(f, (x,), (v,))[1]
        jtjv = pullback(jv)[0]
        if damp:
            jtjv = jtjv + (damp * damp) * v
        return jtjv

    rhs = -pullback(r0)[0]
    delta, _ = jax.scipy.sparse.linalg.cg(normal_matvec, rhs, tol=tol, maxiter=maxiter)
    loss = jnp.mean(jnp.square(r0))
    return x + delta, {"loss": loss}


def optimize_gauss_newton(args, problem, state, callback=None, **kwargs):
    """Newton driver using the matrix-free Gauss-Newton step.

    Flags reused from the linsolver group: --linsolver_tol, --linsolver_damp,
    --linsolver_maxiter (CG iterations)."""
    domain = problem.domain
    f, x = problem.residual_fn(state)
    damp = getattr(args, "linsolver_damp", 0.0) or 0.0
    tol = getattr(args, "linsolver_tol", 1e-6)
    maxiter = getattr(args, "linsolver_maxiter", None) or 100

    step = jax.jit(partial(gauss_newton_step, f, damp=damp, tol=tol, maxiter=maxiter))

    def eval_pinfo():
        loss, _, terms, names, norms = problem.eval_loss_grad(state)
        return {"terms": terms, "names": names, "norms": norms, "loss": loss}

    printlog("Running Gauss-Newton (matrix-free CG) optimizer")
    if callback:
        callback(state, args.epoch_start, eval_pinfo())

    evals = 0
    for epoch in range(args.epoch_start, args.epochs):
        x, info = step(x)
        evals += 1
        domain.unpack_state(x, state)
        if callback:
            callback(state, epoch + 1, eval_pinfo())
    arrays = domain.arrays_from_state(state)
    optinfo = Namespace(epochs=args.epochs, evals=evals)
    return arrays, optinfo
