#!/usr/bin/env python3
"""Pedagogical comparison on the Van der Pol oscillator (no framework imports):

  1. forward Euler time stepping,
  2. step-wise Newton (implicit solve per step),
  3. ODIL with naive gradient descent on the discrete loss,
  4. ODIL with Newton on the full space-time system (dense Jacobian),
  5. ODIL with Gauss-Newton using matrix-free jvp/vjp products.

Demonstrates the identity: one ODIL-Newton step on the global residual
system equals global Newton-Raphson (see the reference's examples/compare.md
for the derivation); here everything is autodiff-driven JAX.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

MU = 1.0  # Van der Pol damping parameter.


def vdp_rhs(state):
    x, y = state
    return jnp.array([y, MU * (1 - x**2) * y - x])


def forward_euler(u0, n, dt):
    def step(u, _):
        u = u + dt * vdp_rhs(u)
        return u, u

    _, traj = jax.lax.scan(step, jnp.asarray(u0), None, length=n)
    return jnp.concatenate([jnp.asarray(u0)[None], traj], axis=0)


def residual(traj, u0, dt):
    """Euler residuals of the whole trajectory: r_i = u_{i+1} - u_i - dt f(u_i)."""
    traj = jnp.concatenate([jnp.asarray(u0)[None], traj], axis=0)
    f = jax.vmap(vdp_rhs)(traj[:-1])
    return traj[1:] - traj[:-1] - dt * f


def odil_gd(u0, n, dt, epochs=20000, lr=0.05):
    traj = jnp.tile(jnp.asarray(u0), (n, 1))
    loss = jax.jit(jax.value_and_grad(lambda tr: jnp.sum(residual(tr, u0, dt) ** 2)))

    def step(tr, _):
        val, g = loss(tr)
        return tr - lr * g, val

    traj, losses = jax.lax.scan(jax.jit(step), traj, None, length=epochs)
    return traj, float(losses[-1])


def odil_newton_dense(u0, n, dt, iters=10):
    """Global Newton: solve J delta = -r with the dense trajectory Jacobian."""
    traj = jnp.tile(jnp.asarray(u0), (n, 1))

    @jax.jit
    def res_and_jac(tr):
        r = residual(tr, u0, dt).reshape(-1)
        J = jax.jacfwd(lambda t: residual(t.reshape(n, 2), u0, dt).reshape(-1))(tr.reshape(-1))
        return r, J

    loss = None
    for _ in range(iters):
        r, J = res_and_jac(traj)
        # Dense f64 LU on the host: the TPU compiler implements
        # LuDecomposition only for f32/c64, and this pedagogical dense
        # Jacobian is exactly the thing the real framework never builds.
        delta = np.linalg.solve(np.asarray(J), -np.asarray(r))
        traj = traj + jnp.asarray(delta).reshape(n, 2)
        loss = float(jnp.sum(r**2))
    return traj, float(loss)


def odil_gauss_newton_mf(u0, n, dt, iters=10):
    """Matrix-free Gauss-Newton: CG on J^T J delta = -J^T r via jvp/vjp."""
    traj = jnp.tile(jnp.asarray(u0), (n, 1))

    def r_of(tr):
        return residual(tr, u0, dt).reshape(-1)

    @jax.jit
    def step(tr):
        r, pullback = jax.vjp(r_of, tr)

        def matvec(v):
            return pullback(jax.jvp(r_of, (tr,), (v,))[1])[0]

        rhs = -pullback(r)[0]
        delta, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, tol=1e-12, maxiter=500)
        return tr + delta, jnp.sum(r**2)

    loss = None
    for _ in range(iters):
        traj, loss = step(traj)
    return traj, float(loss)


def main():
    parser = argparse.ArgumentParser()
    # Defaults follow the reference's scale (examples/compare.py: n=25,
    # dt=0.1): undamped global Newton from the flat initial guess diverges
    # on much longer Van der Pol horizons (n=200 produced a singular
    # Jacobian mid-iteration), which is itself part of the pedagogy.
    parser.add_argument("--n", type=int, default=25, help="Number of Euler steps")
    parser.add_argument("--tmax", type=float, default=2.5)
    args = parser.parse_args()

    n, dt = args.n, args.tmax / args.n
    u0 = np.array([2.0, 0.0])

    euler = np.asarray(forward_euler(u0, n, dt))[1:]

    traj_gd, loss_gd = odil_gd(u0, n, dt)
    traj_nt, loss_nt = odil_newton_dense(u0, n, dt)
    traj_gn, loss_gn = odil_gauss_newton_mf(u0, n, dt)

    def err(traj):
        return float(np.sqrt(np.mean((np.asarray(traj) - euler) ** 2)))

    print(f"ODIL-GD           loss={loss_gd:.3e}  vs-Euler RMS={err(traj_gd):.3e}")
    print(f"ODIL-Newton dense loss={loss_nt:.3e}  vs-Euler RMS={err(traj_nt):.3e}")
    print(f"ODIL-GN matfree   loss={loss_gn:.3e}  vs-Euler RMS={err(traj_gn):.3e}")
    assert err(traj_nt) < 1e-8, "Global Newton must reproduce the Euler trajectory"
    assert err(traj_gn) < 1e-6, "Matrix-free GN must reproduce the Euler trajectory"
    print("PASS")


if __name__ == "__main__":
    main()
