"""Smoothed-aggregation AMG (amg.py) and the `--linsolver multigrid` host
path: multilevel strength on systems where diagonally-preconditioned CG
stalls (reference capability: ``src/odil/linsolver.py:61-72`` via PyAMG)."""

import argparse

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import odil_tpu as odil
from odil_tpu import linsolver
from odil_tpu.amg import build_hierarchy


def poisson_matrix(n):
    e = np.ones(n)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    eye = sp.eye(n)
    return (sp.kron(eye, T) + sp.kron(T, eye)).tocsr() * (n + 1) ** 2


def test_amg_poisson_optimal():
    """Textbook case: SA-AMG-CG on the 2D Laplacian converges in O(10)
    iterations independent of resolution, where Jacobi-CG needs O(n)."""
    for n in (32, 64):
        A = poisson_matrix(n)
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        ml = build_hierarchy(A)
        assert ml.nlevels >= 3
        residuals = []
        x, _ = spla.cg(
            A, b, rtol=1e-8, atol=0, maxiter=40,
            M=ml.aslinearoperator(),
            callback=lambda xk: residuals.append(np.linalg.norm(A @ xk - b)),
        )
        assert residuals[-1] <= 1e-8 * np.linalg.norm(b) * 10
        assert len(residuals) <= 20, f"n={n}: {len(residuals)} iterations"


def test_amg_vcycle_symmetric():
    """The V-cycle must be symmetric (<Mx, y> == <x, My>) to be a valid CG
    preconditioner."""
    A = poisson_matrix(24)
    ml = build_hierarchy(A)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.shape[0])
    y = rng.standard_normal(A.shape[0])
    lhs = np.dot(ml.precond(x), y)
    rhs = np.dot(x, ml.precond(y))
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), abs(rhs))


def stiff_newton_system(N=128):
    """Assembles the Newton normal equations of a 128^2 Poisson problem with
    Dirichlet rows — the VERDICT stiff fixture where Jacobi-CG stalls."""
    domain = odil.Domain(cshape=(N, N), dimnames=["x", "y"], dtype=np.float64)
    xx, yy = domain.points()
    rhs = np.asarray(np.sin(np.asarray(xx) * np.pi) * np.asarray(yy))

    def operator(ctx):
        mod = ctx.mod
        u = ctx.field("u")
        uxm = ctx.field("u", -1, 0)
        uxp = ctx.field("u", 1, 0)
        uym = ctx.field("u", 0, -1)
        uyp = ctx.field("u", 0, 1)
        hx, hy = ctx.step()
        ix, iy = ctx.indices("x"), ctx.indices("y")
        inner = (ix > 0) & (ix < N - 1) & (iy > 0) & (iy < N - 1)
        lap = (uxp - 2 * u + uxm) / hx**2 + (uyp - 2 * u + uym) / hy**2
        return [mod.where(inner, lap - ctx.extra.rhs, u)]

    extra = argparse.Namespace(rhs=domain.cast(rhs))
    state = domain.init_state(
        odil.State(fields={"u": np.random.RandomState(0).rand(N, N)})
    )
    problem = odil.Problem(operator, domain, extra)
    vector, matr = problem.linearize(state)
    return matr, np.asarray(vector, dtype=np.float64)


def solver_args(**kw):
    ns = argparse.Namespace(
        linsolver="multigrid",
        linsolver_maxiter=120,
        linsolver_tol=1e-6,
        linsolver_damp=0,
        linsolver_dampdiag=0,
        smooth_pre=3,
        ndirect=3,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_linsolver_multigrid_beats_jacobi_on_stiff_system():
    matr, rhs = stiff_newton_system()
    reg = (matr.T @ matr).tocsr()
    breg = matr.T @ rhs
    bnorm = np.linalg.norm(breg)

    status_mg = {}
    args = solver_args()
    sol = linsolver.solve(matr, rhs, args, status=status_mg, linsolver="multigrid")
    rel_mg = np.linalg.norm(reg @ sol - breg) / bnorm
    assert status_mg["amg_levels"] >= 3

    status_cg = {}
    sol_cg = linsolver.solve(matr, rhs, solver_args(), status=status_cg, linsolver="cg")
    rel_cg = np.linalg.norm(reg @ sol_cg - breg) / bnorm

    # The multilevel path converges orders of magnitude further in the same
    # iteration budget; Jacobi-CG stalls.
    assert rel_mg < 1e-5, f"AMG-CG residual {rel_mg}"
    assert rel_cg > 30 * rel_mg, f"Jacobi-CG {rel_cg} vs AMG-CG {rel_mg}"


def test_linsolver_vcycle_alias_uses_amg():
    matr, rhs = stiff_newton_system(N=48)
    status = {}
    linsolver.solve(matr, rhs, solver_args(), status=status, linsolver="vcycle")
    assert "amg_levels" in status
