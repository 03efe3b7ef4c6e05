"""Wave-equation data-assimilation model: recover u(t, x) from initial u,
u_t, and boundary traces.

Second-order space-time stencil (time shift -2); Dirichlet boundaries via
quadratic-half extrapolation to the traces (parity with reference
``examples/wave/wave.py``)."""

import argparse

import numpy as np

from .. import Domain, Problem, State
from ..stencil import extrap_quadh

__all__ = ["exact_solution", "operator", "operator_fused", "build"]

MODES = [1, 2, 3, 4, 5]


def exact_solution(t, x):
    """Standing superposition of travelling cosines; returns (u, u_t)."""
    t = np.asarray(t, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    u = np.zeros(np.broadcast(t, x).shape)
    ut = np.zeros_like(u)
    for i in MODES:
        k = i * np.pi
        u += np.cos((x - t + 0.5) * k) + np.cos((x + t - 0.5) * k)
        ut += k * np.sin((x - t + 0.5) * k) - k * np.sin((x + t - 0.5) * k)
    scale = 2 * len(MODES)
    return u / scale, ut / scale


def operator(ctx):
    extra = ctx.extra
    mod = ctx.mod
    args = extra.args
    dt, dx = ctx.step()
    it, ix = ctx.indices()
    nt, nx = ctx.size()

    u = ctx.field("u")
    utm = ctx.field("u", -1, 0)
    utmm = ctx.field("u", -2, 0)
    uxm = ctx.field("u", -1, -1)
    uxp = ctx.field("u", -1, 1)

    # Boundary traces at the previous time row, via quadratic-half ghosts.
    left_utm = mod.roll(extra.left_u, 1, 0)
    right_utm = mod.roll(extra.right_u, 1, 0)
    uxm = mod.where(ix == 0, extrap_quadh(uxp, utm, left_utm[:, None]), uxm)
    uxp = mod.where(ix == nx - 1, extrap_quadh(uxm, utm, right_utm[:, None]), uxp)

    u_t_here = (u - utm) / dt
    u_t_prev = (utm - utmm) / dt
    u_t_prev = mod.where(it == 1, extra.init_ut[None, :], u_t_prev)

    u_tt = (u_t_here - u_t_prev) / dt
    u_xx = (uxm - 2 * utm + uxp) / dx**2
    fu = u_tt - u_xx

    # First row carries the initial condition (staggered half step).
    u0 = extra.init_u + 0.5 * dt * extra.init_ut
    fu = mod.where(it == 0, (u - u0[None, :]) * args.kimp, fu)
    return [("fu", fu)]


def operator_fused(ctx):
    """Same discretization through the fused row-wise Pallas kernel
    (hist=2); the boundary traces enter as per-row data inputs."""
    extra = ctx.extra
    mod = ctx.mod
    args = extra.args
    dt, dx = map(float, ctx.step())
    nt, nx = ctx.size()
    dtype = ctx.dtype

    left_utm = mod.reshape(mod.roll(extra.left_u, 1, 0), (nt, 1))
    right_utm = mod.reshape(mod.roll(extra.right_u, 1, 0), (nt, 1))
    ix = mod.cast(ctx.indices("x")[0, :], dtype)

    def row_fn(it, T, rows, data_rows, params, consts):
        (cur, tm, tmm) = rows[0]
        left_row, right_row = data_rows
        u0, ut0, ixv = consts
        uxm = mod.roll(tm, 1, 0)
        uxp = mod.roll(tm, -1, 0)
        # left_row/right_row stay (1,) arrays: a [0] scalar squeeze of an
        # f64 value cannot be lowered by Mosaic; broadcasting is identical.
        uxm = mod.where(ixv == 0, extrap_quadh(uxp, tm, left_row), uxm)
        uxp = mod.where(ixv == nx - 1, extrap_quadh(uxm, tm, right_row), uxp)
        u_t_here = (cur - tm) / dt
        u_t_prev = mod.where(it == 1, ut0, (tm - tmm) / dt)
        fu = (u_t_here - u_t_prev) / dt - (uxm - 2 * tm + uxp) / dx**2
        first = u0 + 0.5 * dt * ut0
        fu = mod.where(it == 0, (cur - first) * args.kimp, fu)
        return (fu,)

    (term,) = ctx.rowwise_terms(
        row_fn,
        ("u",),
        data=(left_utm, right_utm),
        consts=(extra.init_u, extra.init_ut, ix),
        nterms=1,
        hist=2,
        halox=1,
    )
    return [("fu", term)]


def build(nt=64, nx=64, kimp=1.0, dtype=np.float64, multigrid=True, kernel="xla",
          mesh=None, partition=None, args=None):
    """Builds the wave assimilation problem. Returns (problem, state, extra)."""
    if args is None:
        args = argparse.Namespace(kimp=kimp)
    domain = Domain(
        cshape=(nt, nx),
        dimnames=("t", "x"),
        lower=(0, -1),
        upper=(1, 1),
        multigrid=multigrid,
        dtype=dtype,
        mesh=mesh,
        partition=partition,
    )
    mod = domain.mod
    tt, xx = domain.points()
    t1, x1 = domain.points_1d()
    ref_u, ref_ut = exact_solution(tt, xx)
    left_u, _ = exact_solution(t1, t1 * 0 + domain.lower[1])
    right_u, _ = exact_solution(t1, t1 * 0 + domain.upper[1])
    init_u, init_ut = exact_solution(x1 * 0 + domain.lower[0], x1)

    extra = argparse.Namespace(
        args=args,
        ref_u=ref_u,
        ref_ut=ref_ut,
        left_u=mod.cast(left_u, dtype),
        right_u=mod.cast(right_u, dtype),
        init_u=mod.cast(init_u, dtype),
        init_ut=mod.cast(init_ut, dtype),
    )
    state = domain.init_state(State(fields={"u": np.zeros(domain.cshape)}))
    op = operator_fused if kernel == "pallas" else operator
    return Problem(op, domain, extra), state, extra
