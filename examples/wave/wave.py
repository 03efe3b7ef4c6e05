#!/usr/bin/env python3
"""Data assimilation for the wave equation from initial u, u_t and boundary
traces.

Workload parity with the reference ``examples/wave/wave.py``: second-order
space-time stencil (shift -2 in time), Dirichlet boundaries imposed by
quadratic-half extrapolation to the boundary traces, initial condition via a
weighted imposed row, L-BFGS default with multigrid decomposition.  The
exact solution's time derivative is computed analytically (the reference
differentiates through a TF tape)."""

import argparse
import pickle

import numpy as np

import odil_tpu as odil
from odil_tpu import printlog
from odil_tpu.core import extrap_quad, extrap_quadh, struct_to_numpy

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


def operator_wave(ctx):
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


def operator_wave_fused(ctx):
    """Same discretization as operator_wave through the fused row-wise
    Pallas kernel (hist=2: second-order time stencil); the boundary traces
    enter as per-row data inputs."""
    from odil_tpu.context import Context
    from odil_tpu.ops import rowwise_loss_terms

    extra = ctx.extra
    mod = ctx.mod
    args = extra.args
    dt, dx = map(float, ctx.step())
    nt, nx = ctx.size()
    dtype = ctx.dtype

    u = ctx.field("u")
    left_utm = mod.reshape(mod.roll(extra.left_u, 1, 0), (nt, 1))
    right_utm = mod.reshape(mod.roll(extra.right_u, 1, 0), (nt, 1))
    ix = mod.cast(ctx.indices("x")[0, :], dtype)

    def row_fn(it, T, rows, data_rows, params, consts):
        (cur, tm, tmm) = rows[0]
        left_row, right_row = data_rows
        u0, ut0, ixv = consts
        uxm = mod.roll(tm, 1, 0)
        uxp = mod.roll(tm, -1, 0)
        uxm = mod.where(ixv == 0, extrap_quadh(uxp, tm, left_row[0]), uxm)
        uxp = mod.where(ixv == nx - 1, extrap_quadh(uxm, tm, right_row[0]), uxp)
        u_t_here = (cur - tm) / dt
        u_t_prev = mod.where(it == 1, ut0, (tm - tmm) / dt)
        fu = (u_t_here - u_t_prev) / dt - (uxm - 2 * tm + uxp) / dx**2
        first = u0 + 0.5 * dt * ut0
        fu = mod.where(it == 0, (cur - first) * args.kimp, fu)
        return (fu,)

    (term,) = rowwise_loss_terms(
        row_fn,
        (u,),
        data=(left_utm, right_utm),
        consts=(extra.init_u, extra.init_ut, ix),
        nterms=1,
        hist=2,
    )
    return [("fu", Context.Raw(term))]


def derived_ut(domain, init_u, uu):
    """Central-difference time derivative of the recovered field."""
    dt = domain.step("t")
    u = np.asarray(uu)
    utm = np.roll(u, 1, axis=0)
    utp = np.roll(u, -1, axis=0)
    utm[0, :] = extrap_quadh(utp[0, :], u[0, :], init_u)
    utp[-1, :] = extrap_quad(u[-3, :], u[-2, :], u[-1, :])
    return (utp - utm) / (2 * float(dt))


def parse_args(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--kernel", type=str, default="xla", choices=["xla", "pallas"],
                        help="Residual evaluation path: XLA-fused or the Pallas row-wise kernel")
    parser.add_argument("--Nt", type=int, default=64, help="Grid size in t")
    parser.add_argument("--Nx", type=int, default=64, help="Grid size in x")
    parser.add_argument("--kimp", type=float, default=1, help="Initial-condition weight")
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        double=1,
        multigrid=1,
        outdir="out_wave",
        linsolver="direct",
        optimizer="lbfgs",
        lr=0.001,
        plotext="png",
        plot_title=1,
        plot_every=100,
        report_every=10,
        history_full=5,
        history_every=10,
        frames=2,
    )
    return parser.parse_args(argv)


def plot_func(problem, state, epoch, frame, cbinfo=None):
    from odil_tpu.plot import plot_1d

    domain = problem.domain
    extra = problem.extra
    args = extra.args
    path0 = f"u_{frame:05d}.{args.plotext}"
    path1 = f"ut_{frame:05d}.{args.plotext}"
    printlog(path0, path1)

    state_u = np.asarray(domain.field(state, "u"))
    state_ut = derived_ut(domain, extra.init_u, state_u)

    if args.dump_data:
        payload = struct_to_numpy(
            domain.mod,
            dict(
                upper=domain.upper,
                lower=domain.lower,
                cshape=domain.cshape,
                state_u=state_u,
                state_ut=state_ut,
                ref_u=extra.ref_u,
                ref_ut=extra.ref_ut,
            ),
        )
        with open(f"data_{frame:05d}.pickle", "wb") as f:
            pickle.dump(payload, f)

    for data, ref, path, label in (
        (state_u, extra.ref_u, path0, "u"),
        (state_ut, extra.ref_ut, path1, "ut"),
    ):
        umax = np.max(np.abs(ref))
        plot_1d(
            domain,
            ref,
            data,
            path=path,
            title=f"{label} epoch={epoch:05d}" if args.plot_title else None,
            cmap="RdBu_r",
            nslices=5,
            transpose=True,
            umin=-umax,
            umax=umax,
        )


def u_error(domain, extra, state):
    du = np.asarray(domain.field(state, "u")) - extra.ref_u
    return float(np.sqrt(np.mean(du**2)))


def history_func(problem, state, epoch, history, cbinfo):
    history.append("error_u", u_error(problem.domain, problem.extra, state))


def report_func(problem, state, epoch, cbinfo):
    printlog(f"error: u:{u_error(problem.domain, problem.extra, state):.5g}")


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    domain = odil.Domain(
        cshape=(args.Nt, args.Nx),
        dimnames=("t", "x"),
        lower=(0, -1),
        upper=(1, 1),
        multigrid=args.multigrid,
        dtype=dtype,
    )
    if domain.multigrid:
        printlog("multigrid levels:", domain.mg_cshapes)
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

    state = domain.init_state(odil.State(fields={"u": np.zeros(domain.cshape)}))
    operator = operator_wave_fused if args.kernel == "pallas" else operator_wave
    return odil.Problem(operator, domain, extra), state


def main(argv=None):
    args = parse_args(argv)
    odil.setup_outdir(args)
    problem, state = make_problem(args)
    callback = odil.make_callback(
        problem, args, plot_func=plot_func, history_func=history_func, report_func=report_func
    )
    try:
        odil.util.optimize(args, args.optimizer, problem, state, callback)
    except odil.EarlyStopError as e:
        printlog(f"Early stop: {e}")
    with open("done", "w"):
        pass
    return problem, state


if __name__ == "__main__":
    main()
