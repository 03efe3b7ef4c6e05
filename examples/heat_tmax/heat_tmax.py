#!/usr/bin/env python3
"""Infer the final time ``tmax`` of a heat equation from one measured value.

Workload parity with the reference ``examples/heat_tmax/heat_tmax.py``: the
scalar unknown (an Array of size 1) rescales dt inside the operator; the
initial condition is imposed exactly by a roll-transform-unroll of every
stencil sample; Crank-Nicolson in time; zero Dirichlet via odd reflection.
"""

import argparse

import matplotlib.pyplot as plt
import numpy as np

import odil_tpu as odil
from odil_tpu import plotutil, printlog


def exact_u(t, x, args):
    """Solution of u_t = u_xx on [0, pi]: sin(x) exp(-t), time scaled by tmax."""
    return np.sin(np.asarray(x)) * np.exp(-np.asarray(t) * args.tmax_ref)


def clamp_initial_row(u, extra, mod):
    """Replaces the first time row with the exact initial condition."""
    return mod.concatenate([extra.u_init[None, :], u[1:]], axis=0)


def operator_heat(ctx):
    mod = ctx.mod
    dt, dx = ctx.step("t", "x")
    it, ix = ctx.indices("t", "x", loc="nc")
    nt, nx = ctx.size("t", "x")
    coeff = ctx.field("coeff")
    extra = ctx.extra
    args = extra.args

    offsets = [(0, 0), (0, -1), (0, 1), (-1, 0), (-1, -1), (-1, 1)]

    def sample(offset):
        # Shift, clamp the initial row in the unshifted frame, shift back --
        # keeps ctx.field() as the single source so Newton sees the stencil.
        raw = ctx.field("u", *offset)
        unshifted = mod.roll(raw, offset, (0, 1))
        clamped = clamp_initial_row(unshifted, extra, mod)
        return mod.roll(clamped, [-s for s in offset], (0, 1))

    u, uxm, uxp, um, umxm, umxp = [sample(o) for o in offsets]

    # Zero Dirichlet via odd reflection at both walls.
    uxm = mod.where(ix == 0, -u, uxm)
    uxp = mod.where(ix == nx - 1, -u, uxp)
    umxm = mod.where(ix == 0, -um, umxm)
    umxp = mod.where(ix == nx - 1, -um, umxp)

    dt = dt * coeff[0]  # The inferred tmax stretches the time axis.

    u_t = (u - um) / dt
    lap_prev = (umxm - 2 * um + umxp) / dx**2
    lap_here = (uxm - 2 * u + uxp) / dx**2
    fu = u_t - 0.5 * (lap_here + lap_prev)
    fu = mod.where(it == 0, ctx.cast(0), fu)
    res = [("eqn", fu)]

    # One measured value at the center of the final row.
    ixc = nx // 2
    res += [("imp", args.kimp * (u[-1, ixc] - extra.u_final[ixc]))]
    return res


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--Nt", type=int, default=64, help="Grid size in t")
    parser.add_argument("--Nx", type=int, default=64, help="Grid size in x")
    parser.add_argument("--kimp", type=float, default=1)
    parser.add_argument("--tmax_ref", type=float, default=4.5)
    parser.add_argument("--tmax_init", type=float, default=1)
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        frames=4,
        plot_every=1000,
        report_every=1000,
        history_every=200,
        optimizer="lbfgs",
        multigrid=1,
        double=1,
        echo=1,
        outdir="out_heat_tmax",
    )
    return parser.parse_args(argv)


def plot_func(problem, state, epoch, frame, cbinfo=None):
    domain = problem.domain
    extra = problem.extra
    ref_u = extra.ref_u
    state_u = np.asarray(clamp_initial_row(domain.field(state, "u"), extra, domain.mod))
    coeff = np.asarray(domain.field(state, "coeff"))
    ixc = domain.size("x") // 2
    title = "epoch={:}, tmax={:.8g}\nu(pi/2, tmax) / u(pi/2, 0) = {:.5g}".format(
        epoch, coeff[0], state_u[-1, ixc] / state_u[0, ixc]
    )
    fig = odil.plot.plot_1d(
        domain,
        ref_u,
        state_u,
        cmap="Spectral_r",
        nslices=5,
        title=title,
        transpose=True,
        transparent=False,
        interpolation="none",
        umin=0,
        umax=float(np.max(ref_u)),
    )
    plotutil.savefig(fig, f"u_{frame:05d}", printf=printlog)
    plt.close(fig)


def report_func(problem, state, epoch, cbinfo):
    coeff = np.asarray(problem.domain.field(state, "coeff"))
    printlog("tmax={:.5g}".format(coeff[0]))


def history_func(problem, state, epoch, history, cbinfo):
    coeff = np.asarray(problem.domain.field(state, "coeff"))
    history.append("tmax", float(coeff[0]))


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    domain = odil.Domain(
        cshape=(args.Nt, args.Nx),
        dimnames=("t", "x"),
        lower=(0, 0),
        upper=(1, np.pi),
        dtype=dtype,
        multigrid=args.multigrid,
        mg_interp=args.mg_interp,
        mg_nlvl=args.nlvl,
    )
    tt, xx = domain.points(loc="nc")
    xone = domain.points_1d("x", loc="c")
    ref_u = exact_u(tt, xx, args)
    u_init = exact_u(np.full_like(xone, domain.lower[0]), xone, args)
    u_final = exact_u(np.full_like(xone, domain.upper[0]), xone, args)

    state = domain.init_state(
        odil.State(
            fields={
                "u": odil.Field(np.tile(u_init, [args.Nt + 1, 1]), loc="nc"),
                "coeff": odil.Array([args.tmax_init]),
            }
        )
    )
    extra = argparse.Namespace(
        ref_u=ref_u,
        u_init=domain.cast(u_init),
        u_final=domain.cast(u_final),
        args=args,
    )
    return odil.Problem(operator_heat, domain, extra), state


def main(argv=None):
    args = parse_args(argv)
    odil.setup_outdir(args)
    problem, state = make_problem(args)
    callback = odil.make_callback(
        problem, args, plot_func=plot_func, report_func=report_func, history_func=history_func
    )
    try:
        odil.optimize(args, args.optimizer, problem, state, callback)
    except odil.EarlyStopError as e:
        printlog(f"Early stop: {e}")
    return problem, state


if __name__ == "__main__":
    main()
