#!/usr/bin/env python3
"""Infer three constants (diffusivity, source, velocity) of an
advection-diffusion equation from snapshots at the initial and final time.

Workload parity with the reference ``examples/infer_constant/infer_constant.py``:
Crank-Nicolson discretization, exact imposition of initial/final rows by
concatenation, Array(3) unknown, L-BFGS with multigrid decomposition.
"""

import argparse

import matplotlib.pyplot as plt
import numpy as np

import odil_tpu as odil
from odil_tpu import plotutil, printlog


def exact_u(t, x, args):
    """Solution of u_t + c_vel u_x = c_diff u_xx + c_src on periodic [-1, 1]."""
    t = np.asarray(t)
    x = np.asarray(x)
    u = np.zeros_like(x, dtype=float)
    xx = x - t * args.c_vel
    modes = [1, 2, 3]
    for i in modes:
        k = 2 * i * np.pi
        u = u + np.cos(xx * k) * np.exp(-args.c_diff * k**2 * t)
    u = u / (2 * len(modes))
    return u + args.c_src * t


def clamp_rows(u, extra, mod):
    """Imposes the initial and final rows exactly."""
    return mod.concatenate([extra.u_init[None, :], u[1:-1], extra.u_final[None, :]], axis=0)


def operator_adv(ctx):
    mod = ctx.mod
    dt, dx = ctx.step("t", "x")
    coeff = ctx.field("coeff")
    extra = ctx.extra

    u0 = clamp_rows(ctx.field("u"), extra, mod)
    offsets = [(0, 0), (0, -1), (0, 1), (-1, 0), (-1, -1), (-1, 1)]
    u, uxm, uxp, um, umxm, umxp = [
        mod.roll(u0, [-s for s in o], (0, 1)) for o in offsets
    ]

    u_t = (u - um) / dt
    lap = 0.5 * ((uxm - 2 * u + uxp) + (umxm - 2 * um + umxp)) / dx**2
    upw = 0.5 * ((u - uxm) + (um - umxm)) / dx

    fu = u_t - coeff[0] * lap - coeff[1] + coeff[2] * upw
    return [fu[1:]]


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--Nt", type=int, default=64, help="Grid size in t")
    parser.add_argument("--Nx", type=int, default=64, help="Grid size in x")
    parser.add_argument("--c_diff", type=float, default=0.01, help="Diffusivity")
    parser.add_argument("--c_src", type=float, default=0.1, help="Uniform source")
    parser.add_argument("--c_vel", type=float, default=0.2, help="Advection velocity")
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        frames=3,
        plot_every=50,
        report_every=50,
        history_every=10,
        optimizer="lbfgs",
        multigrid=1,
        double=1,
        outdir="out_infer_constant",
    )
    return parser.parse_args(argv)


def plot_func(problem, state, epoch, frame, cbinfo=None):
    domain = problem.domain
    extra = problem.extra
    state_u = np.asarray(clamp_rows(domain.field(state, "u"), extra, domain.mod))
    coeff = np.asarray(domain.field(state, "coeff"))
    umax = float(np.max(np.abs(extra.ref_u)))
    fig = odil.plot.plot_1d(
        domain,
        extra.ref_u,
        state_u,
        cmap="RdBu_r",
        nslices=5,
        title="epoch={:}, diff={:.3g}, src={:.3g}, vel={:.3g}".format(epoch, *coeff),
        transpose=True,
        transparent=False,
        umin=-umax,
        umax=umax,
    )
    plotutil.savefig(fig, f"u_{frame:05d}", printf=printlog)
    plt.close(fig)


def report_func(problem, state, epoch, cbinfo):
    coeff = np.asarray(problem.domain.field(state, "coeff"))
    printlog("diff={:.5g}, src={:.5g}, vel={:.5g}".format(*coeff))


def history_func(problem, state, epoch, history, cbinfo):
    coeff = np.asarray(problem.domain.field(state, "coeff"))
    history.append("c_diff", float(coeff[0]))
    history.append("c_src", float(coeff[1]))
    history.append("c_vel", float(coeff[2]))


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    domain = odil.Domain(
        cshape=(args.Nt, args.Nx),
        dimnames=("t", "x"),
        lower=(0, -1),
        upper=(1, 1),
        dtype=dtype,
        multigrid=args.multigrid,
        mg_interp=args.mg_interp,
        mg_nlvl=args.nlvl,
    )
    tt, xx = domain.points()
    xone = domain.points_1d("x", loc="c")
    ref_u = exact_u(tt, xx, args)
    u_init = exact_u(xone * 0 + domain.lower[0], xone, args)
    u_final = exact_u(xone * 0 + domain.upper[0], xone, args)

    state = domain.init_state(
        odil.State(
            fields={
                "coeff": odil.Array([0, 0, 0.001]),
                "u": odil.Field(None, loc="nc"),
            }
        )
    )
    extra = argparse.Namespace(
        ref_u=ref_u,
        u_init=domain.cast(u_init),
        u_final=domain.cast(u_final),
        args=args,
    )
    return odil.Problem(operator_adv, domain, extra), state


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
