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

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import odil_tpu as odil
from odil_tpu import plotutil, printlog
from odil_tpu.models import heat as model

clamp_initial_row = model.clamp_initial_row
operator_heat = model.operator_tmax


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
    problem, state, extra = model.build_tmax(
        nt=args.Nt, nx=args.Nx, tmax_ref=args.tmax_ref, tmax_init=args.tmax_init,
        kimp=args.kimp, dtype=dtype, multigrid=args.multigrid,
        mg_interp=args.mg_interp, mg_nlvl=args.nlvl, args=args,
    )
    return problem, state


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
