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

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import odil_tpu as odil
from odil_tpu import plotutil, printlog
from odil_tpu.models import advection as model

clamp_rows = model.clamp_rows
operator_adv = model.operator


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
    problem, state, extra = model.build(
        nt=args.Nt, nx=args.Nx, dtype=dtype, multigrid=args.multigrid,
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
