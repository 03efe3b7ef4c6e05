#!/usr/bin/env python3
"""Demonstrates fields with values at cell centers, faces, and nodes.

Workload parity with the reference ``examples/basic/fields.py``: four fields
at the four staggered locations are fitted to a linear target; the plot
shows the staggered layout on the grid.
"""

import argparse

import matplotlib.pyplot as plt
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import odil_tpu as odil
from odil_tpu import plotutil, printlog


def target(x, y):
    return x * 0.25 + y * 0.5


def operator(ctx):
    res = []
    for key, loc in (("uc", "cc"), ("un", "nn"), ("ufx", "nc"), ("ufy", "cn")):
        x, y = ctx.points(loc=loc)
        res += [(key, ctx.field(key) - target(x, y))]
    return res


def parse_args(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--Nx", type=int, default=8, help="Grid size in x")
    parser.add_argument("--Ny", type=int, default=4, help="Grid size in y")
    parser.add_argument("--plot", type=int, default=1, help="Plot fields")
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        outdir="out_fields",
        echo=1,
        frames=1,
        plot_every=100,
        report_every=50,
        history_every=10,
        optimizer="adam",
        lr=1e-2,
        multigrid=1,
    )
    return parser.parse_args(argv)


def plot(problem, state, epoch, frame, cbinfo=None):
    domain = problem.domain
    fig, ax = plt.subplots(figsize=(4, 2))
    kw = dict(vmin=0, vmax=1, cmap="Greys", clip_on=False, lw=0.5)

    for i, (key, loc) in enumerate((("uc", "cc"), ("un", "nn"), ("ufx", "nc"), ("ufy", "cn"))):
        x, y = map(np.asarray, domain.points(loc=loc))
        u = np.asarray(domain.field(state, key))
        ax.scatter(x, y, s=10, c=u, edgecolor=f"C{i}", label=key, **kw)

    ax.legend(loc="lower left", bbox_to_anchor=(0.1, 1), ncol=4, handletextpad=0)
    xn, yn = map(np.asarray, domain.points(loc="nn"))
    uc = np.asarray(domain.field(state, "uc"))
    ax.pcolormesh(xn, yn, uc, edgecolor="k", shading="flat", zorder=0, **dict(kw, lw=0.5))
    ax.set_aspect("equal")
    ax.set_axis_off()
    plotutil.savefig(fig, f"grid_{frame:05d}", printf=printlog)
    plt.close(fig)


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    domain = odil.Domain(
        cshape=(args.Nx, args.Ny),
        dimnames=["x", "y"],
        lower=(0, 0),
        upper=(2, 1),
        dtype=dtype,
        multigrid=args.multigrid,
        mg_interp=args.mg_interp,
        mg_nlvl=args.nlvl,
    )
    state = odil.State(
        fields={
            "uc": odil.Field(np.zeros(domain.size(loc="cc")), loc="cc"),
            "un": odil.Field(np.zeros(domain.size(loc="nn")), loc="nn"),
            "ufx": odil.Field(np.zeros(domain.size(loc="nc")), loc="nc"),
            "ufy": odil.Field(np.zeros(domain.size(loc="cn")), loc="cn"),
            "net": domain.make_neural_net([2, 4, 2]),
        }
    )
    state = domain.init_state(state)
    return odil.Problem(operator, domain), state


def main(argv=None):
    args = parse_args(argv)
    odil.setup_outdir(args)
    problem, state = make_problem(args)
    callback = odil.make_callback(problem, args, plot_func=plot if args.plot else None)
    odil.util.optimize_grad(args, args.optimizer, problem, state, callback)
    return problem, state


if __name__ == "__main__":
    main()
