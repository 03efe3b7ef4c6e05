#!/usr/bin/env python3
"""Poisson source inversion in an N-dimensional cube (ndim 1..6) with zero
Dirichlet boundary conditions.

Workload parity with the reference example ``examples/poisson/poisson.py``:
same CLI, same discretization (central 5/7/9...-point Laplacian with
quadratic-half ghost extrapolation to the boundary value), same reference
solutions ('hat', 'osc'), optional multigrid-norm loss (--mgloss) and
XMF dumps.
"""

import argparse
import pickle

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import odil_tpu as odil
from odil_tpu import printlog
from odil_tpu.core import struct_to_numpy
from odil_tpu.models.poisson import (
    discrete_rhs,
    laplacian_dirichlet,
    operator,
    reference_rhs,
    reference_solution,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--ndim", type=int, choices=range(1, 7), default=2, help="Space dimension")
    parser.add_argument("--N", type=int, default=32, help="Grid size")
    parser.add_argument("--cellbased", type=int, default=1, help="Cell-based fields")
    parser.add_argument("--dump_xmf", type=int, default=0, help="Dump XMF+RAW files")
    parser.add_argument("--plot", type=int, default=0, help="Enable plotting")
    parser.add_argument("--ref", type=str, default="hat", choices=("hat", "osc"))
    parser.add_argument("--rhs", type=str, default="discrete", choices=("discrete", "exact"))
    parser.add_argument("--osc_k", type=float, default=2, help="Parameter for ref='osc'")
    parser.add_argument("--mgloss", type=int, default=0, help="Multigrid-norm loss terms")
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        frames=4,
        report_every=100,
        history_every=10,
        plot_every=100,
        history_full=50,
        optimizer="adam",
        multigrid=1,
        lr=0.005,
        double=1,
        outdir="out_poisson",
    )
    return parser.parse_args(argv)


def dump_field(u, name, path, domain, cellbased):
    axes = tuple(reversed(range(domain.ndim)))
    steps = [domain.step_by_dim(d) for d in range(domain.ndim)]
    odil.write_raw_with_xmf(np.transpose(np.asarray(u), axes), path, spacing=steps, name=name, cell=cellbased)


def plot_func(problem, state, epoch, frame, cbinfo):
    domain = problem.domain
    extra = problem.extra
    args = extra.args
    if args.frames == 0 and frame is not None:
        return
    suff = "" if frame is None else f"_{frame:05d}"
    paths = []
    if args.dump_xmf and domain.ndim in (2, 3):
        path = f"u{suff}.xdmf2"
        dump_field(domain.field(state, "u"), "u", path, domain, args.cellbased)
        paths.append(path)
    if args.dump_data:
        path = f"data{suff}.pickle"
        payload = struct_to_numpy(
            domain.mod,
            dict(
                x=domain.points(),
                u=domain.field(state, "u"),
                ref_u=extra.ref_u,
                rhs=extra.rhs,
            ),
        )
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        paths.append(path)
    printlog(" ".join(paths))


def field_error(domain, extra, state, key):
    du = np.asarray(domain.field(state, key)) - extra.ref_u
    return float(np.sqrt(np.mean(du**2)))


def history_func(problem, state, epoch, history, cbinfo):
    for key in state.fields:
        history.append("error_" + key, field_error(problem.domain, problem.extra, state, key))


def report_func(problem, state, epoch, cbinfo):
    errs = {k: field_error(problem.domain, problem.extra, state, k) for k in state.fields}
    printlog("error: " + ", ".join(f"{k}:{v:.5g}" for k, v in errs.items()))


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    ndim = args.ndim
    dimnames = ["x", "y", "z", "sx", "sy", "sz"][:ndim]
    mesh = partition = None
    if getattr(args, "mesh", None):
        mesh = odil.parallel.mesh_from_spec(args.mesh)
        partition = odil.parallel.auto_partition(dimnames, mesh)
        printlog(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, partition: {partition}")
    domain = odil.Domain(
        cshape=[args.N] * ndim,
        dimnames=dimnames,
        multigrid=args.multigrid,
        dtype=dtype,
        mesh=mesh,
        partition=partition,
    )
    if domain.multigrid:
        printlog("multigrid levels:", domain.mg_cshapes)
    mod = domain.mod

    ref_u = reference_solution(args.ref, args, domain)
    if args.rhs == "discrete":
        rhs = discrete_rhs(ref_u, domain, mod)
    else:
        rhs = reference_rhs(args.ref, args, domain)

    state = domain.init_state(odil.State(fields={"u": None}))

    extra = argparse.Namespace(ref_u=ref_u, rhs=mod.cast(rhs, domain.dtype), args=args)
    if args.plot:
        dump_field(ref_u, "u", "ref_u.xdmf2", domain, args.cellbased)
        dump_field(rhs, "rhs", "rhs.xdmf2", domain, args.cellbased)
    return odil.Problem(operator, domain, extra), state


def main(argv=None):
    args = parse_args(argv)
    odil.setup_outdir(args)
    problem, state = make_problem(args)
    callback = odil.make_callback(
        problem, args, plot_func=plot_func, history_func=history_func, report_func=report_func
    )
    odil.util.optimize(args, args.optimizer, problem, state, callback)
    plot_func(problem, state, 0, None, None)
    return problem, state


if __name__ == "__main__":
    main()
