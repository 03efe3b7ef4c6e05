#!/usr/bin/env python3
"""Inverse heat conduction: infer the conductivity k(u) as a neural network
from sparse noisy temperature measurements; also the forward problem and a
full PINN mode for comparison.

Workload parity with the reference ``examples/heat/heat.py``: same CLI,
finite-volume discretization with frozen-field flux linearization, imposed
data mask with weight rescaling, annealed regularizers driven by the epoch
tracer, PINN collocation operator (derivatives via jax.jvp instead of
tf.gradients), and checkpoint/history resume.
"""

import argparse
import os
import pickle

import jax
import matplotlib.pyplot as plt
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import odil_tpu as odil
from odil_tpu import printlog
from odil_tpu.core import checkpoint_load, eval_neural_net, struct_to_numpy
from odil_tpu.models.heat import (
    anneal,
    initial_temperature,
    operator_odil,
    operator_odil_fused,
    operator_pinn,
    pick_imposed,
    squash_k,
    true_conductivity,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add = parser.add_argument
    add("--kernel", type=str, default="xla", choices=["xla", "pallas"],
        help="Residual evaluation path: XLA-fused or the Pallas row-wise kernel")
    add("--Nt", type=int, default=64, help="Grid size in t")
    add("--Nx", type=int, default=64, help="Grid size in x")
    add("--Nci", type=int, default=4096, help="Collocation points inside domain (PINN)")
    add("--Ncb", type=int, default=128, help="Collocation points per boundary (PINN)")
    add("--arch_u", type=int, nargs="*", default=[10, 10], help="u-network architecture (PINN)")
    add("--arch_k", type=int, nargs="*", default=[5, 5], help="k-network architecture")
    add("--solver", type=str, choices=("pinn", "odil"), default="odil")
    add("--infer_k", type=int, default=0, help="Infer conductivity")
    add("--kxreg", type=float, default=0, help="Space regularization weight")
    add("--kxregdecay", type=float, default=0, help="Decay period of kxreg")
    add("--ktreg", type=float, default=0, help="Time regularization weight")
    add("--ktregdecay", type=float, default=0, help="Decay period of ktreg")
    add("--kwreg", type=float, default=0, help="Network-weight regularization")
    add("--kwregdecay", type=float, default=0, help="Decay period of kwreg")
    add("--kimp", type=float, default=2, help="Weight of imposed points")
    add("--keep_frozen", type=int, default=1, help="Respect frozen attribute for fields")
    add("--keep_init", type=int, default=1, help="Impose initial conditions")
    add("--ref_path", type=str, help="Path to reference solution *.pickle")
    add("--imposed", type=str, choices=["random", "stripe", "none"], default="none")
    add("--nimp", type=int, default=200, help="Number of imposed points")
    add("--noise", type=float, default=0, help="Noise magnitude on measurements")
    add("--kmax", type=float, default=0.1, help="Maximum conductivity")
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        outdir="out_heat",
        linsolver="direct",
        optimizer="adam",
        lr=0.001,
        double=0,
        multigrid=1,
        plotext="png",
        plot_title=1,
        plot_every=2000,
        report_every=500,
        history_full=10,
        history_every=100,
        frames=10,
    )
    return parser.parse_args(argv)


def eval_u_net(domain, state):
    tt, xx = domain.points()
    return eval_neural_net(state.fields["u_net"], [tt, xx], domain.mod)[0]


def state_temperature(domain, state, args):
    if args.solver == "odil":
        return np.asarray(domain.field(state, "u"))
    return np.asarray(eval_u_net(domain, state))


def plot_func(problem, state, epoch, frame, cbinfo=None):
    from odil_tpu.plot import plot_1d

    domain = problem.domain
    extra = problem.extra
    mod = domain.mod
    args = extra.args
    path0 = f"u_{frame:05d}.{args.plotext}"
    path1 = f"k_{frame:05d}.{args.plotext}"
    printlog(path0, path1)

    state_u = state_temperature(domain, state, args)

    def scatter_imposed(i, fig, ax, data, extent):
        if i == 0 and len(extra.imp_points):
            imp_t, imp_x = extra.imp_points.T
            ax.scatter(imp_x, imp_t, s=0.5, alpha=1, edgecolor="none", facecolor="k", zorder=100)

    plot_1d(
        domain,
        np.asarray(extra.imp_u),
        state_u,
        path=path0,
        title=f"u epoch={epoch}" if args.plot_title else None,
        cmap="YlOrBr",
        nslices=5,
        interpolation="bilinear",
        callback=scatter_imposed,
        transpose=True,
        umin=0,
        umax=1,
    )

    fig, ax = plt.subplots(figsize=(1.7, 1.5))
    ref_uk = extra.ref_uk
    ref_k = true_conductivity(ref_uk)
    k = None
    if args.infer_k:
        k = squash_k(domain.neural_net(state, "k_net")(ref_uk)[0], mod, args.kmax)
        ax.plot(ref_uk, np.asarray(k), zorder=10)
    ax.plot(ref_uk, ref_k, c="C2", lw=1.5, zorder=1)
    ax.set_xlabel("u")
    ax.set_ylabel("k")
    ax.set_ylim(0, 0.03)
    if args.plot_title:
        ax.set_title(f"k epoch={epoch}")
    fig.savefig(path1, bbox_inches="tight")
    plt.close(fig)

    if args.dump_data:
        payload = struct_to_numpy(
            mod,
            dict(
                state_u=state_u,
                ref_u=extra.ref_u,
                imp_u=extra.imp_u,
                ref_uk=ref_uk,
                k=k,
                ref_k=ref_k,
                imp_indices=extra.imp_indices,
                imp_points=extra.imp_points,
            ),
        )
        with open(f"data_{frame:05d}.pickle", "wb") as f:
            pickle.dump(payload, f)


def compute_error(domain, extra, state, key):
    args = extra.args
    if key == "u":
        du = state_temperature(domain, state, args) - np.asarray(extra.ref_u)
        return float(np.sqrt(np.mean(du**2)))
    if key == "k" and args.infer_k:
        k = squash_k(domain.neural_net(state, "k_net")(extra.ref_uk)[0], domain.mod, args.kmax)
        dk = np.asarray(k) - extra.ref_k
        return float(np.sqrt(np.mean(dk**2)) / extra.ref_k.max())
    return None


def history_func(problem, state, epoch, history, cbinfo):
    for key in ["u", "k"]:
        err = compute_error(problem.domain, problem.extra, state, key)
        if err is not None:
            history.append("error_" + key, err)


def report_func(problem, state, epoch, cbinfo):
    errs = {}
    for key in ["u", "k"]:
        err = compute_error(problem.domain, problem.extra, state, key)
        if err is not None:
            errs[key] = err
    printlog("error: " + ", ".join(f"{k}:{v:.5g}" for k, v in errs.items()))


def load_fields_interp(path, keys, domain):
    """Loads fields from a checkpoint and spline-interpolates to this grid."""
    from scipy.interpolate import RectBivariateSpline

    src_state = odil.State(fields={key: odil.Field() for key in keys})
    out = odil.State(fields={key: odil.Field() for key in keys})
    checkpoint_load(domain, src_state, path)
    x1, y1 = domain.points_1d()
    for key in keys:
        src = src_state.fields[key]
        src_domain = odil.Domain(
            cshape=src.array.shape,
            dimnames=("x", "y"),
            lower=domain.lower,
            upper=domain.upper,
            dtype=domain.dtype,
            mod=odil.backend.ModNumpy(),
        )
        src = src_domain.init_field(src)
        if src_domain.cshape != domain.cshape:
            sx, sy = src_domain.points_1d()
            out.fields[key].array = RectBivariateSpline(sx, sy, np.asarray(src.array))(x1, y1)
        else:
            out.fields[key] = src
    return out


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    domain = odil.Domain(cshape=(args.Nt, args.Nx), dimnames=("t", "x"), multigrid=args.multigrid, dtype=dtype)
    if domain.multigrid:
        printlog("multigrid levels:", domain.mg_cshapes)
    mod = domain.mod
    tt, xx = domain.points()
    t1, x1 = domain.points_1d()
    init_u = initial_temperature(x1 * 0, mod.cast(x1, dtype), mod)

    if args.ref_path is not None:
        printlog(f"Loading reference solution from '{args.ref_path}'")
        ref_state = load_fields_interp(args.ref_path, ["u"], domain)
        ref_u = domain.cast(ref_state.fields["u"].array)
    else:
        ref_u = initial_temperature(tt, xx, mod)

    imp_u = np.asarray(ref_u).copy()
    if args.noise:
        rng = np.random.default_rng(args.seed)
        imp_u = imp_u + rng.normal(loc=0, scale=args.noise, size=imp_u.shape)

    imp_mask, imp_points, imp_indices = pick_imposed(domain, args)
    imp_size = len(imp_points)
    with open("imposed.csv", "w") as f:
        f.write(",".join(domain.dimnames) + "\n")
        for p in imp_points:
            f.write("{:},{:}\n".format(*p))

    ref_uk = np.linspace(0, 1, 200).astype(domain.dtype)
    ref_k = true_conductivity(ref_uk)

    extra = argparse.Namespace(
        args=args,
        ref_u=ref_u,
        ref_uk=ref_uk,
        ref_k=ref_k,
        init_u=mod.cast(init_u, dtype),
        imp_mask=mod.cast(imp_mask, dtype),
        imp_size=imp_size,
        imp_u=mod.cast(imp_u, dtype),
        imp_indices=imp_indices,
        imp_points=imp_points,
    )

    state = odil.State()
    if args.solver == "odil":
        operator = operator_odil_fused if args.kernel == "pallas" else operator_odil
        state.fields["u"] = np.zeros(domain.cshape)
    elif args.solver == "pinn":
        operator = operator_pinn
        state.fields["u_net"] = domain.make_neural_net([2] + args.arch_u + [1])
        t_inner, x_inner = domain.random_inner(args.Nci)
        tb0, xb0 = domain.random_boundary(1, 0, args.Ncb)
        tb1, xb1 = domain.random_boundary(1, 1, args.Ncb)
        extra.t_inner, extra.x_inner = t_inner, x_inner
        extra.t_bound = np.hstack((tb0, tb1))
        extra.x_bound = np.hstack((xb0, xb1))
        extra.t_init, extra.x_init = domain.random_boundary(0, 0, args.Ncb)
        extra.u_init = initial_temperature(
            mod.cast(extra.t_init, dtype), mod.cast(extra.x_init, dtype), mod
        )
        extra.u_bound = initial_temperature(
            mod.cast(extra.t_bound, dtype), mod.cast(extra.x_bound, dtype), mod
        )
        printlog("Number of collocation points:")
        printlog(f"inner: {len(t_inner)}")
        printlog(f"init: {len(extra.t_init)}")
        printlog(f"bound: {len(extra.t_bound)}")
    else:
        raise RuntimeError(f"Unknown solver={args.solver}")

    if args.infer_k:
        state.fields["k_net"] = domain.make_neural_net([1] + args.arch_k + [1])

    state = domain.init_state(state)
    problem = odil.Problem(operator, domain, extra)

    if args.checkpoint is not None:
        printlog(f"Loading checkpoint '{args.checkpoint}'")
        optstate = checkpoint_load(domain, state, args.checkpoint)
        if optstate is not None:
            problem.resume_opt_state = optstate
        tpath = os.path.splitext(args.checkpoint)[0] + "_train.pickle"
        if args.checkpoint_train is None:
            assert os.path.isfile(tpath), f"File not found '{tpath}'"
            args.checkpoint_train = tpath

    if args.checkpoint_train:
        printlog(f"Loading history from '{args.checkpoint_train}'")
        hist = odil.History()
        hist.load(args.checkpoint_train)
        args.epoch_start = int(hist.get("epoch", [args.epoch_start])[-1])
        args.frame_start = int(hist.get("frame", [args.frame_start])[-1])
        printlog(f"Starting from epoch={args.epoch_start} frame={args.frame_start}")
    return problem, state


def main(argv=None):
    args = parse_args(argv)
    odil.setup_outdir(args, relpath_args=["checkpoint", "checkpoint_train", "ref_path"])
    problem, state = make_problem(args)
    callback = odil.make_callback(
        problem, args, plot_func=plot_func, history_func=history_func, report_func=report_func
    )
    odil.util.optimize(args, args.optimizer, problem, state, callback)
    with open("done", "w"):
        pass
    return problem, state


if __name__ == "__main__":
    main()
