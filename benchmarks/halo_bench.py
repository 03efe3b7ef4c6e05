#!/usr/bin/env python3
"""Measures the --halo machinery overhead on ONE real chip: a 1-device mesh
with a partitioned axis runs the full shard_map path (ghost-node re-layout,
self-ppermute halo exchange, masked per-shard kernels, psums) against the
plain single-device evaluation.  On one chip the exchange is a self-permute,
so the measured delta is the pure localization overhead -- an upper bound
on what halo mode costs per chip at real multi-chip scale (where it buys an
explicit, overlappable ring schedule instead of GSPMD's inferred one).

Covers the two training-step regimes:
  - 256^2 (fits VMEM): MG-fused halo one-pass (kernel pallas_mg) and the
    generic halo one-pass (kernel pallas) vs their single-device forms.
  - 512^2 (beyond VMEM): the x-tiled halo one-pass (edge-padded extents)
    vs the single-device tiled one-pass.

Chains follow BENCH_NOTES methodology: one jitted lax.scan per dispatch,
carry evolves, warmup at the same length.

Run on the TPU:  python benchmarks/halo_bench.py [--nx 256] [--part t]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from roofline import timed_chain  # noqa: E402


def build(kernel, nt, nx, mesh=None, partition=None):
    from odil_tpu.models import veltracer as vt

    return vt.build(
        nt=nt, nx=nx, ny=nx, kernel=kernel, multigrid=True,
        dtype=np.float32, mesh=mesh, partition=partition,
    )


def grad_fn_of(problem, state, halo, fuse=None):
    fn = problem.make_loss_grad_fn(state, halo=halo, halo_fuse=fuse)
    if fn is None:
        from odil_tpu.halo import make_halo_loss_fn
        import jax

        if halo:
            loss_fn, _ = make_halo_loss_fn(problem, state)
        else:
            loss_fn, _ = problem.make_loss_fn(state)
        fn = jax.value_and_grad(loss_fn, has_aux=True)
        return fn, "value_and_grad"
    route = getattr(fn, "route", None)
    return fn, f"one-pass:{route}" if route else "one-pass"


def measure(name, problem, state, halo, length, reps, fuse=None):
    import jax
    import jax.numpy as jnp

    fn, kind = grad_fn_of(problem, state, halo, fuse=fuse)
    arrays = problem.domain.arrays_from_state(state)
    x0 = [jnp.asarray(a) for a in arrays]

    def step(carry, _):
        x, t = carry
        (loss, _), g = fn(x, {"epoch": t})
        return ([xi - 1e-30 * gi for xi, gi in zip(x, g)], t + 1), loss

    run = jax.jit(lambda c: jax.lax.scan(step, c, None, length=length))
    dt, times = timed_chain(run, (x0, jnp.asarray(0, jnp.int32)), length, reps)
    print(f"  {name:34s} [{kind:14s}] {dt * 1e3:.3f} ms/iter {times}")
    return dt


def main():
    from odil_tpu import parallel

    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--length", type=int, default=200)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--part", default="t", choices=["t", "x", "y"],
                        help="which grid dim the 1-device mesh partitions "
                             "(y = the lane axis: the kernel runs on "
                             "lane-extended blocks whose extent is not a "
                             "multiple of 128, pricing Mosaic's lane pad)")
    parser.add_argument("--kernels", nargs="+", default=["pallas_mg", "pallas"])
    parser.add_argument("--halo_fuse", default=None, choices=["generic", "mg"],
                        help="force the halo one-pass route (default: routing default)")
    args = parser.parse_args()

    mesh = parallel.mesh_from_spec(f"{args.part}:1")
    partition = {args.part: args.part}

    print(f"veltracer ({args.nt},{args.nx},{args.nx}) f32 multigrid, "
          f"1-device mesh partitioning '{args.part}'")
    for kernel in args.kernels:
        problem0, state0, _ = build(kernel, args.nt, args.nx)
        dt0 = measure(f"{kernel} single-device", problem0, state0, False,
                      args.length, args.reps)
        problem1, state1, _ = build(kernel, args.nt, args.nx, mesh, partition)
        dt1 = measure(f"{kernel} halo ({args.part}:1)", problem1, state1, True,
                      args.length, args.reps, fuse=args.halo_fuse)
        print(f"  halo overhead: {(dt1 / dt0 - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
