#!/usr/bin/env python3
"""Isolates the multigrid Horner ladder's cost inside a vjp on one chip,
to explain the halo_bench observation that the generic one-pass with the
halo LOCAL ladder (per-field, major-axis-first matmuls) runs ~1.4x faster
than the single-device form (batched, minor-axis-first interp_to_finer):
times the ladder alone -- forward + cotangent pullback -- in the
configurations that differ between the two paths.

  a) batched (stack u,vx,vy), minor-first   (problem._flatten_multigrid_batched)
  b) batched, major-first
  c) per-field, minor-first
  d) per-field, major-first                 (halo._local_mg_block's order)

Run on the TPU:  python benchmarks/ladder_bench.py [--nx 256] [--nt 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--length", type=int, default=200)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from odil_tpu.transfer import _interp_matrix

    nt, nx = args.nt, args.nx
    loc = "ncc"
    # veltracer default hierarchy: halve all axes while >= 4 or so; use the
    # Domain's own ladder shapes.
    from odil_tpu.grid import Domain

    dom = Domain(cshape=(nt, nx, nx), dimnames=("t", "x", "y"),
                 multigrid=True, dtype=np.float32)
    shapes = []
    for cs in dom.mg_cshapes:
        shapes.append(tuple(c + (1 if l == "n" else 0) for c, l in zip(cs, loc)))
    nlvl = len(shapes)
    print(f"ladder shapes: {shapes}")

    rng = np.random.default_rng(0)
    levels3 = [jnp.asarray(rng.standard_normal((3,) + s).astype(np.float32))
               for s in shapes]

    mats = []
    for lvl in range(nlvl - 1):
        mats.append({d: jnp.asarray(_interp_matrix(shapes[lvl + 1][d], loc[d],
                                                   np.float32))
                     for d in range(3)})

    def ladder(levels, order, batched):
        off = 1 if batched else 0

        def apply(acc, lvl, d):
            M = mats[lvl][d]
            moved = jnp.moveaxis(acc, d + off, -1)
            return jnp.moveaxis(moved @ M.T, -1, d + off)

        acc = levels[-1]
        for lvl in range(nlvl - 2, -1, -1):
            dims = range(3) if order == "major" else reversed(range(3))
            for d in dims:
                acc = apply(acc, lvl, d)
            acc = levels[lvl] + acc
        return acc

    def timed(name, fn, example):
        def step(xs):
            out, vjp = jax.vjp(fn, xs)
            (gxs,) = vjp(out)  # arbitrary cotangent with the output's scale
            return gxs

        def chain(xs):
            def body(carry, _):
                g = step(carry)
                return [0.999 * c + 1e-6 * gg for c, gg in zip(carry, g)], 0.0

            out, _ = jax.lax.scan(body, xs, None, length=args.length)
            return out

        cfun = jax.jit(chain)
        out = cfun(example)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = cfun(example)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / args.length * 1e3)
        print(f"  {name:34s} {min(ts):.4f} ms/iter "
              f"[{', '.join(f'{t:.4f}' for t in ts)}]")
        return min(ts)

    timed("batched(3) minor-first", lambda xs: ladder(xs, "minor", True), levels3)
    timed("batched(3) major-first", lambda xs: ladder(xs, "major", True), levels3)
    timed("per-field x3 minor-first",
          lambda xs: jnp.stack([ladder([x[i] for x in xs], "minor", False)
                                for i in range(3)]),
          levels3)
    timed("per-field x3 major-first",
          lambda xs: jnp.stack([ladder([x[i] for x in xs], "major", False)
                                for i in range(3)]),
          levels3)


if __name__ == "__main__":
    main()
