#!/usr/bin/env python3
"""Prices the ``halox > 8`` tiled-route decline (VERDICT r3 item 7).

The x-tiled kernels stream 8-row halo blocks (rowwise_tiled._HB), so an
operator declaring a stencil reach halox > 8 along x is declined by
``_pick_tiled_route`` and takes the exact XLA fallback at beyond-VMEM
plane sizes.  This script measures that fallback's cost against the tiled
route on the SAME row function (a reach-8 stencil): one run declares
halox=8 (tiled route), the other halox=9 (over-declared reach, forcing
the decline) -- identical math, only the routing differs.

Run on the TPU:  python benchmarks/halox_price.py [--nx 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=512)
    parser.add_argument("--length", type=int, default=100)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--reach", type=int, default=8)
    args = parser.parse_args()

    from odil_tpu.ops import rowwise

    T, X, Y = args.nt, args.nx, args.nx
    reach = args.reach

    def row_fn(it, T_, rows, data_rows, pv, consts):
        (u_r,) = rows
        ucur, uprev = u_r
        # A reach-`reach` x-stencil plus the usual backward time coupling.
        acc = ucur * 2.0
        for m in range(1, reach + 1):
            acc = acc + (jnp.roll(ucur, m, 0) + jnp.roll(ucur, -m, 0)) / (
                m * m + 1.0
            )
        return (acc - uprev,)

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (T, X, Y), jnp.float32)

    def chain(halox):
        def step(carry, _):
            x, t = carry
            out = rowwise.rowwise_loss_and_grads(
                row_fn, (x,), nterms=1, hist=1, halox=halox
            )
            if out is None:
                # Declined one-pass: the exact fallback (value_and_grad of
                # the loss terms, itself routed by the same halox).
                def loss(xx):
                    return rowwise.rowwise_loss_terms(
                        row_fn, (xx,), nterms=1, hist=1, halox=halox
                    )[0]

                l, g = jax.value_and_grad(loss)(x)
                gx = g
                s0 = l
            else:
                sums, dfields, _ = out
                gx = dfields[0]
                s0 = sums[0]
            return (x - 1e-30 * gx, t + 1), s0

        return jax.jit(lambda c: jax.lax.scan(step, c, None, length=args.length))

    for halox, label in ((reach, f"halox={reach} (tiled route)"),
                         (9, "halox=9 (declined -> XLA fallback)")):
        run = chain(halox)
        carry = (u, jnp.asarray(0, jnp.int32))
        carry, out = run(carry)
        # Drain the axon pipeline: right after a compile, block_until_ready
        # can return before the execution finishes (measured: the "work"
        # then lands in the next device_get).  A scalar fetch forces it.
        float(np.asarray(out)[-1])
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            carry, out = run(carry)
            jax.block_until_ready((carry, out))
            float(np.asarray(out)[-1])  # scalar fetch: honest completion
            times.append((time.perf_counter() - t0) / args.length)
        dt = float(np.median(times))
        print(f"{label}: {dt * 1e3:.3f} ms/iter "
              f"({T * X * Y / dt / 1e9:.2f} Gcells/s)  "
              f"reps={[round(t * 1e3, 3) for t in times]}")


if __name__ == "__main__":
    main()
