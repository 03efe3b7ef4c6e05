#!/usr/bin/env python3
"""Measures the generic one-pass fused loss+grad (Problem's deferred-call
route over ops/rowwise.rowwise_loss_and_grads) against the standard
jax.value_and_grad path for kernels WITHOUT multigrid partials -- the
`--kernel pallas` configurations (the pallas_mg flagship has its own fused
route and is measured by bench.py / roofline.py).

Chains follow BENCH_NOTES methodology: one jitted lax.scan per dispatch,
carry evolves, warmup at the same length.

Run on the TPU:  python benchmarks/onepass_bench.py [--nx 256]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from roofline import timed_chain  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--length", type=int, default=200)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--multigrid", type=int, default=1)
    args = parser.parse_args()

    from odil_tpu.models import veltracer as vt

    problem, state, _ = vt.build(
        nt=args.nt, nx=args.nx, ny=args.nx, kernel="pallas",
        multigrid=bool(args.multigrid), dtype=np.float32,
    )
    loss_fn, arrays = problem.make_loss_fn(state)
    onepass = problem.make_loss_grad_fn(state)
    assert onepass is not None, "generic one-pass declined (off TPU / VMEM?)"
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    x0 = [jnp.asarray(a) for a in arrays]

    def chain_of(grad_fn):
        def step(carry, _):
            x, t = carry
            (loss, _), g = grad_fn(x, {"epoch": t})
            return ([xi - 1e-30 * gi for xi, gi in zip(x, g)], t + 1), loss

        return jax.jit(lambda c: jax.lax.scan(step, c, None, length=args.length))

    dt_vg, vg_times = timed_chain(
        chain_of(vg), (x0, jnp.asarray(0, jnp.int32)), args.length, args.reps
    )
    dt_op, op_times = timed_chain(
        chain_of(onepass), (x0, jnp.asarray(0, jnp.int32)), args.length, args.reps
    )
    print(
        f"veltracer ({args.nt},{args.nx},{args.nx}) f32 kernel=pallas "
        f"multigrid={bool(args.multigrid)}"
    )
    print(f"  value_and_grad (fwd+bwd kernels): {dt_vg * 1e3:.3f} ms/iter {vg_times}")
    print(f"  generic one-pass (bwd only):      {dt_op * 1e3:.3f} ms/iter {op_times}")
    print(f"  speedup: {dt_vg / dt_op:.3f}x")


if __name__ == "__main__":
    main()
