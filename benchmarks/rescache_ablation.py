#!/usr/bin/env python3
"""Upper-bounds the value of caching forward residual rows for the one-pass
backward kernel (the round-1 VERDICT lever: "cache forward residuals in a
resident VMEM block / extra output so the backward skips row-fn
re-evaluation").

Method: the only places the backward kernel CONSUMES the primal residual
values are the cotangent seeds (``_weights_of``: w_k = 2 g_k res_k) and the
fused loss sums (``_sumsq_vec``).  Replacing both with constants makes
``res`` dead, so Mosaic/XLA dead-code-eliminates exactly the
residual-ASSEMBLY ops -- the part of the row function a cached-residual
scheme could skip (the nonlinear Jacobian intermediates must be recomputed
either way: caching res_k does not provide du_x, the upwind masks, or the
products).  The ablated kernel is therefore a STRICT lower bound on the
runtime of any cached-residual backward, before the cache's own HBM cost
(writing + reading nterms residual planes/row) is even paid.

Run on the TPU:  python benchmarks/rescache_ablation.py [--nx 256]
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
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--length", type=int, default=200)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise, rowwise_mg

    problem, state, _ = vt.build(
        nt=args.nt, nx=args.nx, ny=args.nx, kernel="pallas_mg",
        multigrid=True, dtype=np.float32,
    )
    grad_fn = problem.make_loss_grad_fn(state)
    assert grad_fn is not None, "one-pass route declined"
    _, arrays = problem.make_loss_fn(state)
    x0 = [jnp.asarray(a) for a in arrays]

    def chain():
        def step(carry, _):
            x, t = carry
            (loss, _), g = grad_fn(x, {"epoch": t})
            return ([xi - 1e-30 * gi for xi, gi in zip(x, g)], t + 1), loss

        return jax.jit(lambda c: jax.lax.scan(step, c, None, length=args.length))

    def measure(label):
        run = chain()
        carry = (x0, jnp.asarray(0, jnp.int32))
        carry, out = run(carry)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            carry, out = run(carry)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / args.length)
        dt = float(np.median(times))
        print(f"{label}: {dt * 1e3:.4f} ms/iter  "
              f"reps={[round(t * 1e3, 4) for t in times]}", flush=True)
        return dt

    dt_base = measure("one-pass loss+grad (as shipped)")

    # Ablation: constant seeds + constant sums -> res is dead, DCE removes
    # the residual-assembly ops.  (Gradients become WRONG; this is a perf
    # bound, not a correctness configuration.)
    real_weights, real_sumsq = rowwise._weights_of, rowwise._sumsq_vec

    def const_weights(gvec, res, nterms):
        return tuple(jnp.zeros_like(r) + 1e-6 for r in res[:nterms])

    def const_sumsq(res):
        return jnp.ones((len(res),), res[0].dtype)

    rowwise._weights_of = const_weights
    rowwise._sumsq_vec = const_sumsq
    rowwise_mg._weights_of = const_weights
    rowwise_mg._sumsq_vec = const_sumsq
    try:
        # Rebuild so the kernels retrace with the patched helpers.
        problem2, state2, _ = vt.build(
            nt=args.nt, nx=args.nx, ny=args.nx, kernel="pallas_mg",
            multigrid=True, dtype=np.float32,
        )
        grad_fn = problem2.make_loss_grad_fn(state2)
        dt_abl = measure("ABLATED (res dead; lower bound of any cache scheme)")
    finally:
        rowwise._weights_of = real_weights
        rowwise._sumsq_vec = real_sumsq
        rowwise_mg._weights_of = real_weights
        rowwise_mg._sumsq_vec = real_sumsq

    saved = (dt_base - dt_abl) * 1e3
    cells = args.nt * args.nx * args.nx
    # The cache's own minimum HBM cost: nterms residual planes written by a
    # forward pass and read back by the backward (fp32).
    nterms = 6
    bytes_rt = 2 * nterms * cells * 4
    print(f"residual-assembly cost (upper bound of cache saving): "
          f"{saved:.4f} ms/iter")
    print(f"cache minimum added HBM traffic: {bytes_rt / 1e6:.0f} MB/iter "
          f"= {bytes_rt / 588e9 * 1e3:.3f} ms at the measured 588 GB/s "
          f"copy ceiling")


if __name__ == "__main__":
    main()
