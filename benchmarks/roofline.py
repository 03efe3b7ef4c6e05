#!/usr/bin/env python3
"""Quantifies the HBM-roofline position of the fused MG training step
(VERDICT r1 item 3): achieved bytes/s vs the v5e peak and vs an empirical
pure-copy ceiling, plus XLA cost-analysis FLOPs for arithmetic intensity.

Methodology (the naive per-call timing is wrong twice over this sandbox's
remote TPU tunnel: each dispatch costs ~0.5-1 ms of RPC latency, and the
service memoizes identical (program, inputs) dispatches):
  * every measured quantity is ONE dispatch of a jitted ``lax.scan`` chain
    whose carry feeds the next iteration, so per-iteration time is
    (dispatch_time / length) with the RPC cost amortized to noise;
  * the warmup dispatch and each timed dispatch get different carries
    (the chain itself evolves them), so memoization can never short-circuit
    a timed call;
  * warmup uses the SAME scan length as measurement (compile time excluded,
    see CLAUDE.md).

Three chains are timed:
  1. the full training epoch (fused one-pass loss+grad + scanned Adam with
     bfloat16 moment slots -- exactly bench.py's headline program);
  2. loss+grad only (carry ``x - 1e-30*g``, unfoldable, minimal extra
     traffic: one re-write of the state arrays);
  3. a pure-copy Pallas chain over the same fine-grid arrays = the
     empirically achievable HBM bandwidth on this chip for this access
     pattern (row-blocked streams), the honest "100%" line.

Byte accounting is the analytic *minimum* HBM traffic, so achieved GB/s is
a lower bound:
  loss+grad: read 3 fine t0 + 3 coarse P1 partials + 2 fine-plane consts,
  write 3 fine dt0 + 3 coarse dP1 (the XLA prologue/epilogue touch the
  sub-coarse ladder again -- ignored);
  Adam: read g, x, m, v; write x, m, v (m, v in bfloat16).

Run on the TPU:  python benchmarks/roofline.py [--nx 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth (public spec)


def timed_chain(run, carry, length, reps):
    """One warmup dispatch + `reps` timed dispatches of a scan chain.
    The carry evolves through every dispatch, so no two dispatches see the
    same inputs.  Returns (per-iteration seconds, all rep timings)."""
    import jax

    carry, out = run(carry)  # compile + warmup, same length as measurement
    jax.block_until_ready((carry, out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, out = run(carry)
        jax.block_until_ready((carry, out))
        times.append((time.perf_counter() - t0) / length)
    return float(np.median(times)), [round(t * 1e3, 4) for t in times]


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--length", type=int, default=200)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import bench  # noqa: E402  (repo-root bench.py, repo root is on sys.path)

    bench.NT, bench.NX, bench.NY = args.nt, args.nx, args.nx
    problem, state = bench.build(kernel="pallas_mg")
    grad_fn = problem.make_loss_grad_fn(state)
    assert grad_fn is not None
    _, arrays = problem.make_loss_fn(state)
    x0 = [jnp.asarray(a) for a in arrays]

    # --- chain 1: full epoch (bench.py's program, bf16 slots) ---
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-7
    slot = jnp.bfloat16

    def epoch_step(carry, _):
        x, m, v, t = carry
        (loss, _), g = grad_fn(x, {"epoch": t})
        tt = (t + 1).astype(jnp.float32)
        alpha = lr * jnp.sqrt(1 - b2**tt) / (1 - b1**tt)
        m = [mi.astype(jnp.float32) + (gi - mi.astype(jnp.float32)) * (1 - b1) for mi, gi in zip(m, g)]
        v = [vi.astype(jnp.float32) + (jnp.square(gi) - vi.astype(jnp.float32)) * (1 - b2) for vi, gi in zip(v, g)]
        x = [xi - mi * alpha / (jnp.sqrt(vi) + eps) for xi, mi, vi in zip(x, m, v)]
        return (x, [mi.astype(slot) for mi in m], [vi.astype(slot) for vi in v], t + 1), loss

    run_epoch = jax.jit(lambda c: jax.lax.scan(epoch_step, c, None, length=args.length))
    carry0 = (x0, [jnp.zeros(a.shape, slot) for a in x0],
              [jnp.zeros(a.shape, slot) for a in x0], jnp.asarray(0, jnp.int32))
    dt_epoch, epoch_times = timed_chain(run_epoch, carry0, args.length, args.reps)

    # --- chain 2: loss+grad only ---
    def lg_step(carry, _):
        x, t = carry
        (loss, _), g = grad_fn(x, {"epoch": t})
        return ([xi - 1e-30 * gi for xi, gi in zip(x, g)], t + 1), loss

    run_lg = jax.jit(lambda c: jax.lax.scan(lg_step, c, None, length=args.length))
    dt_lg, lg_times = timed_chain(run_lg, (x0, jnp.asarray(0, jnp.int32)), args.length, args.reps)

    # --- chain 3: pure-copy ceiling over the fine arrays ---
    from jax.experimental import pallas as pl

    T = args.nt + 1

    def copy_kernel(*refs):
        n = len(refs) // 2
        for i in range(n):
            refs[n + i][...] = refs[i][...]

    # Whole planes up to 256^2; x-tiled rows beyond (a (1, 1024, 1024)
    # block is 4 MiB -- 3 in + 3 out double-buffered overflows VMEM).
    bx = args.nx if args.nx <= 256 else 128
    spec = pl.BlockSpec((1, bx, args.nx), lambda i, q: (i, q, 0))
    copy3 = pl.pallas_call(
        copy_kernel,
        grid=(T, args.nx // bx),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((T, args.nx, args.nx), jnp.float32)] * 3,
    )

    def copy_step(carry, _):
        return list(copy3(*carry)), None

    run_copy = jax.jit(lambda c: jax.lax.scan(copy_step, c, None, length=args.length))
    fine0 = [jnp.asarray(np.random.rand(T, args.nx, args.nx), jnp.float32) for _ in range(3)]
    dt_copy, copy_times = timed_chain(run_copy, fine0, args.length, args.reps)

    # --- byte accounting (analytic minima) ---
    Tc = args.nt // 2 + 1
    fine = T * args.nx * args.nx * 4
    coarse = Tc * (args.nx // 2) * (args.nx // 2) * 4
    consts = 2 * args.nx * args.nx * 4
    state_b = sum(int(a.size) * 4 for a in x0)  # all levels of all 3 fields
    lg_bytes = 2 * 3 * (fine + coarse) + consts
    adam_bytes = state_b * (4 + 2 + 2 + 4 + 2 + 2) // 4  # r g,m,v + w x,m,v (bf16 slots) per f32 elem
    adam_bytes += state_b  # read x
    epoch_bytes = lg_bytes + adam_bytes
    copy_bytes = 2 * 3 * fine

    gbps_lg = lg_bytes / dt_lg / 1e9
    gbps_epoch = epoch_bytes / dt_epoch / 1e9
    gbps_copy = copy_bytes / dt_copy / 1e9

    # --- FLOPs: XLA cost analysis of the equivalent XLA-path loss+grad ---
    problem0, state0 = bench.build(kernel="xla")
    loss_fn0, arrays0 = problem0.make_loss_fn(state0)
    g0 = jax.jit(jax.value_and_grad(lambda a, t: loss_fn0(a, t)[0]))
    compiled = g0.lower([jnp.asarray(a) for a in arrays0], problem0.tracers).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))

    out = {
        "shape": [args.nt, args.nx, args.nx],
        "epoch_ms": round(dt_epoch * 1e3, 4),
        "lossgrad_ms": round(dt_lg * 1e3, 4),
        "copy_ms": round(dt_copy * 1e3, 4),
        "rep_times_ms": {"epoch": epoch_times, "lossgrad": lg_times, "copy": copy_times},
        "min_bytes_MB": {"lossgrad": round(lg_bytes / 1e6, 1),
                         "epoch": round(epoch_bytes / 1e6, 1),
                         "copy": round(copy_bytes / 1e6, 1)},
        "achieved_GBps": {"lossgrad": round(gbps_lg, 1), "epoch": round(gbps_epoch, 1)},
        "copy_ceiling_GBps": round(gbps_copy, 1),
        "pct_of_hbm_peak": {"lossgrad": round(100 * gbps_lg / V5E_HBM_GBPS, 1),
                            "epoch": round(100 * gbps_epoch / V5E_HBM_GBPS, 1),
                            "copy": round(100 * gbps_copy / V5E_HBM_GBPS, 1)},
        "pct_of_copy_ceiling": {"lossgrad": round(100 * gbps_lg / gbps_copy, 1),
                                "epoch": round(100 * gbps_epoch / gbps_copy, 1)},
        "xla_flops_per_eval_G": round(flops / 1e9, 2),
        "achieved_TFLOPs_lossgrad": round(flops / dt_lg / 1e12, 3),
        "arith_intensity_flops_per_byte": round(flops / lg_bytes, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
