#!/usr/bin/env python3
"""Benchmark: residual+grad evals/sec on the flagship workload
(velocity_from_tracer, Nt=64, Nx=Ny=256, fp32, multigrid conv, Adam).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation (cselab/odil, TensorFlow backend,
ODIL_JIT=1, its own canonical single-thread CPU environment) measured on
this machine at the same configuration -- see BASELINE_EVALS_PER_SEC below
for the provenance command.  The target from BASELINE.md is >= 10x.
"""

import argparse
import json
import time

import numpy as np

# Reference throughput measured on this machine (epochs 30-60 steady state,
# uncontended single-core CPU):
#   PYTHONPATH=/root/reference/src ODIL_BACKEND=tf python \
#     /root/reference/examples/velocity_from_tracer/veltracer.py \
#     --Nt 64 --Nx 256 --Ny 256 --epochs 60 --report_every 10
# -> train.log: "walltime/epoch: 880 ms" (TF backend at the reference's
#    DEFAULT ODIL_JIT=0 -- its runtime.py:25 default -- fp32, multigrid
#    conv).  This is the reference's FASTEST configuration here: with
#    ODIL_JIT=1 the same run measures 18,655 ms/epoch (XLA:CPU lowers the
#    multigrid conv_transpose ~20x slower than TF's default oneDNN path),
#    so the baseline credits the reference with the better of the two.
#    See BENCH_NOTES.md "Reference baseline: jit off is 20x faster".
BASELINE_EVALS_PER_SEC = 1.0 / 0.880

NT, NX, NY = 64, 256, 256
WARMUP_EPOCHS = 20
MEASURE_EPOCHS = 200


def build(kernel="pallas_mg"):
    import odil_tpu as odil

    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples", "velocity_from_tracer")
    )
    import veltracer

    from odil_tpu.models import veltracer as vtm

    args = veltracer.parse_args(
        ["--Nt", str(NT), "--Nx", str(NX), "--Ny", str(NY), "--kernel", "pallas"]
    )
    args.Nt, args.Ny = NT, NY
    domain = odil.Domain(
        cshape=(NT, NX, NY),
        dimnames=("t", "x", "y"),
        dtype=np.float32,
        multigrid=True,
        mg_interp="conv",
    )
    x, y = map(np.asarray, domain.points("x", "y", loc=".cc"))
    state = odil.State()
    for key in ("u", "vx", "vy"):
        state.fields[key] = odil.Field(None, loc="ncc")
    state = domain.init_state(state)
    extra = argparse.Namespace(
        u_init=domain.cast(veltracer.tracer_blob(x, y, 0)),
        u_final=domain.cast(veltracer.tracer_blob(x, y, 1)),
        args=args,
    )
    op = {
        "pallas": vtm.operator_fused,
        # pallas_mg: finest multigrid Horner step fused into the kernel
        # (ops/rowwise_mg.py); exact up to MXU-matmul rounding.
        "pallas_mg": vtm.operator_fused_mg,
        "xla": vtm.operator,
    }[kernel]
    problem = odil.Problem(op, domain, extra, mg_partial=(kernel == "pallas_mg"))
    return problem, state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=MEASURE_EPOCHS)
    parser.add_argument("--warmup", type=int, default=WARMUP_EPOCHS)
    parser.add_argument("--chunks", type=int, default=5,
                        help="Measured chunks; the reported value is the "
                             "MEDIAN evals/s across them (the remote-tunnel "
                             "dispatch carries ~3-5%% run-to-run noise, so a "
                             "single chunk cannot resolve small deltas)")
    parser.add_argument("--kernel", type=str, default="pallas_mg",
                        choices=["pallas", "pallas_mg", "xla"],
                        help="Residual kernel: fused Pallas row-wise, the "
                             "same with the finest multigrid Horner step "
                             "fused in (default), or plain XLA")
    parser.add_argument("--slot_dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="Adam moment-slot storage dtype (bfloat16 halves "
                             "their HBM traffic; trajectory within 1%% of fp32 "
                             "at 1000 epochs, see BENCH_NOTES.md)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    problem, state = build(kernel=args.kernel)
    loss_fn, arrays = problem.make_loss_fn(state)
    # Fused one-pass loss+grad (pallas_mg): the backward sweep accumulates
    # the loss while producing cotangents, skipping the forward kernel.
    grad_fn = problem.make_loss_grad_fn(state) or jax.value_and_grad(loss_fn, has_aux=True)

    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-7
    slot_dtype = jnp.dtype(args.slot_dtype)

    def epoch_step(carry, _):
        x, m, v, t = carry
        (loss, _), grads = grad_fn(x, {"epoch": t})
        tt = (t + 1).astype(jnp.float32)
        alpha = lr * jnp.sqrt(1 - b2**tt) / (1 - b1**tt)
        m = [mi.astype(jnp.float32) + (g - mi.astype(jnp.float32)) * (1 - b1) for mi, g in zip(m, grads)]
        v = [vi.astype(jnp.float32) + (jnp.square(g) - vi.astype(jnp.float32)) * (1 - b2) for vi, g in zip(v, grads)]
        x = [xi - mi * alpha / (jnp.sqrt(vi) + eps) for xi, mi, vi in zip(x, m, v)]
        m = [mi.astype(slot_dtype) for mi in m]
        v = [vi.astype(slot_dtype) for vi in v]
        return (x, m, v, t + 1), loss

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run_chunk(carry, n):
        return jax.lax.scan(epoch_step, carry, None, length=n)

    x = [jnp.asarray(a) for a in arrays]
    carry = (
        x,
        [jnp.zeros(a.shape, slot_dtype) for a in x],
        [jnp.zeros(a.shape, slot_dtype) for a in x],
        jnp.asarray(0, jnp.int32),
    )

    # Warmup with the SAME chunk length so compile time is fully excluded.
    carry, losses = run_chunk(carry, args.epochs)
    jax.block_until_ready(losses)

    # Measure several chunks and report the MEDIAN: single-chunk numbers
    # through the remote tunnel spread ~3-5% run to run (BENCH_NOTES.md),
    # and cross-session captures of the same code have differed by 10%.
    rates = []
    for _ in range(max(1, args.chunks)):
        t0 = time.perf_counter()
        carry, losses = run_chunk(carry, args.epochs)
        jax.block_until_ready(losses)
        rates.append(args.epochs / (time.perf_counter() - t0))

    evals_per_sec = float(np.median(rates))
    best_ms = 1000.0 / max(rates)
    final_loss = float(np.asarray(losses)[-1])
    assert np.isfinite(final_loss)

    print(
        json.dumps(
            {
                "metric": "veltracer_256x256_residual_grad_evals_per_sec",
                "value": round(evals_per_sec, 3),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_sec / BASELINE_EVALS_PER_SEC, 2),
                "chunks": [round(r, 1) for r in rates],
                "best_ms_per_epoch": round(best_ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
