#!/usr/bin/env python3
"""Profiles one training-step dispatch of the fused one-pass loss+grad
(optionally + Adam) at a given size and dumps (a) the compiled HLO and
(b) a device-time breakdown aggregated from the chrome trace, so epilogue
fusions around the kernel (pad/reduce/slice traffic) are attributable.

Run on the TPU:
    python benchmarks/profile_onepass.py --nx 512 [--kernel pallas_mg]
Outputs under --out (default /tmp/op_profile): module.txt, breakdown.txt.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def parse_trace(outdir, top=40):
    """Aggregates device-lane event durations by event name from the
    chrome trace json(.gz) that jax.profiler.trace wrote under outdir."""
    paths = glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
    ) + glob.glob(os.path.join(outdir, "**", "*.trace.json"), recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device lanes: process names containing 'TPU' / 'device' (XLA Ops rows).
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tid_name.get((e.get("pid"), e.get("tid")), "")
        proc = pid_name.get(e.get("pid"), "")
        if "XLA Ops" not in lane and "TensorFlow Ops" not in lane:
            continue
        if "TPU" not in proc and "Device" not in proc and "device" not in proc:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
    out = ["device XLA-op time by name (us total across the dispatch):"]
    for name, us in rows:
        out.append(f"{us:12.1f} us  x{cnt[name]:<5d} {name}")
    out.append(f"{sum(tot.values()):12.1f} us  TOTAL")
    return "\n".join(out)


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--nt", type=int, default=64)
    parser.add_argument("--nx", type=int, default=512)
    parser.add_argument("--length", type=int, default=50)
    parser.add_argument("--kernel", type=str, default="pallas_mg")
    parser.add_argument("--adam", type=int, default=0,
                        help="profile the full Adam epoch instead of loss+grad")
    parser.add_argument("--out", type=str, default="/tmp/op_profile")
    args = parser.parse_args()

    from odil_tpu.models import veltracer as vt

    problem, state, _ = vt.build(
        nt=args.nt, nx=args.nx, ny=args.nx, kernel=args.kernel,
        multigrid=True, dtype=np.float32,
    )
    loss_fn, arrays = problem.make_loss_fn(state)
    grad_fn = problem.make_loss_grad_fn(state)
    if grad_fn is None:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        print("NOTE: one-pass declined; profiling value_and_grad")

    if args.adam:
        lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-7

        def step(carry, _):
            x, m, v, t = carry
            (loss, _), g = grad_fn(x, {"epoch": t})
            tt = (t + 1).astype(jnp.float32)
            alpha = lr * jnp.sqrt(1 - b2**tt) / (1 - b1**tt)
            m = [mi + (gi - mi) * (1 - b1) for mi, gi in zip(m, g)]
            v = [vi + (jnp.square(gi) - vi) * (1 - b2) for vi, gi in zip(v, g)]
            x = [xi - mi_ * alpha / (jnp.sqrt(vi_) + eps)
                 for xi, mi_, vi_ in zip(x, m, v)]
            return (x, m, v, t + 1), loss

        x0 = [jnp.asarray(a) for a in arrays]
        carry0 = (x0, [jnp.zeros_like(a) for a in x0],
                  [jnp.zeros_like(a) for a in x0], jnp.asarray(0, jnp.int32))
    else:
        def step(carry, _):
            x, t = carry
            (loss, _), g = grad_fn(x, {"epoch": t})
            return ([xi - 1e-30 * gi for xi, gi in zip(x, g)], t + 1), loss

        carry0 = ([jnp.asarray(a) for a in arrays], jnp.asarray(0, jnp.int32))

    run = jax.jit(lambda c: jax.lax.scan(step, c, None, length=args.length))
    os.makedirs(args.out, exist_ok=True)
    lowered = run.lower(carry0)
    compiled = lowered.compile()
    with open(os.path.join(args.out, "module.txt"), "w") as f:
        f.write(compiled.as_text())

    import time

    carry, out = run(carry0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    carry, out = run(carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.length
    print(f"{args.nx}^2 {args.kernel}: {dt * 1e3:.3f} ms/iter "
          f"({args.nt * args.nx * args.nx / dt / 1e9:.2f} Gcells/s)")

    with jax.profiler.trace(args.out):
        carry, out = run(carry)
        jax.block_until_ready(out)

    summary = parse_trace(args.out)
    if summary:
        per_iter = "\n".join(
            f"{float(line.split()[0]) / args.length:10.1f} us/iter  "
            + line.split("us", 1)[1].strip()
            for line in summary.splitlines()[1:]
            if "us" in line
        )
        text = summary + "\n\nper-iteration (us / length):\n" + per_iter
        print(text)
        with open(os.path.join(args.out, "breakdown.txt"), "w") as f:
            f.write(text)
    else:
        print("no trace json found under", args.out)


if __name__ == "__main__":
    main()
