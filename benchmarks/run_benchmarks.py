#!/usr/bin/env python3
"""Benchmark campaign: epochs/s across workloads and sizes on the current
device.  Produces one JSON line per configuration and a markdown table.

Usage: python benchmarks/run_benchmarks.py [--configs NAME ...] [--epochs N]
"""

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "examples/velocity_from_tracer")
sys.path.insert(0, "examples/poisson")
sys.path.insert(0, "examples/wave")


def adam_epoch_runner(problem, state, lr=0.01):
    """Returns run(n) executing n Adam epochs in one scanned device call."""
    import jax
    import jax.numpy as jnp

    loss_fn, arrays = problem.make_loss_fn(state)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    b1, b2, eps = 0.9, 0.999, 1e-7

    def epoch_step(carry, _):
        x, m, v, t = carry
        (loss, _), grads = grad_fn(x, {"epoch": t})
        tt = (t + 1).astype(x[0].dtype)
        alpha = lr * jnp.sqrt(1 - b2**tt) / (1 - b1**tt)
        m = [mi + (g - mi) * (1 - b1) for mi, g in zip(m, grads)]
        v = [vi + (jnp.square(g) - vi) * (1 - b2) for vi, g in zip(v, grads)]
        x = [xi - mi * alpha / (jnp.sqrt(vi) + eps) for xi, mi, vi in zip(x, m, v)]
        return (x, m, v, t + 1), loss

    @partial(jax.jit, static_argnums=1)
    def run_chunk(carry, n):
        return jax.lax.scan(epoch_step, carry, None, length=n)

    x = [jnp.asarray(a) for a in arrays]
    carry = (x, [jnp.zeros_like(a) for a in x], [jnp.zeros_like(a) for a in x], jnp.asarray(0, jnp.int32))

    def run(n):
        nonlocal carry
        carry, losses = run_chunk(carry, n)
        jax.block_until_ready(losses)
        return float(np.asarray(losses)[-1])

    return run


def build_veltracer(nt, nx, ny, kernel="pallas", multigrid=True):
    import veltracer

    import odil_tpu as odil

    args = veltracer.parse_args(
        ["--Nx", str(nx), "--Nt", str(nt), "--Ny", str(ny), "--kernel", kernel]
    )
    args.Nt, args.Ny = nt, ny
    domain = odil.Domain(
        cshape=(nt, nx, ny), dimnames=("t", "x", "y"), dtype=np.float32,
        multigrid=multigrid, mg_interp="conv",
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
    op = veltracer.operator_advection_fused if kernel == "pallas" else veltracer.operator_advection
    return odil.Problem(op, domain, extra), state


def build_poisson(n, ndim=2):
    import poisson

    args = poisson.parse_args(["--N", str(n), "--ndim", str(ndim), "--ref", "hat", "--double", "0"])
    import odil_tpu as odil

    domain = odil.Domain(
        cshape=[n] * ndim, dimnames=["x", "y", "z"][:ndim], multigrid=True, dtype=np.float32
    )
    mod = domain.mod
    ref_u = poisson.reference_solution("hat", args, domain)
    rhs = poisson.discrete_rhs(ref_u, domain, mod)
    state = domain.init_state(odil.State(fields={"u": None}))
    extra = argparse.Namespace(ref_u=ref_u, rhs=mod.cast(rhs, domain.dtype), args=args)
    return odil.Problem(poisson.operator, domain, extra), state


CONFIGS = {
    "veltracer_64_xla": lambda: (build_veltracer(64, 64, 64, "xla"), 64 * 64 * 64),
    "veltracer_64_pallas": lambda: (build_veltracer(64, 64, 64, "pallas"), 64 * 64 * 64),
    "veltracer_256_xla": lambda: (build_veltracer(64, 256, 256, "xla"), 64 * 256 * 256),
    "veltracer_256_pallas": lambda: (build_veltracer(64, 256, 256, "pallas"), 64 * 256 * 256),
    "veltracer_512_pallas": lambda: (build_veltracer(64, 512, 512, "pallas"), 64 * 512 * 512),
    "poisson_256": lambda: (build_poisson(256), 256 * 256),
    "poisson_1024": lambda: (build_poisson(1024), 1024 * 1024),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="*", default=list(CONFIGS))
    parser.add_argument("--epochs", type=int, default=100)
    args = parser.parse_args()

    rows = []
    for name in args.configs:
        (problem, state), cells = CONFIGS[name]()
        run = adam_epoch_runner(problem, state)
        run(args.epochs)  # Warmup compiles the exact chunk length.
        t0 = time.perf_counter()
        loss = run(args.epochs)
        dt = time.perf_counter() - t0
        evals = args.epochs / dt
        rec = {
            "config": name,
            "evals_per_sec": round(evals, 2),
            "ms_per_epoch": round(1000 * dt / args.epochs, 3),
            "mcells_per_sec": round(cells * evals / 1e6, 1),
            "final_loss": loss,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| config | evals/s | ms/epoch | Mcells/s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['evals_per_sec']} | {r['ms_per_epoch']} | {r['mcells_per_sec']} |")


if __name__ == "__main__":
    main()
