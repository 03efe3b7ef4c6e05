#!/usr/bin/env python3
"""Benchmark campaign: epochs/s across workloads and sizes on the current
device.  Produces one JSON line per configuration and a markdown table.

Usage: python benchmarks/run_benchmarks.py [--configs NAME ...] [--epochs N]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
    from odil_tpu.models import veltracer as vtm

    problem, state, extra = vtm.build(
        nt=nt, nx=nx, ny=ny, kernel=kernel, multigrid=multigrid,
        mg_interp="conv", dtype=np.float32,
    )
    return problem, state


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


def lbfgs_epoch_runner(problem, state, lr=1.0):
    """Returns run(n) executing n device-resident L-BFGS iterations."""
    import jax.numpy as jnp

    from odil_tpu.optim.lbfgs import LbfgsOptimizer

    loss_fn, arrays = problem.make_loss_fn(state)
    opt = LbfgsOptimizer(dtype=problem.domain.dtype)
    opt.bind(loss_fn, tracers=problem.tracers, task_epochs=None, names=[""])
    x = [jnp.asarray(a) for a in arrays]

    def run(n):
        nonlocal x
        x, info = opt.run(x, epochs=n, lr=lr)
        loss, *_ = loss_fn(x, {"epoch": n})
        return float(loss)

    return run


def gn_step_runner(problem, state, linsolver="vcycle", maxiter=100):
    """Returns run(n) executing n matrix-free Gauss-Newton steps (CG with
    the requested multilevel preconditioner; setup excluded from timing)."""
    import jax

    from odil_tpu import newton

    f, x0 = problem.residual_fn(state)
    r0, pb = jax.vjp(f, x0)

    def nm(v):
        return pb(jax.jvp(f, (x0,), (v,))[1])[0]

    key = jax.random.PRNGKey(0)
    maker = (
        newton.make_vcycle_preconditioner
        if linsolver == "vcycle"
        else newton.make_bpx_preconditioner
    )
    M = maker(problem.domain, state, nm, x0, key)
    step = jax.jit(
        lambda x: newton.gauss_newton_step(f, x, tol=1e-12, maxiter=maxiter, precond=M)
    )
    xs = [x0]

    def run(n):
        import jax.numpy as jnp

        x = xs[0]
        for _ in range(n):
            x, info = step(x)
        x.block_until_ready()
        xs[0] = x
        return float(jnp.mean(jnp.square(f(x))))

    return run


def build_poisson_gn(n):
    from odil_tpu import runtime
    from odil_tpu.models import poisson as pmodel

    runtime.ensure_x64()
    problem, state, extra = pmodel.build(
        n=n, ndim=2, ref="osc", rhs="exact", dtype=np.float64, multigrid=False
    )
    return problem, state


CONFIGS = {
    "veltracer_64_xla": lambda: (build_veltracer(64, 64, 64, "xla"), 64 * 64 * 64),
    "veltracer_64_pallas": lambda: (build_veltracer(64, 64, 64, "pallas"), 64 * 64 * 64),
    "veltracer_256_xla": lambda: (build_veltracer(64, 256, 256, "xla"), 64 * 256 * 256),
    "veltracer_256_pallas": lambda: (build_veltracer(64, 256, 256, "pallas"), 64 * 256 * 256),
    "veltracer_256_pallas_mg": lambda: (build_veltracer(64, 256, 256, "pallas_mg"), 64 * 256 * 256),
    "veltracer_512_pallas": lambda: (build_veltracer(64, 512, 512, "pallas"), 64 * 512 * 512),
    "poisson_256": lambda: (build_poisson(256), 256 * 256),
    "poisson_1024": lambda: (build_poisson(1024), 1024 * 1024),
}

# Per-iteration timings of the second-order and quasi-Newton paths
# (ROADMAP item 8).  "epochs" = GN steps / L-BFGS iterations here; use
# --epochs 3 or so for the GN rows.
SPECIAL_CONFIGS = {
    "poisson_gn_vcycle_128": lambda: (build_poisson_gn(128), 128 * 128, "gn_vcycle"),
    "poisson_gn_bpx_128": lambda: (build_poisson_gn(128), 128 * 128, "gn_bpx"),
    "veltracer_64_lbfgs": lambda: (build_veltracer(64, 64, 64, "pallas"), 64 * 64 * 64, "lbfgs"),
}
CONFIGS.update({k: v for k, v in SPECIAL_CONFIGS.items()})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="*", default=list(CONFIGS))
    parser.add_argument(
        "--epochs", type=int, default=None,
        help="iterations per config (default: 100; 3 for the GN configs "
        "-- their linear test problem reaches machine precision in one "
        "step, and iterating CG on the ~zero residual afterwards "
        "degenerates to NaN)",
    )
    parser.add_argument(
        "--platform",
        default="default",
        choices=["default", "cpu"],
        help="cpu forces the host platform (the JAX_PLATFORMS env var may "
        "be pinned by the environment; this uses jax.config instead)",
    )
    parser.add_argument(
        "--no-isolate", action="store_true",
        help="run all configs in THIS process (the default spawns one "
        "subprocess per config: the GN configs enable jax_enable_x64, "
        "which leaks into later configs in the same process -- measured "
        "to break the fp32 kernel configs with a Mosaic conversion "
        "RecursionError)",
    )
    args = parser.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if not args.no_isolate and len(args.configs) > 1:
        import subprocess

        rows = []
        for name in args.configs:
            cmd = [sys.executable, os.path.abspath(__file__), "--no-isolate",
                   "--configs", name, "--platform", args.platform]
            if args.epochs is not None:
                cmd += ["--epochs", str(args.epochs)]
            proc = subprocess.run(
                cmd,
                capture_output=True, text=True, cwd=ROOT,
            )
            ok = False
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
                    rows.append(rec)
                    print(json.dumps(rec), flush=True)
                    ok = True
            if not ok:
                print(json.dumps({"config": name, "error":
                                  proc.stderr.strip().splitlines()[-1][:200]
                                  if proc.stderr.strip() else "no output"}),
                      flush=True)
        print("\n| config | evals/s | ms/epoch | Mcells/s |")
        print("|---|---|---|---|")
        for r in rows:
            print(f"| {r['config']} | {r['evals_per_sec']} | "
                  f"{r['ms_per_epoch']} | {r['mcells_per_sec']} |")
        return

    rows = []
    for name in args.configs:
        out = CONFIGS[name]()
        kind = out[2] if len(out) > 2 else "adam"
        (problem, state), cells = out[0], out[1]
        if kind == "lbfgs":
            run = lbfgs_epoch_runner(problem, state)
        elif kind.startswith("gn_"):
            run = gn_step_runner(problem, state, linsolver=kind[3:])
        else:
            run = adam_epoch_runner(problem, state)
        epochs = args.epochs
        if epochs is None:
            epochs = 3 if kind.startswith("gn_") else 100
        run(epochs)  # Warmup compiles the exact chunk length.
        t0 = time.perf_counter()
        loss = run(epochs)
        dt = time.perf_counter() - t0
        evals = epochs / dt
        rec = {
            "config": name,
            "evals_per_sec": round(evals, 2),
            "ms_per_epoch": round(1000 * dt / epochs, 3),
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
