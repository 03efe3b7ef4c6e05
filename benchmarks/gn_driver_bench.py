#!/usr/bin/env python3
"""Measures the GN driver's per-epoch cost: new path (callback fed from the
step's own residual, rebuildable preconditioner) vs the round-1 behavior
(a full eval_loss_grad per epoch for the callback).

Run on the TPU:  python benchmarks/gn_driver_bench.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import odil_tpu as odil  # noqa: E402


def run_case(name, build_fn, linsolver, epochs=10, maxiter=100, **bkw):
    from odil_tpu.models import heat as hm
    from odil_tpu.models import poisson as pm

    problem, state, extra = build_fn(**bkw)
    args = argparse.Namespace(
        epochs=epochs, epoch_start=0, seed=0,
        linsolver=linsolver, linsolver_maxiter=maxiter, linsolver_tol=1e-8,
        linsolver_damp=0, linsolver_dampdiag=0, linsolver_precond_every=0,
    )

    ncb = [0]

    def callback(state, epoch, pinfo):
        ncb[0] += 1
        assert np.isfinite(pinfo["loss"])

    # Warmup: compile (2 epochs).
    wargs = argparse.Namespace(**{**vars(args), "epochs": 2})
    odil.util.optimize(wargs, "gn", problem, state, callback)

    t0 = time.perf_counter()
    odil.util.optimize(args, "gn", problem, state, callback)
    dt_new = (time.perf_counter() - t0) / epochs

    # Round-1 callback cost: one full eval_loss_grad per epoch on top.
    problem.eval_loss_grad(state)  # compile
    t0 = time.perf_counter()
    for _ in range(epochs):
        problem.eval_loss_grad(state)
    dt_eval = (time.perf_counter() - t0) / epochs

    print(
        f"{name}: step+callback {dt_new * 1e3:.1f} ms/epoch; round-1 added a "
        f"full eval_loss_grad per epoch (+{dt_eval * 1e3:.1f} ms, "
        f"{100 * dt_eval / (dt_new + dt_eval):.0f}% of the old epoch)"
    )
    return dt_new, dt_eval


def main():
    from odil_tpu.models import heat as hm
    from odil_tpu.models import poisson as pm

    run_case(
        "poisson_gn_vcycle_128",
        lambda: pm.build(n=128, ndim=2, ref="hat", rhs="discrete",
                         dtype=np.float64, multigrid=False),
        "vcycle",
        epochs=5,
        maxiter=30,
    )
    run_case(
        "heat_gn_jacobi_64",
        lambda: hm.build(nt=64, nx=64, multigrid=False, infer_k=False,
                         dtype=np.float32),
        "cg",
        epochs=10,
        maxiter=100,
    )


if __name__ == "__main__":
    main()
