#!/usr/bin/env python3
"""Measures the RNG-seed spread of the converged-lane finals (VERDICT r3
item 5): runs the heat-inverse and poisson canonical configurations at N
seeds on the CPU (the converged lane's environment) and prints min/max/
ratio for every gated column, so tests/test_converged.py margins can be
set to measured-spread + headroom instead of a one-off comparison.

Run:  python benchmarks/seed_spread.py [--seeds 5] [--case heat_inverse]
Writes a summary table to stdout; paste into docs/parity_data/README.md.
"""

import argparse
import csv
import importlib
import os
import sys
import tempfile

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

CASES = {
    "heat_inverse": (
        "heat",
        "heat",
        ["--Nt", "64", "--Nx", "64", "--epochs", "1500", "--history_every",
         "100", "--infer_k", "1", "--imposed", "stripe"],
        ["loss", "error_u", "error_k"],
    ),
    "poisson": (
        "poisson",
        "poisson",
        ["--N", "64", "--ref", "osc", "--rhs", "exact", "--double", "1",
         "--epochs", "1000", "--history_every", "50"],
        ["loss", "error_u"],
    ),
}


def run_case(subdir, module_name, argv):
    path = os.path.join(ROOT, "examples", subdir)
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        module = importlib.import_module(module_name)
        out = tempfile.mkdtemp()
        module.main(argv + ["--plot_every", "0", "--outdir", out])
        with open(os.path.join(out, "train.csv")) as f:
            return list(csv.DictReader(f))
    finally:
        os.chdir(cwd)
        sys.path.remove(path)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--case", choices=list(CASES), default=None)
    args = parser.parse_args()

    names = [args.case] if args.case else list(CASES)
    for name in names:
        subdir, module_name, argv, cols = CASES[name]
        finals = {c: [] for c in cols}
        lastrows = {c: [] for c in cols}
        for seed in range(args.seeds):
            rows = run_case(subdir, module_name, argv + ["--seed", str(seed)])
            for c in cols:
                # Mirror the lane's min-of-last-3 oscillation handling.
                finals[c].append(min(abs(float(r[c])) for r in rows[-3:]))
                lastrows[c].append(abs(float(rows[-1][c])))
            print(f"{name} seed={seed}: "
                  + "  ".join(f"{c}={finals[c][-1]:.6g}" for c in cols),
                  flush=True)
        print(f"\n== {name} spread over {args.seeds} seeds "
              f"(min-of-last-3 rows, the lane's statistic) ==")
        for c in cols:
            v = np.array(finals[c])
            raw = np.array(lastrows[c])
            print(f"  {c:10s} min={v.min():.6g} max={v.max():.6g} "
                  f"max/min={v.max() / max(v.min(), 1e-300):.3f}   "
                  f"(last-row-only max/min={raw.max() / max(raw.min(), 1e-300):.3f})",
              flush=True)
        print()


if __name__ == "__main__":
    main()
