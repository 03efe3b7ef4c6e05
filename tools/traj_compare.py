#!/usr/bin/env python3
"""Compares a flagship train.csv against the archived reference trajectory
(docs/parity_data/ref_velt_256.csv by default): per-row loss ratios and the
worst row.  Used to gate precision experiments (BENCH_NOTES round 5).

Usage: python tools/traj_compare.py <train.csv> [ref.csv]
"""

import csv
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def main():
    ours = {int(float(r["epoch"])): float(r["loss"]) for r in read(sys.argv[1])}
    refp = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "docs", "parity_data", "ref_velt_256.csv")
    ref = {int(float(r["epoch"])): float(r["loss"]) for r in read(refp)}
    shared = sorted(set(ours) & set(ref))
    worst = (0.0, None)
    for e in shared:
        dev = abs(ours[e] - ref[e]) / abs(ref[e])
        if dev > worst[0]:
            worst = (dev, e)
    print(f"rows compared: {len(shared)}")
    print(f"final: ours {ours[shared[-1]]:.6g} vs ref {ref[shared[-1]]:.6g} "
          f"({abs(ours[shared[-1]] - ref[shared[-1]]) / abs(ref[shared[-1]]) * 100:.2f}%)")
    print(f"worst row: epoch {worst[1]}, {worst[0] * 100:.2f}%")
    bad = [e for e in shared if abs(ours[e] - ref[e]) / abs(ref[e]) > 0.10]
    print(f"rows beyond the 10% archive gate: {bad if bad else 'none'}")


if __name__ == "__main__":
    main()
