#!/usr/bin/env python3
"""Plots training curves (loss, residual norms, errors) from train.csv files.

Usage: python tools/plot_train.py out_dir [out_dir2 ...] [--out train.png]
Each directory must contain a train.csv written by the callback engine.
"""

import argparse
import csv
import os


def load_csv(path):
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        cols = {h: [] for h in header}
        for row in reader:
            for h, v in zip(header, row):
                try:
                    cols[h].append(float(v))
                except ValueError:
                    cols[h].append(float("nan"))
    return cols


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dirs", nargs="+", help="Output directories with train.csv")
    parser.add_argument("--out", default="train.png")
    parser.add_argument("--keys", nargs="*", default=None, help="Columns to plot (default: loss + error_*)")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = {d: load_csv(os.path.join(d, "train.csv")) for d in args.dirs}
    keys = args.keys
    if keys is None:
        keys = sorted({k for cols in runs.values() for k in cols if k == "loss" or k.startswith("error_")})

    fig, axes = plt.subplots(1, len(keys), figsize=(3.2 * len(keys), 2.6), squeeze=False)
    for ax, key in zip(axes[0], keys):
        for d, cols in runs.items():
            if key in cols:
                ax.plot(cols["epoch"], cols[key], label=os.path.basename(d.rstrip("/")))
        ax.set_yscale("log")
        ax.set_xlabel("epoch")
        ax.set_ylabel(key)
    axes[0][0].legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(args.out, dpi=200)
    print(args.out)


if __name__ == "__main__":
    main()
