#!/usr/bin/env python3
"""Error-vs-epoch convergence figure from a poisson run's train.csv.

Counterpart of the reference's per-example helper
(``examples/poisson/plot_train.py``); reads the CSV written by the
callback engine and renders a log-log error curve.
"""

import argparse
import os
import sys

import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
from odil_tpu import plotutil  # noqa: E402

plotutil.set_extlist(["png"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="out_poisson/train.csv")
    parser.add_argument("--out", type=str, default="out_poisson/train")
    parser.add_argument("--column", type=str, default="error_u")
    args = parser.parse_args()

    table = np.genfromtxt(args.data, delimiter=",", names=True)
    err = table[args.column]
    fig, ax = plt.subplots(figsize=(1.5, 1.3))
    ax.plot(table["epoch"] + 1, err, label="ODIL", c="C1")
    ax.set_xlabel("epoch")
    ax.set_xscale("log")
    ax.set_ylabel("error")
    ax.set_yscale("log")
    vmin = -3 if np.nanmin(err) < 1e-2 else -2
    ax.set_ylim(10.0**vmin, 10)
    plotutil.set_log_ticks(ax.yaxis)
    plotutil.savefig(fig, args.out)


if __name__ == "__main__":
    main()
