#!/usr/bin/env python3
"""Error-vs-epoch figure for heat runs (error_u and, when inferring
conductivity, error_k).  Counterpart of the reference's
``examples/heat/plot_train.py``."""

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
    parser.add_argument("--data", type=str, default="out_heat/train.csv")
    parser.add_argument("--out", type=str, default="out_heat/train")
    args = parser.parse_args()

    table = np.genfromtxt(args.data, delimiter=",", names=True)
    fig, ax = plt.subplots(figsize=(1.7, 1.4))
    ax.plot(table["epoch"] + 1, table["error_u"], label="$u$", c="C0")
    if "error_k" in (table.dtype.names or ()):
        ax.plot(table["epoch"] + 1, table["error_k"], label="$k$", c="C1")
    ax.set_xlabel("epoch")
    ax.set_xscale("log")
    ax.set_ylabel("error")
    ax.set_yscale("log")
    plotutil.set_log_ticks(ax.yaxis)
    ax.legend(frameon=False, fontsize=7)
    plotutil.savefig(fig, args.out)


if __name__ == "__main__":
    main()
