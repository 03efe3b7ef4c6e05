#!/usr/bin/env python3
"""Plots a scalar field from an XDMF2+RAW dump (as written by
odil_tpu.io.write_raw_with_xmf / the poisson example's --dump_xmf).

Usage: python tools/plot_field.py field.xdmf2 [--out field.png] [--cmap viridis]
3D fields are shown as the middle slice along the first axis.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from odil_tpu.io import read_raw_with_xmf  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("xmf", help="Path to .xdmf2 / .xmf metadata file")
    parser.add_argument("--out", default=None, help="Output image (default: <xmf>.png)")
    parser.add_argument("--cmap", default="viridis")
    parser.add_argument("--slice", type=int, default=None, help="Slice index along axis 0 for 3D data")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    u, meta = read_raw_with_xmf(args.xmf)
    u = u.squeeze()
    if u.ndim == 3:
        k = args.slice if args.slice is not None else u.shape[0] // 2
        u = u[k]
    fig, ax = plt.subplots()
    im = ax.imshow(u, origin="lower", cmap=args.cmap)
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_title(meta.get("name", ""))
    out = args.out or os.path.splitext(args.xmf)[0] + ".png"
    fig.savefig(out, dpi=200, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
