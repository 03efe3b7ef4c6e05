"""Plotting utilities: Agg backend, house style, multi-extension savefig.

Counterpart of reference ``src/odil/plotutil.py``.  Controlled by env vars
``ODIL_AGG`` (force Agg, default on), ``ODIL_STYLE`` (apply the bundled
mplstyle), ``ODIL_EXTLIST`` (default save extensions).
"""

import logging
import os

import matplotlib
import numpy as np

if int(os.environ.get("ODIL_AGG", 1)):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402

logging.getLogger("matplotlib.font_manager").setLevel(logging.ERROR)

mplstyle = os.path.join(os.path.dirname(os.path.realpath(__file__)), "odil.mplstyle")
if int(os.environ.get("ODIL_STYLE", 1)) and os.path.isfile(mplstyle):
    matplotlib.style.use(mplstyle)

g_extlist = None


def set_extlist(extlist=None):
    global g_extlist
    if extlist is None:
        g_extlist = os.environ.get("ODIL_EXTLIST", "png").split(",")
    else:
        g_extlist = extlist


set_extlist()


def apply_clip_box(ax, artists, lower=(0, 0), upper=(1, 1.02)):
    box = matplotlib.transforms.TransformedBbox(matplotlib.transforms.Bbox([lower, upper]), ax.transAxes)
    for a in artists:
        a.set_clip_box(box)


def savefig(fig, path_without_ext, extlist=None, skip_existing=False, printf=None, **kwargs):
    """Saves `fig` once per extension, with deterministic metadata so reruns
    produce byte-identical files."""
    printf = printf or (lambda _: None)
    for ext in extlist or g_extlist:
        if ext == "svg":
            metadata = {"Date": None}
        elif ext == "pdf":
            metadata = {"DateModified": None, "CreationDate": None}
        else:
            metadata = {}
        path = path_without_ext + "." + ext
        if skip_existing and os.path.isfile(path):
            printf(f"skip existing '{path}'")
            continue
        printf(path)
        fig.savefig(path, metadata=metadata, **kwargs)


def savelegend(fig, ax, path, **kwargs):
    """Extracts the legend of `ax` into its own tightly-cropped figure."""
    figleg, axleg = plt.subplots()
    handles, labels = ax.get_legend_handles_labels()
    legend = axleg.legend(handles, labels, loc="center", frameon=False)
    axleg.set_axis_off()
    figleg.canvas.draw()
    bbox = legend.get_window_extent().transformed(fig.dpi_scale_trans.inverted())
    savefig(figleg, path, bbox_inches=bbox, **kwargs)


def set_log_ticks(xaxis):
    locmin = matplotlib.ticker.LogLocator(base=10.0, subs=np.arange(0.1, 0.99, 0.1), numticks=12)
    xaxis.set_minor_locator(locmin)
    xaxis.set_minor_formatter(matplotlib.ticker.NullFormatter())
