"""Matplotlib session setup and figure-export helpers.

Role counterpart of the reference's plotutil module
(``src/odil/plotutil.py``): headless-Agg selection, house stylesheet,
multi-format figure export with deterministic metadata.  The env-var knobs
(``ODIL_AGG``, ``ODIL_STYLE``, ``ODIL_EXTLIST``) and the function names are
kept so reference scripts keep working; the implementation is this
project's own.
"""

import logging
import os
import pathlib

import matplotlib
import numpy as np


def _env_flag(name, default=True):
    raw = os.environ.get(name)
    return default if raw is None else bool(int(raw))


if _env_flag("ODIL_AGG"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402  (backend must be fixed first)

logging.getLogger("matplotlib.font_manager").setLevel(logging.ERROR)

_STYLE_SHEET = pathlib.Path(__file__).with_name("odil.mplstyle")
if _env_flag("ODIL_STYLE") and _STYLE_SHEET.is_file():
    matplotlib.style.use(str(_STYLE_SHEET))

# Formats written by savefig() when the caller does not pass extlist.
_default_formats = []

# Per-format metadata overrides that strip timestamps, so identical figures
# produce byte-identical files across reruns (determinism invariant).
_TIMESTAMP_FIELDS = {
    "svg": {"Date": None},
    "pdf": {"DateModified": None, "CreationDate": None},
}


def set_extlist(extlist=None):
    """Sets the default save formats; ``None`` re-reads ``ODIL_EXTLIST``."""
    if extlist is None:
        extlist = os.environ.get("ODIL_EXTLIST", "png").split(",")
    _default_formats[:] = list(extlist)


set_extlist()


def savefig(fig, path_without_ext, extlist=None, skip_existing=False,
            printf=None, **kwargs):
    """Writes ``fig`` as ``<path_without_ext>.<ext>`` for every format.

    Timestamp metadata is stripped for svg/pdf so reruns are byte-identical.
    ``printf``, if given, is called with each path written; with
    ``skip_existing`` already-present files are left untouched.
    """
    say = printf if printf is not None else (lambda msg: None)
    formats = _default_formats if extlist is None else extlist
    for fmt in formats:
        target = f"{path_without_ext}.{fmt}"
        if skip_existing and os.path.isfile(target):
            say(f"skip existing '{target}'")
            continue
        say(target)
        fig.savefig(target, metadata=dict(_TIMESTAMP_FIELDS.get(fmt, {})),
                    **kwargs)


def savelegend(fig, ax, path, **kwargs):
    """Renders the legend of ``ax`` alone, cropped to its own extent."""
    handles, labels = ax.get_legend_handles_labels()
    holder = plt.figure()
    legend = holder.legend(handles, labels, loc="center", frameon=False)
    holder.canvas.draw()
    extent = legend.get_window_extent()
    savefig(holder, path,
            bbox_inches=extent.transformed(fig.dpi_scale_trans.inverted()),
            **kwargs)
    plt.close(holder)


def apply_clip_box(ax, artists, lower=(0, 0), upper=(1, 1.02)):
    """Clips ``artists`` to an axes-fraction rectangle.

    The default box is the axes plus a 2% allowance above the top spine, so
    markers sitting on the upper edge keep their full height.
    """
    corners = matplotlib.transforms.Bbox([list(lower), list(upper)])
    clip = matplotlib.transforms.TransformedBbox(corners, ax.transAxes)
    for artist in artists:
        artist.set_clip_box(clip)


def set_log_ticks(axis):
    """Dense unlabeled minor ticks on a log-scale axis."""
    minor = matplotlib.ticker.LogLocator(
        base=10.0, subs=np.linspace(0.1, 0.9, 9), numticks=12)
    axis.set_minor_locator(minor)
    axis.set_minor_formatter(matplotlib.ticker.NullFormatter())
