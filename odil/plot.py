"""Alias: ``odil.plot`` IS ``odil_tpu.plot`` (kept as a real submodule so
``from odil.plot import plot_1d`` works; the import stays lazy until a
script actually pulls plotting in)."""

import sys

from odil_tpu import plot as _plot

sys.modules[__name__] = _plot
