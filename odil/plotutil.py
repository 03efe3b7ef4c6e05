"""Alias: ``odil.plotutil`` IS ``odil_tpu.plotutil``."""

import sys

from odil_tpu import plotutil as _plotutil

sys.modules[__name__] = _plotutil
