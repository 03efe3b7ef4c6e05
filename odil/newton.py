"""Alias: ``odil.newton`` IS ``odil_tpu.newton``."""

import sys

from odil_tpu import newton as _newton

sys.modules[__name__] = _newton
