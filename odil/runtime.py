"""Alias: ``odil.runtime`` IS ``odil_tpu.runtime`` (reference scripts do
``from odil.runtime import tf``, which needs a real submodule entry)."""

import sys

from odil_tpu import runtime as _runtime

sys.modules[__name__] = _runtime
