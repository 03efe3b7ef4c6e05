"""Drop-in alias: ``import odil`` resolves to the TPU-native odil_tpu.

Lets scripts written against the reference cselab/odil run unchanged.
"""

# ruff: noqa: F401, F403
import sys

import odil_tpu
from odil_tpu import *
from odil_tpu import (
    backend,
    cache,
    core,
    core_min,
    history,
    io,
    linsolver,
    optim,
    parallel,
    util,
)
from odil_tpu.optim import base as optimizer  # reference module name alias

__version__ = odil_tpu.__version__

_ALIASED = ["runtime", "plot", "plotutil", "newton"]


def __getattr__(name):
    if name in _ALIASED:
        value = getattr(odil_tpu, name)
        sys.modules[__name__ + "." + name] = value
        return value
    raise AttributeError(f"module 'odil' has no attribute '{name}'")


# Register known submodules so `from odil import X` and `odil.X.Y` both work.
for _name in ["backend", "cache", "core", "core_min", "history", "io", "linsolver", "util"]:
    sys.modules[__name__ + "." + _name] = getattr(odil_tpu, _name)
