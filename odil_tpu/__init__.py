"""odil_tpu: a TPU-native framework for solving inverse and data-assimilation
problems for PDEs by optimizing a discrete loss (ODIL).

Re-implements the capabilities of cselab/odil (reference mounted read-only
during development) as an idiomatic JAX/XLA/Pallas framework: pytree states,
one fused jitted loss+gradient, on-device optimizer loops (lax.scan),
matrix-free Gauss-Newton, SPMD sharding over TPU meshes, and Pallas kernels
for the hot stencil paths.

Public API mirrors the reference's ``odil`` package so existing scripts port
with an import change (or none, via the bundled ``odil`` alias package).
"""

__version__ = "0.1.0"

# ruff: noqa: F401, E402

# Eager: applies process-level JAX config (x64, matmul precision, compile
# cache) before anything can trace.  See runtime.py.
from . import runtime
from . import cache, core, core_min, linsolver, parallel
from .backend import ModBase, ModJax, ModNumpy
from .core import (
    Array,
    Domain,
    Field,
    MultigridField,
    NeuralNet,
    Problem,
    State,
    interp_to_finer,
    restrict_to_coarser,
)
from .history import History
from .io import (
    parse_raw_xmf,
    read_raw,
    read_raw_with_xmf,
    write_raw_with_xmf,
    write_raw_xmf,
    write_vtk_poly,
)
from .optim import EarlyStopError
from .util import (
    make_callback,
    optimize,
    printlog,
    set_log_file,
    setup_outdir,
)
from . import util
from . import backend


def __getattr__(name):
    # Lazy imports for modules with heavy dependencies (matplotlib, runtime).
    if name in ("runtime", "plot", "plotutil", "newton", "models", "ops"):
        import importlib

        module = importlib.import_module("." + name, __name__)
        globals()[name] = module
        return module
    raise AttributeError(f"module 'odil_tpu' has no attribute '{name}'")
