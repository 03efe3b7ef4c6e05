"""Runtime configuration: backend, dtype, JIT, and device selection.

TPU-native counterpart of the reference runtime (``src/odil/runtime.py:1-83``).
Differences by design:

- JAX is the only compute backend (the reference prefers TensorFlow and
  forces single-threaded CPU execution unless ``ODIL_MT=1``); here we never
  restrict parallelism -- XLA owns the machine.
- JIT defaults to **on** (``ODIL_JIT=0`` to disable); the reference defaults
  to off (``src/odil/runtime.py:25``).
- ``jax_enable_x64`` is only switched on when float64 is actually requested,
  since fp64 is emulated on TPU.

Environment variables (kept compatible with the reference):

- ``ODIL_BACKEND``: ``jax`` (default) or ``numpy`` (host-only mode for
  post-processing without a device runtime).
- ``ODIL_DTYPE``: ``float32`` (default) or ``float64``.
- ``ODIL_JIT``: enable jit compilation (default 1).
- ``ODIL_WARN``: keep warnings (default 0 silences them).
- ``ODIL_MATMUL_PRECISION``: JAX matmul precision (default ``highest``).
  The TPU MXU's native pass rounds fp32 matmul INPUTS to bfloat16; at the
  default JAX setting that silently floors converged accuracy -- the
  flagship 256^2 trajectory plateaus 54% above the reference's final loss
  through the multigrid prolongation matmuls alone (round-4 measurement,
  BENCH_NOTES.md "matmul precision").  The reference computes fp32-exact
  (CPU); matching its convergence is the framework contract, so full
  precision is the default and speed is the opt-out
  (``ODIL_MATMUL_PRECISION=default`` restores the raw-MXU mode).
"""

import os
import sys

import numpy as np

__all__ = [
    "mod",
    "dtype",
    "dtype_name",
    "backend_name",
    "enable_jit",
    "enable_gpu",
    "jax",
    "tf",
    "ensure_x64",
    "set_dtype",
]

if not int(os.environ.get("ODIL_WARN", 0)):
    import warnings

    warnings.simplefilter(action="ignore", category=FutureWarning)

enable_jit = bool(int(os.environ.get("ODIL_JIT", 1)))

backend_name = os.environ.get("ODIL_BACKEND", "") or "jax"

# Kept for compatibility with scripts that check `runtime.enable_gpu`.
enable_gpu = os.environ.get("CUDA_VISIBLE_DEVICES", "") not in ["", "-1"]

# The TensorFlow BACKEND is intentionally not supported (JAX is the only
# compute backend), but reference example scripts use small host-side TF
# idioms (``from odil.runtime import tf`` for tape gradients / a
# @tf.function decorator).  ``runtime.tf`` resolves LAZILY (PEP 562 —
# importing TensorFlow costs ~10 s, far too much for every framework
# import) to real TensorFlow when installed, else to the eager shim that
# covers exactly that script surface (tf_shim.py).
def __getattr__(name):
    if name == "tf":
        try:
            import tensorflow as _tf
        except ImportError:
            from . import tf_shim as _tf
        globals()["tf"] = _tf
        return _tf
    raise AttributeError(f"module 'odil_tpu.runtime' has no attribute '{name}'")

dtype_name = os.environ.get("ODIL_DTYPE", "float32")
if dtype_name not in ("float32", "float64"):
    sys.stderr.write(f"Expected ODIL_DTYPE=float32 or float64, got '{dtype_name}'\n")
    sys.exit(1)

matmul_precision = os.environ.get("ODIL_MATMUL_PRECISION", "highest")

if backend_name == "jax":
    import jax

    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)

    if matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", matmul_precision)

    # Persistent compilation cache: TPU compiles of the scanned training
    # loops take minutes; cache them across processes.  TPU-only (CPU AOT
    # entries are machine-feature-sensitive).  Disable with
    # ODIL_COMPILE_CACHE=''.  The platform test reads the CONFIGURED
    # platform string, never jax.default_backend(): probing the backend
    # at import would initialize XLA and break any later
    # jax.distributed.initialize() (multi-host processes import odil
    # first, then connect).  Auto-detected platforms (JAX_PLATFORMS
    # unset) skip the cache setup.
    _cache_dir = os.environ.get("ODIL_COMPILE_CACHE", os.path.expanduser("~/.cache/odil_tpu_xla"))
    if _cache_dir:
        try:
            _plats = str(
                getattr(jax.config, "jax_platforms", None)
                or os.environ.get("JAX_PLATFORMS", "")
                or ""
            ).lower()
            if "tpu" in _plats or "axon" in _plats:
                os.makedirs(_cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", _cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass

    from .backend import ModJax

    mod = ModJax()
elif backend_name == "numpy":
    jax = None
    from .backend import ModNumpy

    mod = ModNumpy()
else:
    sys.stderr.write(f"Unknown ODIL_BACKEND='{backend_name}', options are: jax, numpy\n")
    sys.exit(1)

dtype = np.dtype(dtype_name)


def ensure_x64():
    """Enables 64-bit support in JAX if not already active.

    Safe to call at any point; arrays created before the switch keep their
    dtype.  Called by ``Domain`` when a float64 grid is requested.
    """
    if jax is not None and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)


def set_dtype(name):
    """Sets the global default dtype ('float32' or 'float64')."""
    global dtype, dtype_name
    assert name in ("float32", "float64"), name
    dtype_name = name
    dtype = np.dtype(name)
    if name == "float64":
        ensure_x64()
