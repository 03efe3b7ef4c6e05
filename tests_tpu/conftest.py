"""TPU-lane test environment: unlike tests/conftest.py this does NOT force
the CPU platform -- the suite runs on the attached TPU (the sandbox pins
JAX_PLATFORMS to the axon plugin) and skips itself elsewhere.

Run with:  python -m pytest tests_tpu -q     (first compile ~1-5 min cold)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Pin full-f32 matmul precision: the comparisons here are XLA-vs-Mosaic
# lowering checks, and the default (bf16-mantissa MXU passes) adds ~1e-2
# relative spread through the multigrid prolongation ladder that would
# drown real lowering bugs.
jax.config.update("jax_default_matmul_precision", "float32")
