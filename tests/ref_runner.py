"""Executes an UNMODIFIED reference example script against the bundled
``odil`` alias package.

Usage: python ref_runner.py <script.py> [script args...]

The wrapper exists only to force the CPU platform before the jax backend
initializes (the sandbox's sitecustomize pins JAX_PLATFORMS to the TPU
plugin, which tests must not depend on); the script itself runs verbatim
via runpy with its own argv.
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

path = sys.argv[1]
sys.argv = [path] + sys.argv[2:]
runpy.run_path(path, run_name="__main__")
