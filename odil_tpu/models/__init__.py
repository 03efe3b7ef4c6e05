"""Model families: reusable problem builders for the PDE workloads.

Each module exposes the discrete operator(s) and a ``build(...)`` function
returning ``(problem, state, extra)``.  The example CLIs under
``examples/`` are thin wrappers over these; users can also embed a model
directly:

    from odil_tpu.models import veltracer
    problem, state, extra = veltracer.build(nt=64, nx=256, ny=256)
"""

# ruff: noqa: F401
from . import advection, heat, poisson, veltracer, wave
