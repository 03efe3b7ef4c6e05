"""Compatibility facade matching the reference's ``odil.core`` module layout.

The implementation lives in focused modules (grid, fields, context, problem,
transfer, nn, stencil, checkpoint); this module re-exports their public names
so scripts written against the reference (``import odil; odil.core.X``) keep
working unchanged.
"""

# ruff: noqa: F401

from .checkpoint import checkpoint_load, checkpoint_save
from .context import Context
from .fields import Array, Field, MultigridField, NeuralNet, State
from .grid import Domain, check_multigrid_cshapes, latin_hypercube
from .nn import eval_neural_net, make_neural_net
from .problem import Problem
from .stencil import Approx, extrap_linear, extrap_quad, extrap_quadh, struct_to_numpy
from .transfer import interp_to_finer, restrict_to_coarser
