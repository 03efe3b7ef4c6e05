# ruff: noqa: F401
from .base import EarlyStopError, Optimizer, make_optimizer
