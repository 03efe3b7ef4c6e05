# ruff: noqa: F401
from .rowwise import rowwise_loss_sums, rowwise_loss_terms, rowwise_sumsq
