"""Optimizer base class, registry, and the chunked device-loop scaffolding.

The reference drives every optimizer from a per-epoch Python loop with a
host round-trip per step (``src/odil/optimizer.py:331-336``).  Here the
epoch loop itself is compiled: optimizers implement a scanned device step,
and the host only sees stacked per-epoch scalars at *callback epochs*
(report/history/plot/checkpoint cadences).  The chunk planner computes how
many epochs can run on device before the next callback is due.
"""

from argparse import Namespace

import numpy as np

__all__ = ["Optimizer", "EarlyStopError", "make_optimizer", "plan_chunks"]


class EarlyStopError(Exception):
    """Raised when an optimizer converges before the epoch budget."""

    def __init__(self, msg, optinfo):
        super().__init__(msg)
        self.optinfo = optinfo


class Optimizer:

    def __init__(self, name=None, displayname=None, dtype=None, mod=None):
        self.name = name
        self.displayname = displayname if displayname is not None else name
        self.dtype = dtype
        self.mod = mod
        self.pinfo = None
        self.evals = 0
        self.slots = None  # Slot state (Adam moments, ...) for checkpoints.
        # Device-loop context, installed by util.optimize_grad via bind().
        self.loss_fn = None  # Pure (arrays, tracers) -> (loss, (terms, norms)).
        self.loss_grad_fn = None  # Optional fused loss+grad (see bind()).
        self.tracers = None  # Tracer template; 'epoch' is overridden in-loop.
        self.task_epochs = None  # Sorted epochs at which the callback must run.

    def bind(self, loss_fn, tracers=None, task_epochs=None, names=None, max_chunk=512, loss_grad_fn=None):
        """Installs the pure device loss function and the callback schedule.

        loss_grad_fn: optional fused (arrays, tracers) ->
        ((loss, (terms, norms)), grads) -- same signature as
        jax.value_and_grad(loss_fn, has_aux=True) but computed in one pass
        (Problem.make_loss_grad_fn); gradient optimizers use it when set."""
        self.loss_fn = loss_fn
        self.loss_grad_fn = loss_grad_fn
        self.tracers = dict(tracers) if tracers else dict()
        self.task_epochs = task_epochs
        self._task_set = set(task_epochs) if task_epochs is not None else None
        self._names = names
        self._max_chunk = max_chunk
        return self

    def run(self, x0, loss_grad=None, epochs=None, callback=None, epoch_start=0, **kwargs):
        optinfo = Namespace()
        optinfo.evals = 0
        optinfo.epochs = 0
        return x0, optinfo

    # -- Shared helpers -----------------------------------------------------

    def _chunks(self, epoch_start, epochs, max_chunk=None):
        if max_chunk is None:
            max_chunk = getattr(self, "_max_chunk", 512)
        return plan_chunks(epoch_start, epochs, self.task_epochs, max_chunk)

    def _emit(self, callback, arrays, epoch_lo, stacked, nsteps):
        """Feeds the callback for each task epoch inside a finished chunk.

        stacked: (losses, terms, norms) device arrays of shape (nsteps, ...).
        Only the final epoch of a chunk is a task epoch by construction, so
        the state `arrays` is exact for it; intermediate epochs have no
        callback work."""
        if callback is None:
            return
        epoch = epoch_lo + nsteps
        if self._task_set is not None and epoch not in self._task_set:
            return
        losses, terms, norms = stacked
        j = nsteps - 1
        pinfo = {
            "loss": np.asarray(losses[j]),
            "terms": list(np.asarray(terms)[j]),
            "norms": list(np.asarray(norms)[j]),
            "names": self._names,
        }
        self.pinfo = pinfo
        callback(arrays, epoch, pinfo)


def plan_chunks(epoch_start, epochs, task_epochs, max_chunk=512):
    """Yields chunk lengths so that every task epoch ends a chunk.

    task_epochs: sorted iterable of absolute epochs in
    (epoch_start, epoch_start + epochs] needing a callback; None means every
    epoch is a task epoch (chunk size 1)."""
    end = epoch_start + epochs
    e = epoch_start
    if task_epochs is None:
        while e < end:
            yield 1
            e += 1
        return
    tasks = [t for t in task_epochs if epoch_start < t <= end]
    for t in tasks:
        while e < t:
            n = min(t - e, max_chunk)
            yield n
            e += n
    while e < end:
        n = min(end - e, max_chunk)
        yield n
        e += n


def make_optimizer(name, dtype=None, mod=None, **kwargs):
    from .adam import AdamOptimizer
    from .gd import GdOptimizer
    from .lbfgs import LbfgsOptimizer
    from .lbfgsb import LbfgsbOptimizer

    if name == "lbfgsb":
        return LbfgsbOptimizer(dtype=dtype, mod=mod, **kwargs)
    if name == "lbfgs":
        return LbfgsOptimizer(dtype=dtype, mod=mod, **kwargs)
    if name in ("adam", "adamn", "adam_tf"):
        # 'adam_tf' (the reference's Keras wrapper) maps to the native
        # device-resident Adam -- same update rule, no Keras dependency.
        return AdamOptimizer(dtype=dtype, mod=mod, **kwargs)
    if name == "gd":
        return GdOptimizer(dtype=dtype, mod=mod, **kwargs)
    raise ValueError(f"Unknown optimizer '{name}'")
