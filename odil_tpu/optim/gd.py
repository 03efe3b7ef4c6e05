"""Plain gradient descent, device-resident (counterpart of reference
``GdOptimizer``, ``src/odil/optimizer.py:256-277``)."""

from argparse import Namespace
from functools import partial

import jax
import jax.numpy as jnp

from .base import Optimizer

__all__ = ["GdOptimizer"]


class GdOptimizer(Optimizer):

    def __init__(self, dtype=None, mod=None, **kwargs):
        super().__init__(name="gd", displayname="GD", dtype=dtype, mod=mod)

    def run(self, x0, loss_grad=None, epochs=None, callback=None, lr=1e-3, epoch_start=0, **kwargs):
        if self.loss_fn is None:
            x = [jnp.array(a) for a in x0]
            for epoch in range(epoch_start + 1, epoch_start + epochs + 1):
                self.evals += 1
                loss, grads, pinfo = loss_grad(x)
                x = [xi - g * lr for xi, g in zip(x, grads)]
                if callback is not None:
                    callback(x, epoch, pinfo)
            return x, Namespace(epochs=epochs, evals=self.evals)

        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        tracer_template = {k: v for k, v in self.tracers.items() if k != "epoch"}

        def epoch_step(carry, _):
            x, epoch = carry
            tracers = dict(tracer_template, epoch=epoch - 1)
            (loss, (terms, norms)), grads = grad_fn(x, tracers)
            x = [xi - g * lr for xi, g in zip(x, grads)]
            return (x, epoch + 1), (loss, jnp.stack(terms), jnp.stack(norms))

        @partial(jax.jit, static_argnums=1)
        def run_chunk(carry, length):
            return jax.lax.scan(epoch_step, carry, None, length=length)

        carry = ([jnp.asarray(a) for a in x0], jnp.asarray(epoch_start + 1, jnp.int32))
        epoch = epoch_start
        for n in self._chunks(epoch_start, epochs):
            carry, stacked = run_chunk(carry, n)
            self.evals += n
            self._emit(callback, carry[0], epoch, stacked, n)
            epoch += n
        return carry[0], Namespace(epochs=epochs, evals=self.evals)
