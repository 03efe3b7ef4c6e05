"""On-device Adam: the whole epoch loop runs inside ``lax.scan``.

Update rule matches the reference AdamNative (``src/odil/optimizer.py:280-341``,
itself a replica of Keras Adam): bias-corrected step size
``alpha = lr * sqrt(1 - b2^t) / (1 - b1^t)`` with t counted from the start of
this run, and ``tracers['epoch']`` visible to the operator as epoch-1
(matching the reference's callback-driven tracer update order).

Unlike the reference, there is no host round-trip per epoch: chunks of
epochs scan on device, per-epoch (loss, terms, norms) are stacked as scan
outputs, and the host syncs only at callback epochs.
"""

from argparse import Namespace
from functools import partial

import jax
import jax.numpy as jnp

from .base import Optimizer

__all__ = ["AdamOptimizer"]


class AdamOptimizer(Optimizer):

    def __init__(self, dtype=None, mod=None, slot_dtype=None, **kwargs):
        """slot_dtype: storage dtype for the m/v moment slots (e.g.
        jnp.bfloat16 halves their HBM traffic; updates still compute in the
        parameter dtype).  Default: parameter dtype."""
        super().__init__(name="adamn", displayname="AdamNative", dtype=dtype, mod=mod)
        self.slot_dtype = slot_dtype

    def run(
        self,
        x0,
        loss_grad=None,
        epochs=None,
        callback=None,
        lr=1e-3,
        epoch_start=0,
        beta_1=0.9,
        beta_2=0.999,
        epsilon=1e-7,
        init_slots=None,
        **kwargs,
    ):
        if self.loss_fn is not None:
            return self._run_device(
                x0, epochs, callback, lr, epoch_start, beta_1, beta_2, epsilon, init_slots
            )
        return self._run_eager(x0, loss_grad, epochs, callback, lr, epoch_start, beta_1, beta_2, epsilon)

    # -- Device path: scan over epochs --------------------------------------

    def _run_device(self, x0, epochs, callback, lr, epoch_start, beta_1, beta_2, epsilon, init_slots=None):
        dtype = jnp.asarray(x0[0]).dtype
        lr = jnp.asarray(lr, dtype)
        b1 = jnp.asarray(beta_1, dtype)
        b2 = jnp.asarray(beta_2, dtype)
        loss_fn = self.loss_fn
        tracer_template = {k: v for k, v in self.tracers.items() if k != "epoch"}
        # Fused loss+grad (one Pallas pass, Problem.make_loss_grad_fn) when
        # bound; otherwise autodiff of the loss.
        grad_fn = self.loss_grad_fn or jax.value_and_grad(loss_fn, has_aux=True)
        # Bias-correction step count; continues across resumes when slots
        # carry a 'step' entry.
        step0 = int(init_slots.get("step", 0)) if init_slots else 0

        slot_dtype = self.slot_dtype or dtype

        def epoch_step(carry, _):
            x, m, v, epoch = carry
            tracers = dict(tracer_template, epoch=epoch - 1)
            (loss, (terms, norms)), grads = grad_fn(x, tracers)
            t = (epoch - epoch_start + step0).astype(dtype)
            alpha = lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)
            m = [mi.astype(dtype) + (g - mi.astype(dtype)) * (1 - b1) for mi, g in zip(m, grads)]
            v = [
                vi.astype(dtype) + (jnp.square(g) - vi.astype(dtype)) * (1 - b2)
                for vi, g in zip(v, grads)
            ]
            x = [xi - mi * alpha / (jnp.sqrt(vi) + epsilon) for xi, mi, vi in zip(x, m, v)]
            m = [mi.astype(slot_dtype) for mi in m]
            v = [vi.astype(slot_dtype) for vi in v]
            return (x, m, v, epoch + 1), (loss, jnp.stack(terms), jnp.stack(norms))

        @partial(jax.jit, static_argnums=1)
        def run_chunk(carry, length):
            return jax.lax.scan(epoch_step, carry, None, length=length)

        x = [jnp.asarray(a) for a in x0]
        if init_slots and "m" in init_slots:
            # Resume the moment estimates (the reference restarts them cold,
            # SURVEY.md §5 "Checkpoint / resume").
            m = [jnp.asarray(a, slot_dtype) for a in init_slots["m"]]
            v = [jnp.asarray(a, slot_dtype) for a in init_slots["v"]]
        else:
            m = [jnp.zeros(a.shape, slot_dtype) for a in x]
            v = [jnp.zeros(a.shape, slot_dtype) for a in x]
        carry = (x, m, v, jnp.asarray(epoch_start + 1, jnp.int32))

        epoch = epoch_start
        for n in self._chunks(epoch_start, epochs):
            carry, stacked = run_chunk(carry, n)
            self.evals += n
            self.slots = {"m": carry[1], "v": carry[2], "step": step0 + (epoch + n - epoch_start)}
            self._emit(callback, carry[0], epoch, stacked, n)
            epoch += n

        optinfo = Namespace(epochs=epochs, evals=self.evals)
        return carry[0], optinfo

    # -- Eager fallback (reference-style loop over a user loss_grad) --------

    def _run_eager(self, x0, loss_grad, epochs, callback, lr, epoch_start, beta_1, beta_2, epsilon):
        dtype = jnp.asarray(x0[0]).dtype
        lr = jnp.asarray(lr, dtype)
        b1 = jnp.asarray(beta_1, dtype)
        b2 = jnp.asarray(beta_2, dtype)

        @jax.jit
        def step(x, m, v, grads, t):
            t = t.astype(dtype)
            alpha = lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)
            m = [mi + (g - mi) * (1 - b1) for mi, g in zip(m, grads)]
            v = [vi + (jnp.square(g) - vi) * (1 - b2) for vi, g in zip(v, grads)]
            x = [xi - mi * alpha / (jnp.sqrt(vi) + epsilon) for xi, mi, vi in zip(x, m, v)]
            return x, m, v

        x = [jnp.asarray(a) for a in x0]
        m = [jnp.zeros_like(a) for a in x]
        v = [jnp.zeros_like(a) for a in x]
        for epoch in range(epoch_start + 1, epoch_start + epochs + 1):
            self.evals += 1
            loss, grads, pinfo = loss_grad(x)
            x, m, v = step(x, m, v, grads, jnp.asarray(epoch - epoch_start))
            if callback is not None:
                callback(x, epoch, pinfo)
        optinfo = Namespace(epochs=epochs, evals=self.evals)
        return x, optinfo
