"""On-device L-BFGS with strong-Wolfe zoom line search.

Replaces the reference's host-side scipy L-BFGS-B loop
(``src/odil/optimizer.py:29-117``), which round-trips the full state through
float64 numpy every iteration -- the single most TPU-hostile pattern in the
reference (SURVEY.md §3.2).  Here the two-loop recursion, the line search,
and the history buffer all live on device (built on ``optax.lbfgs``), and
iterations run in scanned chunks like Adam.

Convergence semantics follow scipy's: if the projected-gradient inf-norm
drops below ``pgtol`` before the epoch budget, an ``EarlyStopError`` carrying
optinfo is raised (callers catch it, see reference ``tests/test_optimize.py:100``).
"""

from argparse import Namespace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import EarlyStopError, Optimizer

__all__ = ["LbfgsOptimizer"]


class LbfgsOptimizer(Optimizer):

    def __init__(self, pgtol=1e-16, m=50, maxls=50, factr=0, dtype=None, mod=None, **kwargs):
        super().__init__(name="lbfgs", displayname="L-BFGS", dtype=dtype, mod=mod)
        self.pgtol = pgtol if pgtol is not None else 1e-16
        self.m = m
        self.maxls = maxls

    def run(self, x0, loss_grad=None, epochs=None, callback=None, epoch_start=0, **kwargs):
        if self.loss_fn is None:
            raise RuntimeError(
                "LbfgsOptimizer requires a bound device loss function; "
                "use util.optimize_grad or call .bind(loss_fn, ...)"
            )
        loss_fn = self.loss_fn
        tracer_template = {k: v for k, v in self.tracers.items() if k != "epoch"}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        opt = optax.lbfgs(
            memory_size=self.m,
            linesearch=optax.scale_by_zoom_linesearch(
                max_linesearch_steps=self.maxls, initial_guess_strategy="one"
            ),
        )

        def iter_step(carry, _):
            x, opt_state, epoch = carry
            tracers = dict(tracer_template, epoch=epoch - 1)
            (loss, (terms, norms)), grads = grad_fn(x, tracers)
            value_fn = lambda p: loss_fn(p, tracers)[0]  # noqa: E731
            updates, opt_state = opt.update(
                grads, opt_state, x, value=loss, grad=grads, value_fn=value_fn
            )
            x = optax.apply_updates(x, updates)
            gmax = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in grads]))
            return (x, opt_state, epoch + 1), (loss, jnp.stack(terms), jnp.stack(norms), gmax)

        @partial(jax.jit, static_argnums=1)
        def run_chunk(carry, length):
            return jax.lax.scan(iter_step, carry, None, length=length)

        x = [jnp.asarray(a) for a in x0]
        carry = (x, opt.init(x), jnp.asarray(epoch_start + 1, jnp.int32))

        epoch = epoch_start
        for n in self._chunks(epoch_start, epochs):
            carry, stacked = run_chunk(carry, n)
            self.evals += n
            self._emit(callback, carry[0], epoch, stacked[:3], n)
            epoch += n
            gmax = float(np.asarray(stacked[3][-1]))
            if gmax < self.pgtol:
                optinfo = Namespace(
                    warnflag=0,
                    task=f"CONVERGED: max|grad|={gmax:.3e} < pgtol={self.pgtol:.3e}",
                    evals=self.evals,
                    epochs=epoch - epoch_start,
                    x=carry[0],
                )
                raise EarlyStopError(optinfo.task, optinfo)

        optinfo = Namespace(epochs=epochs, evals=self.evals)
        return carry[0], optinfo
