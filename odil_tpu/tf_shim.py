"""Minimal TensorFlow-eager shim for reference example scripts.

The reference framework runs on a TensorFlow backend by default, and a
few of its example scripts use small host-side TF idioms outside the
framework proper — e.g. ``wave.py`` builds its exact solution with
``tf.Variable`` + ``tf.GradientTape`` (reference
``examples/wave/wave.py:13-26``) and ``heat.py`` decorates a plotting
helper with ``@tf.function()`` (``examples/heat/heat.py:282``).  This
framework's compute backend is JAX-only, but to let those scripts run
verbatim through the bundled ``odil`` alias, ``runtime.tf`` resolves to
real TensorFlow when it is installed and to this shim otherwise.

The shim implements exactly the eager-autodiff subset those scripts
touch, backed by torch (eager reverse-mode, so TF's taped-gradient
semantics map directly).  It is NOT a TensorFlow implementation and is
not used anywhere on the framework's compute path.
"""

import numpy as np

__all__ = ["Variable", "GradientTape", "constant", "zeros_like", "cos", "sin", "exp", "function"]


def _torch():
    import torch

    return torch


class Tensor:
    """Wraps a torch tensor with the TF-eager surface the scripts use."""

    def __init__(self, t):
        self._t = t

    def numpy(self):
        return self._t.detach().cpu().numpy()

    @property
    def shape(self):
        return tuple(self._t.shape)

    @property
    def dtype(self):
        return self._t.dtype

    def __repr__(self):
        return f"tf_shim.Tensor({self._t!r})"

    def _binop(self, other, fn):
        o = other._t if isinstance(other, Tensor) else other
        return Tensor(fn(self._t, o))

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b)

    def __rtruediv__(self, other):
        return self._binop(other, lambda a, b: b / a)

    def __pow__(self, other):
        return self._binop(other, lambda a, b: a**b)

    def __neg__(self):
        return Tensor(-self._t)


def _wrap(value, requires_grad=False):
    torch = _torch()
    if isinstance(value, Tensor):
        t = value._t.detach().clone()
    else:
        t = torch.as_tensor(np.asarray(value))
    if requires_grad:
        t = t.detach().clone().requires_grad_(True)
    return Tensor(t)


def Variable(value, dtype=None, **kwargs):
    return _wrap(value, requires_grad=True)


def constant(value, dtype=None, **kwargs):
    return _wrap(value)


def zeros_like(x):
    torch = _torch()
    if isinstance(x, Tensor):
        return Tensor(torch.zeros_like(x._t))
    return Tensor(torch.zeros_like(torch.as_tensor(np.asarray(x))))


def _unary(fn_name):
    def op(x):
        torch = _torch()
        t = x._t if isinstance(x, Tensor) else torch.as_tensor(np.asarray(x))
        return Tensor(getattr(torch, fn_name)(t))

    return op


cos = _unary("cos")
sin = _unary("sin")
exp = _unary("exp")
tanh = _unary("tanh")
sqrt = _unary("sqrt")


class GradientTape:
    """Eager tape: torch autograd records automatically, so the context
    manager is inert and ``gradient`` sums output cotangents of ones —
    TF's ``tape.gradient(u, t)`` convention."""

    def __init__(self, persistent=False, **kwargs):
        self.persistent = persistent

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def watch(self, x):
        if isinstance(x, Tensor):
            x._t.requires_grad_(True)

    def gradient(self, target, sources):
        torch = _torch()
        single = not isinstance(sources, (list, tuple))
        srcs = [sources] if single else list(sources)
        grads = torch.autograd.grad(
            target._t,
            [s._t for s in srcs],
            grad_outputs=torch.ones_like(target._t),
            retain_graph=self.persistent,
            allow_unused=True,
        )
        out = [None if g is None else Tensor(g) for g in grads]
        return out[0] if single else out


def function(func=None, **kwargs):
    """``@tf.function()`` / ``@tf.function`` no-op decorator (the JAX
    backend jits at the framework layer, not per-script)."""
    if func is not None:
        return func

    def deco(f):
        return f

    return deco
