"""NumPy-convention op namespaces (`mod`) handed to user operators.

The reference exposes per-backend wrapper classes (``src/odil/backend.py:12-317``)
so that operator callbacks are written once against a NumPy-like surface.
We keep that contract -- ``ctx.mod`` quacks the same -- but the only compute
backend is ``jax.numpy``; a pure-NumPy mod exists for host-side
post-processing (plotting domains, file loading) only.

Everything here must be trace-safe: any function reachable from a user
operator is called inside ``jax.jit``.
"""

from argparse import Namespace

import numpy as np

__all__ = ["ModBase", "ModJax", "ModNumpy", "ModTensorflow", "ModCupy"]


class ModBase:
    """Common helpers shared by both mods."""

    def __init__(self, xp):
        self.xp = xp
        # Names forwarded verbatim from the array namespace.
        for name in (
            "abs",
            "arange",
            "arctan2",
            "argmax",
            "argmin",
            "broadcast_to",
            "clip",
            "concatenate",
            "cos",
            "cosh",
            "cumsum",
            "einsum",
            "exp",
            "floor",
            "full",
            "hstack",
            "linspace",
            "log",
            "matmul",
            "maximum",
            "mean",
            "median",
            "meshgrid",
            "minimum",
            "moveaxis",
            "ones",
            "ones_like",
            "pad",
            "reshape",
            "roll",
            "sin",
            "sinh",
            "sqrt",
            "square",
            "stack",
            "std",
            "sum",
            "tanh",
            "transpose",
            "where",
            "zeros",
            "zeros_like",
        ):
            setattr(self, name, getattr(xp, name))
        self.min = xp.min
        self.max = xp.max
        self.flatten = lambda x: xp.reshape(x, (-1,))
        self.relu = lambda x: xp.maximum(x, 0)
        self.sigmoid = lambda x: 1 / (1 + xp.exp(-x))
        self.norm = lambda x: xp.sqrt(xp.sum(xp.square(x)))
        self.mod = xp  # Alias kept for reference compatibility.

    def cast(self, x, dtype):
        return self.xp.asarray(x, dtype=dtype)

    def gather_nd(self, u, idx):
        idx = self.xp.moveaxis(idx, -1, 0)
        return u[tuple(idx[i] for i in range(idx.shape[0]))]

    def split_by_sizes(self, array, sizes, axis=0):
        bounds = np.cumsum(sizes)[:-1]
        return self.xp.split(array, bounds, axis=axis)


class ModJax(ModBase):
    """The TPU compute namespace, backed by ``jax.numpy``."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        super().__init__(jnp)
        self.jax = jax
        self.tf = None
        # Host sparse algebra (Newton assembly): scipy.sparse, like the
        # reference's modsp hooks (src/odil/backend.py:173-182).
        try:
            import scipy.sparse as modsp

            self.modsp = modsp
            self.csr_matrix = modsp.csr_matrix
            self.diags = modsp.diags
            self.bmat = modsp.bmat
            self.block_diag = modsp.block_diag
            self.tril = modsp.tril
            self.spnorm = modsp.linalg.norm
            self.spsolve = modsp.linalg.spsolve
        except ImportError:
            self.modsp = None

        self.array = jnp.asarray
        self.constant = jnp.asarray
        self.variable = lambda x, dtype=None: jnp.asarray(x, dtype=dtype)
        self.copy = jnp.array
        self.numpy = np.asarray
        self.native = jnp.asarray
        self.spnative = lambda x: x
        self.ndarray = jnp.ndarray
        self.stop_gradient = jax.lax.stop_gradient
        self.is_tensor = lambda x: isinstance(x, (jnp.ndarray, jax.core.Tracer))
        self.jit_wrap = lambda **kw: (lambda f: jax.jit(f, **kw))

        # Stateful PRNG with split-on-use keys, seeded via random.set_seed.
        self.random = Namespace()
        self.random._key = None

        def set_seed(seed):
            self.random._key = jax.random.PRNGKey(seed)

        def _next_key():
            if self.random._key is None:
                set_seed(np.random.default_rng().integers(1 << 31))
            self.random._key, sub = jax.random.split(self.random._key)
            return sub

        def uniform(shape, minval=0.0, maxval=1.0, dtype=None):
            return jax.random.uniform(
                _next_key(), shape=shape, minval=minval, maxval=maxval, dtype=dtype or np.float32
            )

        def normal(shape, mean=0.0, stddev=1.0, dtype=None):
            dtype = dtype or np.float32
            sample = jax.random.normal(_next_key(), shape=shape, dtype=dtype)
            return jnp.asarray(mean, dtype) + jnp.asarray(stddev, dtype) * sample

        self.random.set_seed = set_seed
        self.random.uniform = uniform
        self.random.normal = normal
        self.random.next_key = _next_key

    def convolution(self, input, filters, strides, padding):
        """N-dimensional single-channel convolution (used by transfer ops)."""
        import jax

        ndim = len(input.shape)
        if isinstance(strides, int):
            strides = (strides,) * ndim
        lhs = self.xp.reshape(input, (1, 1) + tuple(input.shape))
        rhs = self.xp.reshape(filters, (1, 1) + tuple(filters.shape))
        out = jax.lax.conv_general_dilated(lhs, rhs, window_strides=strides, padding=padding)
        return out[0, 0]

    def conv_transpose(self, input, filters, output_shape=None, strides=None, padding=None):
        import jax

        if isinstance(strides, int):
            strides = (strides,) * (len(input.shape) - 2)
        return jax.lax.conv_transpose(input, filters, strides=strides, padding=padding)


class ModNumpy(ModBase):
    """Host-only namespace for post-processing without a device runtime."""

    def __init__(self):
        super().__init__(np)
        self.jax = None
        self.tf = None
        self.modsp = None
        self.array = np.asarray
        self.constant = np.asarray
        self.variable = lambda x, dtype=None: np.asarray(x, dtype=dtype)
        self.copy = np.copy
        self.numpy = np.asarray
        self.native = np.asarray
        self.spnative = lambda x: x
        self.ndarray = np.ndarray
        self.stop_gradient = lambda x: x
        self.is_tensor = lambda x: isinstance(x, np.ndarray)
        self.jit_wrap = lambda **kw: (lambda f: f)

        self.random = Namespace()
        rng = {"rng": np.random.default_rng()}

        def set_seed(seed):
            rng["rng"] = np.random.default_rng(seed)

        self.random.set_seed = set_seed
        self.random.uniform = lambda shape, minval=0.0, maxval=1.0, dtype=None: rng["rng"].uniform(
            minval, maxval, size=shape
        ).astype(dtype or np.float64)
        self.random.normal = lambda shape, mean=0.0, stddev=1.0, dtype=None: rng["rng"].normal(
            mean, stddev, size=shape
        ).astype(dtype or np.float64)

    def convolution(self, input, filters, strides, padding):
        raise NotImplementedError("convolution requires the jax backend")

    def conv_transpose(self, *args, **kwargs):
        raise NotImplementedError("conv_transpose requires the jax backend")


# Name kept so reference scripts constructing `odil.backend.ModNumpy()` for
# host-side work keep running (`examples/heat/heat.py:428`).
ModTensorflow = None  # TensorFlow is not a supported backend in odil_tpu.
ModCupy = None  # CuPy targets CUDA; on TPU the JAX backend covers its role.
