"""Multigrid transfer operators: prolongation and restriction.

Behavioral spec from the reference (``src/odil/core.py:606-755``):

- ``interp_to_finer``: coarse -> fine.  Per axis: 'n' (node) doubles
  resolution with the [1,2,1]/2 kernel, 'c' (cell) with the [1,3,3,1]/4
  kernel after padding one ghost value by *linear extrapolation*, '.' leaves
  the axis untouched.  Exact on linear fields (reference
  ``tests/test_mg_interp.py``).
- ``restrict_to_coarser``: fine -> coarse.  Per axis: 'n' applies full
  weighting [1,2,1]/4 with linear-extrapolation ghosts (which makes the
  boundary nodes an exact identity), 'c' averages cell pairs [1,1]/2.
  Exact on linear fields even with discontinuous boundary values
  (reference ``tests/test_mg_restrict.py``).

Implementation here is deliberately different from the reference: the
tensor-product kernels are *separable*, so we apply cheap 1-D roll-free
slice arithmetic per axis instead of N-D (transposed) convolutions.  This
is exact to rounding, works for any ndim (the reference's conv path stops
at 3), and compiles to fully fused elementwise XLA ops on TPU.

Both ``method='stack'`` and ``method='conv'`` names are accepted for
compatibility and run the same separable algorithm.
"""

__all__ = ["interp_to_finer", "restrict_to_coarser"]

_METHODS = (None, "stack", "conv", "matmul")


def _axslice(ndim, axis, sl):
    """Index tuple selecting slice `sl` along `axis`."""
    out = [slice(None)] * ndim
    out[axis] = sl
    return tuple(out)


def _interleave(a, b, axis, xp):
    """Interleaves two equally-shaped arrays along `axis`:
    out[..., 2i, ...] = a[..., i, ...], out[..., 2i+1, ...] = b[..., i, ...]."""
    stacked = xp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] = 2 * shape[axis]
    return xp.reshape(stacked, shape)


def _pad_linear(u, axis, xp):
    """Appends one ghost entry on each side of `axis` by linear extrapolation."""
    nd = u.ndim
    left = 2 * u[_axslice(nd, axis, slice(0, 1))] - u[_axslice(nd, axis, slice(1, 2))]
    right = 2 * u[_axslice(nd, axis, slice(-1, None))] - u[_axslice(nd, axis, slice(-2, -1))]
    return xp.concatenate([left, u, right], axis=axis)


def _interp_axis(u, axis, loc, xp):
    nd = u.ndim
    if loc == ".":
        return u
    if loc == "n":
        # Fine nodes: even coincide with coarse, odd are midpoints.
        head = u[_axslice(nd, axis, slice(0, -1))]
        tail = u[_axslice(nd, axis, slice(1, None))]
        mids = (head + tail) * 0.5
        fine = _interleave(head, mids, axis, xp)
        return xp.concatenate([fine, u[_axslice(nd, axis, slice(-1, None))]], axis=axis)
    if loc == "c":
        # Fine cell 2i sits at coarse offset -1/4, fine cell 2i+1 at +1/4:
        #   fine[2i]   = (u[i-1] + 3 u[i]) / 4
        #   fine[2i+1] = (3 u[i] + u[i+1]) / 4
        # with ghost values from linear extrapolation.
        p = _pad_linear(u, axis, xp)
        lo = p[_axslice(nd, axis, slice(0, -2))]
        mid = p[_axslice(nd, axis, slice(1, -1))]
        hi = p[_axslice(nd, axis, slice(2, None))]
        return _interleave((lo + 3 * mid) * 0.25, (3 * mid + hi) * 0.25, axis, xp)
    raise ValueError(f"Invalid loc character '{loc}'")


def _restrict_axis(u, axis, loc, xp):
    nd = u.ndim
    n = u.shape[axis]
    if loc == ".":
        return u
    if loc == "c":
        # Pairwise average; coarse size n // 2.
        even = u[_axslice(nd, axis, slice(0, 2 * (n // 2), 2))]
        odd = u[_axslice(nd, axis, slice(1, 2 * (n // 2), 2))]
        return (even + odd) * 0.5
    if loc == "n":
        # Full weighting with linear-extrapolation ghosts; identity on the
        # boundary nodes: coarse[0] = ((2u0-u1) + 2 u0 + u1)/4 = u0.
        p = _pad_linear(u, axis, xp)
        a = p[_axslice(nd, axis, slice(0, n, 2))]
        b = p[_axslice(nd, axis, slice(1, n + 1, 2))]
        c = p[_axslice(nd, axis, slice(2, n + 2, 2))]
        return (a + 2 * b + c) * 0.25
    raise ValueError(f"Invalid loc character '{loc}'")


_INTERP_MATRICES = {}


def _interp_matrix(n, loc, dtype):
    """Dense (n_fine, n) one-level prolongation matrix along one axis,
    built by applying the separable rule to an identity -- numerically the
    same operator, reassociated.  Cached per (n, loc, dtype)."""
    import numpy as _np

    key = (n, loc, _np.dtype(dtype).str)
    mat = _INTERP_MATRICES.get(key)
    if mat is None:
        eye = _np.eye(n, dtype=_np.float64)
        cols = _interp_axis(eye.T, 1, loc, _np)  # (n, n_fine) rows=inputs
        mat = _np.ascontiguousarray(cols.T).astype(dtype)
        _INTERP_MATRICES[key] = mat
    return mat


def _split3(x, jnp):
    """Three-term decomposition of an fp32 array into fp32 terms that are
    each EXACTLY representable in bfloat16: x1 + x2 carries the top 16
    mantissa bits, x3 the remaining 8 (its own MXU bf16 input-rounding
    drops only ~2^-24 |x|).

    The split is computed by MASKING mantissa bits, not by convert
    round-trips: ``x - f32(bf16(x))`` looks like removable excess
    precision to XLA (``xla_allow_excess_precision`` folds the
    down-up-cast pair away), which silently zeroes the correction terms
    under jit -- measured on the v5e: the convert form is fp32-grade
    eagerly (6e-8) but collapses to raw-MXU error (1.8e-3) once jitted.
    Masking the low 16 mantissa bits gives a truncated head whose
    subtraction is EXACT in fp32 (the residual's significand fits in the
    cleared bits), and each masked term has <= 8 significant bits, so
    the MXU's round-to-bf16 of it is lossless.  The terms stay fp32
    (not cast to bf16): Mosaic's tpu.matmul rejects bf16 operands with
    an fp32 accumulator, while fp32 operands at contract precision
    DEFAULT are the standard single-pass form in both compilers."""
    from jax import lax

    m = jnp.uint32(0xFFFF0000)
    u = lax.bitcast_convert_type(x, jnp.uint32)
    x1 = lax.bitcast_convert_type(u & m, jnp.float32)
    r1 = x - x1
    x2 = lax.bitcast_convert_type(
        lax.bitcast_convert_type(r1, jnp.uint32) & m, jnp.float32
    )
    x3 = r1 - x2
    return x1, x2, x3


def _use_split(x, jnp):
    import jax

    return x.dtype == jnp.float32 and jax.default_backend() == "tpu"


def dot_xw(x, w):
    """``x @ w`` at fp32 accuracy in three raw MXU passes, for ``w``
    EXACTLY representable in bfloat16 -- the interp matrices are: every
    entry is dyadic (1/4, 1/2, 3/4, 1, 3/2, 2 from the kernels and their
    linear-extrapolation boundary rows).  Each split term's product is
    exact on the MXU (each DEFAULT pass rounds both operands to bf16,
    losslessly here, and accumulates in fp32), so this matches
    ``Precision.HIGHEST`` accuracy at HALF its 6-pass cost.
    ``Precision.HIGH`` (3 passes) is NOT enough: it splits both operands
    and drops x_lo contributions beyond 2^-16 -- measured on the 256^2
    flagship, default precision plateaus 54% above the reference's
    converged loss, HIGH walks to a different plateau, HIGHEST (and this
    scheme) tracks the reference within a few percent per epoch
    (BENCH_NOTES.md round 4, "matmul precision").  Off-TPU fp32 dots are
    natively exact; fp64 keeps HIGHEST (emulated, already exact)."""
    import jax
    import jax.numpy as jnp

    if not _use_split(x, jnp):
        return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
    # w rounds to bf16 losslessly inside each DEFAULT-precision pass
    # (bf16-exact entries, asserted in tests); so does each split term.
    p = jax.lax.Precision.DEFAULT
    x1, x2, x3 = _split3(x, jnp)
    return jnp.dot(x1, w, precision=p) + (
        jnp.dot(x2, w, precision=p) + jnp.dot(x3, w, precision=p)
    )


def dot_wx(w, x):
    """``w @ x`` with ``w`` bf16-exact; see ``dot_xw``."""
    import jax
    import jax.numpy as jnp

    if not _use_split(x, jnp):
        return jnp.dot(w, x, precision=jax.lax.Precision.HIGHEST)
    p = jax.lax.Precision.DEFAULT
    x1, x2, x3 = _split3(x, jnp)
    return jnp.dot(w, x1, precision=p) + (
        jnp.dot(w, x2, precision=p) + jnp.dot(w, x3, precision=p)
    )


def _interp_axis_matmul(u, axis, loc, xp):
    """Interpolation along `axis` as a dense matmul -- on TPU this runs on
    the MXU and avoids the lane-interleave shuffle entirely.  The per-level
    matrices are tiny (n_fine x n).  The data operand goes through the
    split-operand exact dot (``dot_xw``): raw MXU passes round fp32 inputs
    to bfloat16, which measurably floors converged accuracy."""
    if loc == ".":
        return u
    mat = xp.asarray(_interp_matrix(u.shape[axis], loc, u.dtype))
    moved = xp.moveaxis(u, axis, -1)
    if getattr(xp, "__name__", "") == "numpy":
        out = moved @ mat.T
    else:
        out = dot_xw(moved, mat.T)
    return xp.moveaxis(out, -1, axis)


def _resolve_xp(mod):
    if mod is not None and hasattr(mod, "xp"):
        return mod.xp
    if mod is not None:
        return mod
    import jax.numpy as jnp

    return jnp


def interp_to_finer(u, loc=None, method=None, mod=None, depth=1):
    """Interpolates a field to a grid refined 2x along each active axis.

    u: input array.
    loc: one character per axis -- 'c' (cell, size n -> 2n),
         'n' (node, size n -> 2(n-1)+1), '.' (inactive, unchanged).
    method: 'stack' or 'conv' (same separable algorithm; kept for CLI parity).
    depth: number of refinement applications.
    """
    if method not in _METHODS:
        raise ValueError(f"Unknown method='{method}'")
    xp = _resolve_xp(mod)
    loc = loc or "c" * u.ndim
    if len(loc) != u.ndim:
        raise ValueError(f"Expected len(loc)=={u.ndim}, got loc='{loc}'")
    use_matmul = method == "matmul"
    if not use_matmul and getattr(xp, "__name__", "") != "numpy":
        # TPU-first default: the dense per-axis form runs on the MXU and
        # avoids lane-interleave shuffles; numerically the same operator.
        import jax

        use_matmul = jax.default_backend() == "tpu"
    apply_axis = _interp_axis_matmul if use_matmul else _interp_axis
    for _ in range(depth):
        # Separable, so the axis order is free: process minor axes first,
        # while the array is smallest -- the interleave on the TPU lane
        # (last) axis is the expensive shuffle, and this runs it on 2^(d-1)x
        # fewer elements than major-axis-first order.
        for axis in reversed(range(u.ndim)):
            u = apply_axis(u, axis, loc[axis], xp)
    return u


def restrict_to_coarser(u, loc=None, method=None, mod=None, depth=1):
    """Restricts a field to a grid coarsened 2x along each active axis.

    u: input array.
    loc: one character per axis -- 'c' (cell, size n -> n//2),
         'n' (node, size n -> (n-1)//2 + 1), '.' (inactive, unchanged).
    method: only 'conv' semantics exist; name accepted for parity.
    depth: number of coarsening applications.
    """
    if method not in _METHODS:
        raise ValueError(f"Unknown method='{method}'")
    xp = _resolve_xp(mod)
    loc = loc or "c" * u.ndim
    if len(loc) != u.ndim:
        raise ValueError(f"Expected len(loc)=={u.ndim}, got loc='{loc}'")
    for _ in range(depth):
        for axis, l in enumerate(loc):
            u = _restrict_axis(u, axis, l, xp)
    return u
