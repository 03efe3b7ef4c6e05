"""Silicon unit checks for the ladder-dot building blocks (round 5).

The kernel-level parity tests exercise these transitively; here the two
load-bearing numerical claims are checked directly on the device:

1. Field-batched projections are BITWISE the per-field projections
   (rowwise_mg._up2d_fields / _down2d_fields stack fields along M; the
   MXU contracts each row independently, so batching must not change a
   single bit -- this is what made shipping them gate-free).
2. The split-operand exact dot (transfer.dot_xw: three raw MXU passes
   over bf16-exact mantissa splits) reproduces the fp64 reference to
   fp32-grade accuracy, while a raw single-pass dot does not.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_lowering import _tpu_available

pytestmark = pytest.mark.skipif(not _tpu_available(), reason="needs a TPU device")


def _interp(cy, dtype=np.float32):
    from odil_tpu.transfer import _interp_matrix

    return _interp_matrix(cy, "c", dtype)


def test_field_batched_projections_bitwise():
    from odil_tpu.ops import rowwise_mg

    rnd = np.random.RandomState(7)
    CY, Y = 128, 256
    Wy = jnp.asarray(_interp(CY))  # (Y, CY)
    Wx = jnp.asarray(_interp(10))  # (20, 10)
    cs = [jnp.asarray(rnd.standard_normal((10, CY)), jnp.float32) for _ in range(3)]

    @jax.jit
    def both(cs):
        batched = rowwise_mg._up2d_fields(cs, Wx, Wy)
        scalar = [rowwise_mg._up2d(c, Wx, Wy) for c in cs]
        return batched, scalar

    batched, scalar = both(cs)
    for b, s in zip(batched, scalar):
        assert np.array_equal(np.asarray(b), np.asarray(s)), "up2d batching changed bits"

    ds = [jnp.asarray(rnd.standard_normal((20, Y)), jnp.float32) for _ in range(3)]

    @jax.jit
    def both_down(ds):
        batched = rowwise_mg._down2d_fields(ds, Wx, Wy)
        scalar = [rowwise_mg._down2d(d, Wx, Wy) for d in ds]
        return batched, scalar

    batched, scalar = both_down(ds)
    for b, s in zip(batched, scalar):
        assert np.array_equal(np.asarray(b), np.asarray(s)), "down2d batching changed bits"


def test_split_dot_is_fp32_grade_on_mxu():
    from odil_tpu.transfer import dot_xw

    rnd = np.random.RandomState(3)
    x64 = rnd.standard_normal((64, 256))
    w64 = _interp(128, np.float64)  # (256, 128), bf16-exact entries
    ref = x64 @ w64

    x = jnp.asarray(x64, jnp.float32)
    w = jnp.asarray(w64, jnp.float32)
    split = np.asarray(jax.jit(dot_xw)(x, w))  # dot_xw(x, w): x @ w
    raw = np.asarray(
        jax.jit(lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT))(x, w)
    )
    scale = np.abs(ref).max()
    err_split = np.abs(split - ref).max() / scale
    err_raw = np.abs(raw - ref).max() / scale
    assert err_split < 5e-7, err_split  # fp32-grade
    assert err_raw > 1e-4, err_raw  # raw bf16 pass is ~2^-9; the split must beat it
    assert err_split < err_raw / 50
