"""Multigrid transfer operators: exactness on linear fields.

Mirrors the reference spec (`tests/test_mg_interp.py`, `tests/test_mg_restrict.py`):
interp must be exact on linears for all loc patterns and ndim 1..4; restrict
must be exact on linears even with discontinuous boundary values.
"""

import numpy as np
import pytest

import odil_tpu as odil
from odil_tpu.runtime import mod

LOCS = ["cccc", "nnnn", "cnnn", "nccc"]


def make_domains(ndim):
    cshapeh = 3 + np.arange(ndim)
    cshape = cshapeh * 2
    dimnames = ["x", "y", "z", "w"][:ndim]
    return (
        odil.Domain(cshape=cshape, dimnames=dimnames),
        odil.Domain(cshape=cshapeh, dimnames=dimnames),
    )


def linear(xx):
    if not isinstance(xx, tuple):
        xx = (xx,)
    return sum(x * np.sqrt(i + 1) for i, x in enumerate(xx))


@pytest.mark.parametrize("method", ["conv", "stack"])
@pytest.mark.parametrize("ndim", [1, 2, 3, 4])
@pytest.mark.parametrize("loc4", LOCS)
def test_interp_exact_on_linear(method, ndim, loc4):
    loc = loc4[:ndim]
    domain, domainh = make_domains(ndim)
    u = linear(domain.points(loc=loc))
    uh = linear(domainh.points(loc=loc))
    ui = odil.interp_to_finer(uh, loc=loc, mod=mod, method=method)
    err = float(np.max(np.abs(np.asarray(ui) - np.asarray(u))))
    assert err < 100 * np.finfo(domain.dtype).eps


@pytest.mark.parametrize("ndim", [1, 2, 3, 4])
@pytest.mark.parametrize("loc4", LOCS)
def test_restrict_exact_on_linear_with_jumps(ndim, loc4):
    loc = loc4[:ndim]
    domain, domainh = make_domains(ndim)

    def func(xx):
        if not isinstance(xx, tuple):
            xx = (xx,)
        res = np.zeros_like(np.asarray(xx[0]))
        for i, x in enumerate(xx):
            x = np.asarray(x)
            res = res + x * (i + 1)
            res = res + np.where(x == 0, 10.0, 0.0)
            res = res + np.where(x == 1, 10.0, 0.0)
        return res

    u = func(domain.points(loc=loc))
    uh = func(domainh.points(loc=loc))
    ur = odil.restrict_to_coarser(u, loc=loc, mod=mod, method="conv")
    err = float(np.max(np.abs(np.asarray(ur) - uh)))
    assert err < 100 * np.finfo(domain.dtype).eps


def test_interp_shapes():
    u = np.zeros((4, 5, 7))
    assert odil.interp_to_finer(u, loc="cn.", mod=mod).shape == (8, 9, 7)
    assert odil.restrict_to_coarser(np.zeros((8, 9, 7)), loc="cn.", mod=mod).shape == (4, 5, 7)


def test_depth_recursion():
    u = np.random.rand(4)
    one = odil.interp_to_finer(odil.interp_to_finer(u, loc="c", mod=mod), loc="c", mod=mod)
    two = odil.interp_to_finer(u, loc="c", mod=mod, depth=2)
    np.testing.assert_allclose(np.asarray(one), np.asarray(two))


def test_roundtrip_identity_on_linear():
    # restrict(interp(u)) == u for linear coarse fields.
    domain, domainh = make_domains(2)
    uh = linear(domainh.points(loc="cn"))
    ui = odil.interp_to_finer(uh, loc="cn", mod=mod)
    back = odil.restrict_to_coarser(ui, loc="cn", mod=mod)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uh), atol=1e-12)


def test_interp_matrices_bf16_exact():
    """The split-operand exact dot (transfer.dot_xw/dot_wx) relies on every
    interp-matrix entry being exactly representable in bfloat16; pin it."""
    import jax.numpy as jnp

    from odil_tpu.transfer import _interp_matrix

    for n in (3, 4, 5, 8, 16, 33, 64, 129):
        for loc in ("c", "n"):
            W = _interp_matrix(n, loc, np.float32)
            Wb = np.asarray(jnp.asarray(W).astype(jnp.bfloat16).astype(jnp.float32))
            assert np.array_equal(W, Wb), (n, loc)


def test_split_dot_fp32_grade(monkeypatch):
    """dot_xw/dot_wx's three-term bf16 split reproduces the fp32 dot to
    ~2^-22 relative even when the split branch is forced (off-TPU it
    normally short-circuits to a native dot)."""
    import odil_tpu.transfer as tr

    monkeypatch.setattr(tr, "_use_split", lambda x, jnp: True)
    rng = np.random.default_rng(7)
    x = np.asarray(rng.normal(size=(37, 33)), np.float32) * np.exp(
        rng.normal(size=(37, 33))
    ).astype(np.float32)
    W = tr._interp_matrix(33, "c", np.float32)
    ref = (x.astype(np.float64) @ W.T.astype(np.float64)).astype(np.float64)
    got = np.asarray(tr.dot_xw(x, W.T), np.float64)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 2e-6, err
    got2 = np.asarray(tr.dot_wx(W, x.T), np.float64)
    ref2 = (W.astype(np.float64) @ x.T.astype(np.float64))
    err2 = np.abs(got2 - ref2).max() / np.abs(ref2).max()
    assert err2 < 2e-6, err2
