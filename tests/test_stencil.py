"""Extrapolation helpers and the Approx 5/9-point stencil toolkit."""

import numpy as np

import odil_tpu as odil
from odil_tpu.stencil import Approx, extrap_linear, extrap_quad, extrap_quadh


def test_extrap_exact_on_polynomials():
    # Linear: points at 0, 1 -> 2.
    f = lambda x: 3 * x + 1  # noqa: E731
    assert extrap_linear(f(0), f(1)) == f(2)
    # Quadratic: points at 0, 1, 2 -> 3.
    g = lambda x: x**2 - 2 * x + 0.5  # noqa: E731
    assert extrap_quad(g(0), g(1), g(2)) == g(3)
    # Quadratic from 0, 1, 1.5 -> 2.
    assert abs(extrap_quadh(g(0), g(1), g(1.5)) - g(2)) < 1e-12


def test_approx_vorticity_of_rigid_rotation():
    """Rigid rotation (u, v) = (-y, x) has vorticity 2 everywhere."""
    domain = odil.Domain(cshape=(32, 32), dimnames=["x", "y"], lower=-1, upper=1)
    xx, yy = map(np.asarray, domain.points())
    approx = Approx(domain)
    omega = np.asarray(approx.vorticity(domain.cast(-yy), domain.cast(xx)))
    np.testing.assert_allclose(omega, 2.0, atol=1e-5)


def test_approx_central_derivative():
    domain = odil.Domain(cshape=(16, 16), dimnames=["x", "y"])
    xx, yy = map(np.asarray, domain.points())
    approx = Approx(domain)
    st = approx.stencil(domain.cast(xx * 2 + yy))
    approx.apply_bc_extrap_linear(st)
    dudx, dudy = approx.central(st)
    np.testing.assert_allclose(np.asarray(dudx), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dudy), 1.0, atol=1e-6)


def test_backend_surface():
    from odil_tpu.runtime import mod

    x = mod.cast(np.arange(6).reshape(2, 3), np.float64)
    np.testing.assert_array_equal(np.asarray(mod.flatten(x)), np.arange(6))
    idx = mod.cast(np.array([[0, 1], [1, 2]]), np.int32)
    np.testing.assert_array_equal(np.asarray(mod.gather_nd(x, idx)), [1, 5])
    parts = mod.split_by_sizes(mod.flatten(x), [2, 4])
    assert [p.shape[0] for p in parts] == [2, 4]
    assert float(mod.sigmoid(mod.cast(0.0, np.float64))) == 0.5
    # Seeded RNG reproducibility.
    mod.random.set_seed(5)
    a = np.asarray(mod.random.uniform((3,), 0, 1, np.float32))
    mod.random.set_seed(5)
    b = np.asarray(mod.random.uniform((3,), 0, 1, np.float32))
    np.testing.assert_array_equal(a, b)
