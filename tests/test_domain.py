"""Domain geometry and state pack/unpack round-trips.

Mirrors the reference `tests/test_domain.py`: mutating a state through the
packed vector or through raw arrays must match direct mutation, across all
four field types.
"""

from copy import deepcopy

import numpy as np
import pytest

import odil_tpu as odil


def make_state(domain, cshape):
    return domain.init_state(
        odil.State(
            fields={
                "field": np.random.rand(*cshape),
                "mgfield": domain.regular_to_multigrid(np.random.rand(*cshape)),
                "net": domain.make_neural_net([3, 3]),
                "array": [1, 2, 3],
            }
        )
    )


@pytest.mark.parametrize("case", ["pack", "arrays"])
@pytest.mark.parametrize("dim", [1, 2])
def test_roundtrip(case, dim):
    cshape = (1 + np.arange(dim)) * 2
    dimnames = ["x", "y"][:dim]
    domain = odil.Domain(cshape=cshape, dimnames=dimnames, multigrid=1, mg_convert_all=False)
    state = make_state(domain, cshape)
    state2 = deepcopy(state)

    if case == "pack":
        packed = domain.pack_state(state)
        domain.unpack_state(packed + 1, state)
    else:
        arrays = domain.arrays_from_state(state)
        domain.arrays_to_state([a + 1 for a in arrays], state)

    for f in state2.fields.values():
        if isinstance(f, odil.core.Field):
            f.array = f.array + 1
        elif isinstance(f, odil.core.MultigridField):
            for t in f.terms:
                t.array = t.array + 1
        elif isinstance(f, odil.core.NeuralNet):
            f.weights = [w + 1 for w in f.weights]
            f.biases = [b + 1 for b in f.biases]
        elif isinstance(f, odil.core.Array):
            f.array = f.array + 1

    err = float(np.max(np.abs(np.asarray(domain.pack_state(state)) - np.asarray(domain.pack_state(state2)))))
    assert err == 0.0


def test_pytree_order_matches_pack_order():
    """State pytree leaves must equal arrays_from_state order -- the loss
    pipeline relies on it."""
    import jax

    domain = odil.Domain(cshape=(4, 2), dimnames=["x", "y"], multigrid=1, mg_convert_all=False)
    state = make_state(domain, (4, 2))
    leaves = jax.tree_util.tree_leaves(state)
    arrays = domain.arrays_from_state(state)
    assert len(leaves) == len(arrays)
    for a, b in zip(leaves, arrays):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_geometry():
    domain = odil.Domain(cshape=(4, 8), dimnames=["x", "y"], lower=(0, 0), upper=(2, 1))
    assert domain.size("x") == 4
    assert domain.size("x", loc="nn") == 5
    assert domain.step("x") == pytest.approx(0.5)
    assert domain.step("y") == pytest.approx(0.125)
    xc = np.asarray(domain.points_1d("x", loc="c"))
    np.testing.assert_allclose(xc, [0.25, 0.75, 1.25, 1.75])
    xn = np.asarray(domain.points_1d("x", loc="n"))
    np.testing.assert_allclose(xn, [0, 0.5, 1, 1.5, 2])
    xx, yy = domain.points()
    assert xx.shape == (4, 8)
    ix, iy = domain.indices(loc="nc")
    assert ix.shape == (5, 8)
    assert domain.get_field_shape(loc="cn") == (4, 9)


def test_points_with_inactive_axis():
    domain = odil.Domain(cshape=(4, 8, 6), dimnames=["t", "x", "y"])
    x, y = domain.points("x", "y", loc=".cc")
    assert x.shape == (8, 6)


def test_multigrid_hierarchy():
    domain = odil.Domain(cshape=(16, 8), dimnames=["x", "y"], multigrid=True)
    assert domain.mg_nlvl == 3
    assert domain.mg_cshapes == [(16, 8), (8, 4), (4, 2)]
    # Inactive axis keeps its size.
    domain = odil.Domain(cshape=(16, 8), dimnames=["x", "y"], multigrid=True, mg_axes=[True, False])
    assert domain.mg_cshapes[1] == (8, 8)


def test_multigrid_roundtrip_composition():
    """regular_to_multigrid seeds level 0; multigrid_to_regular recovers it."""
    domain = odil.Domain(cshape=(8, 8), dimnames=["x", "y"], multigrid=True)
    u = np.random.rand(8, 8)
    mg = domain.regular_to_multigrid(u)
    back = domain.multigrid_to_regular(mg)
    np.testing.assert_allclose(np.asarray(back.array), u, atol=1e-12)
