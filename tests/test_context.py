"""Context.field semantics: shifts (periodic roll), staggered-location
conversion (pad/trim), frozen stop-gradient, descriptor caching."""

import jax
import numpy as np

import odil_tpu as odil
from odil_tpu.context import Context


def make(domain, fields):
    state = domain.init_state(odil.State(fields=fields))
    return state, Context(domain, state)


def test_shift_is_periodic_roll():
    domain = odil.Domain(cshape=(4, 3), dimnames=["x", "y"])
    u = np.arange(12, dtype=float).reshape(4, 3)
    state, ctx = make(domain, {"u": odil.Field(u, loc="cc")})
    got = np.asarray(ctx.field("u", 1, 0))
    np.testing.assert_array_equal(got, np.roll(u, -1, axis=0))
    got = np.asarray(ctx.field("u", 0, -1))
    np.testing.assert_array_equal(got, np.roll(u, 1, axis=1))


def test_loc_conversion_node_to_cell_trims():
    domain = odil.Domain(cshape=(4, 3), dimnames=["x", "y"])
    u = np.arange(5 * 3, dtype=float).reshape(5, 3)
    state, ctx = make(domain, {"ufx": odil.Field(u, loc="nc")})
    # Read at cells: value at face i-1/2 of cell i -> u[:-1].
    got = np.asarray(ctx.field("ufx", 0, 0, loc="cc"))
    np.testing.assert_array_equal(got, u[:-1])
    # Face i+1/2 of cell i -> shift then trim -> u[1:].
    got = np.asarray(ctx.field("ufx", 1, 0, loc="cc"))
    np.testing.assert_array_equal(got, u[1:])


def test_loc_conversion_cell_to_node_pads():
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    u = np.arange(4, dtype=float)
    state, ctx = make(domain, {"u": odil.Field(u, loc="c")})
    got = np.asarray(ctx.field("u", 0, loc="n"))
    np.testing.assert_array_equal(got, np.concatenate([[0], u]))


def test_descriptor_cache_returns_same_object():
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    state, ctx = make(domain, {"u": odil.Field(np.zeros(4), loc="c")})
    a = ctx.field("u", 1)
    b = ctx.field("u", 1)
    assert a is b


def test_frozen_blocks_gradient():
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    state = domain.init_state(odil.State(fields={"u": odil.Field(np.ones(4), loc="c")}))

    def loss(arrays, frozen):
        st = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(state), arrays)
        ctx = Context(domain, st)
        u = ctx.field("u", frozen=frozen)
        return (u**2).sum()

    arrays = domain.arrays_from_state(state)
    g_live = jax.grad(lambda a: loss(a, False))(arrays)[0]
    g_frozen = jax.grad(lambda a: loss(a, True))(arrays)[0]
    assert float(np.abs(np.asarray(g_live)).max()) > 0
    assert float(np.abs(np.asarray(g_frozen)).max()) == 0


def test_array_field_access():
    domain = odil.Domain(cshape=(4,), dimnames=["x"])
    state, ctx = make(domain, {"a": odil.Array(np.array([1.0, 2.0, 3.0]))})
    np.testing.assert_array_equal(np.asarray(ctx.field("a")), [1, 2, 3])


def test_multigrid_field_flattening():
    domain = odil.Domain(cshape=(8,), dimnames=["x"], multigrid=True)
    u = np.random.rand(8)
    state = domain.init_state(odil.State(fields={"u": u}))
    assert isinstance(state.fields["u"], odil.MultigridField)
    ctx = Context(domain, state)
    np.testing.assert_allclose(np.asarray(ctx.field("u")), u, atol=1e-12)
