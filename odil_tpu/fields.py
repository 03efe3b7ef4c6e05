"""State containers: Field, MultigridField, NeuralNet, Array, State.

Mirrors the reference's unknown types (``src/odil/core.py:506-603``) but every
container is registered as a JAX pytree, so a whole ``State`` can flow through
``jax.jit`` / ``value_and_grad`` / ``lax.scan`` without the pack/unpack
machinery the reference needs.  The classes stay mutable plain-Python objects
(reference scripts assign ``field.array`` directly); pytree flattening reads
the current attributes.
"""

import jax
import numpy as np

__all__ = ["Field", "MultigridField", "NeuralNet", "Array", "State"]


def _norm_shape(shape):
    return None if shape is None else tuple(int(s) for s in shape)


class Field:
    """A grid field: data array + staggered location + grid size in cells.

    loc: one character per axis, 'c' (cell center) or 'n' (node).
    """

    def __init__(self, array=None, loc=None, cshape=None):
        self.array = array
        self.loc = loc
        self.cshape = _norm_shape(cshape)

    def __repr__(self):
        return f"Field({self.array!r}, loc='{self.loc}', cshape={self.cshape})"


class MultigridField:
    """A field represented as a sum of interpolated per-level corrections.

    u = sum_i interp^i(terms[i].array * factors[i]), coarsest level last
    (see reference ``src/odil/core.py:245-263`` for the composition rule).
    """

    def __init__(self, terms=None, loc=None, factors=None, axes=None, method=None):
        self.terms = terms
        self.loc = loc
        self.factors = factors
        self.axes = axes
        self.method = method

    def __repr__(self):
        return f"MultigridField(nterms={len(self.terms or [])}, loc='{self.loc}')"


class NeuralNet:
    """A fully-connected network: weights are (n_out, n_in) matrices."""

    def __init__(self, weights=None, biases=None, func_in=None, func_out=None, activation=None):
        self.weights = weights
        self.biases = biases
        self.func_in = func_in
        self.func_out = func_out
        self.activation = activation or "tanh"

    def __repr__(self):
        sizes = [w.shape for w in (self.weights or [])]
        return f"NeuralNet(layers={sizes}, activation='{self.activation}')"


class Array:
    """A non-grid vector of unknowns (e.g. inferred scalar coefficients)."""

    def __init__(self, array=None, shape=None):
        self.array = array
        self.shape = _norm_shape(shape)

    def __repr__(self):
        return f"Array({self.array!r}, shape={self.shape})"


class State:
    """Named collection of unknowns. ``fields`` maps name -> field object."""

    def __init__(self, fields=None, initialized=False):
        self.fields = fields if fields is not None else dict()
        self.initialized = initialized

    def __repr__(self):
        return f"State(fields={list(self.fields)}, initialized={self.initialized})"


# ---------------------------------------------------------------------------
# Pytree registration.  Leaves are the data arrays; all metadata is aux.
# ---------------------------------------------------------------------------


def _field_flatten(f):
    return (f.array,), (f.loc, f.cshape)


def _field_unflatten(aux, children):
    loc, cshape = aux
    return Field(children[0], loc=loc, cshape=cshape)


def _mg_flatten(f):
    arrays = tuple(t.array for t in f.terms)
    aux = (
        tuple((t.loc, t.cshape) for t in f.terms),
        f.loc,
        tuple(f.factors) if f.factors is not None else None,
        tuple(f.axes) if f.axes is not None else None,
        f.method,
    )
    return arrays, aux


def _mg_unflatten(aux, children):
    term_aux, loc, factors, axes, method = aux
    terms = [Field(a, loc=tl, cshape=tc) for a, (tl, tc) in zip(children, term_aux)]
    return MultigridField(
        terms,
        loc=loc,
        factors=list(factors) if factors is not None else None,
        axes=list(axes) if axes is not None else None,
        method=method,
    )


def _nn_flatten(f):
    n = len(f.weights)
    return tuple(f.weights) + tuple(f.biases), (n, f.func_in, f.func_out, f.activation)


def _nn_unflatten(aux, children):
    n, func_in, func_out, activation = aux
    return NeuralNet(
        list(children[:n]), list(children[n:]), func_in=func_in, func_out=func_out, activation=activation
    )


def _array_flatten(f):
    return (f.array,), (f.shape,)


def _array_unflatten(aux, children):
    return Array(children[0], shape=aux[0])


def _state_flatten(s):
    keys = tuple(s.fields.keys())
    return tuple(s.fields[k] for k in keys), (keys, s.initialized)


def _state_unflatten(aux, children):
    keys, initialized = aux
    return State(fields=dict(zip(keys, children)), initialized=initialized)


jax.tree_util.register_pytree_node(Field, _field_flatten, _field_unflatten)
jax.tree_util.register_pytree_node(MultigridField, _mg_flatten, _mg_unflatten)
jax.tree_util.register_pytree_node(NeuralNet, _nn_flatten, _nn_unflatten)
jax.tree_util.register_pytree_node(Array, _array_flatten, _array_unflatten)
jax.tree_util.register_pytree_node(State, _state_flatten, _state_unflatten)


def field_arrays(field):
    """Lists the data arrays of a field object, in the canonical order used
    for packing (matches reference ``arrays_from_field``, core.py:361-374)."""
    if isinstance(field, Field):
        return [field.array]
    if isinstance(field, MultigridField):
        return [t.array for t in field.terms]
    if isinstance(field, NeuralNet):
        return list(field.weights) + list(field.biases)
    if isinstance(field, Array):
        return [field.array]
    raise TypeError(f"Unknown field type '{type(field).__name__}'")


def set_field_arrays(field, arrays):
    """Replaces the data arrays of `field` from the prefix of `arrays`.
    Returns the number of arrays consumed."""
    if isinstance(field, Field):
        field.array = arrays[0]
        return 1
    if isinstance(field, MultigridField):
        for i, t in enumerate(field.terms):
            t.array = arrays[i]
        return len(field.terms)
    if isinstance(field, NeuralNet):
        n = len(field.weights)
        for i in range(n):
            field.weights[i] = arrays[i]
        for i in range(len(field.biases)):
            field.biases[i] = arrays[n + i]
        return n + len(field.biases)
    if isinstance(field, Array):
        field.array = arrays[0]
        return 1
    raise TypeError(f"Unknown field type '{type(field).__name__}'")


def state_size(state):
    """Total number of scalar unknowns in the state."""
    total = 0
    for key in state.fields:
        for a in field_arrays(state.fields[key]):
            total += int(np.prod(a.shape))
    return total
