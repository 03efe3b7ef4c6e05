"""Structured-grid Domain: geometry, staggered locations, multigrid hierarchy,
state initialization, packing, and (TPU-native) mesh sharding.

Covers the reference ``Domain`` (``src/odil/core.py:11-503``) with two
additions that have no reference counterpart:

- ``mesh`` / ``partition``: a ``jax.sharding.Mesh`` plus a mapping from grid
  dimension names to mesh axis names.  Every field array initialized through
  the domain gets a ``NamedSharding``; under ``jit`` the XLA SPMD partitioner
  then turns stencil shifts into ICI collective-permutes and loss reductions
  into psums automatically (see §2.3/§5 of SURVEY.md for the design).
- All arrays are JAX arrays on device; ``init_state`` returns a pytree-ready
  ``State``.
"""

import math

import numpy as np

from . import core_min
from .fields import Array, Field, MultigridField, NeuralNet, State, field_arrays, set_field_arrays
from .nn import eval_neural_net, make_neural_net
from .transfer import interp_to_finer

__all__ = ["Domain", "check_multigrid_cshapes", "latin_hypercube"]


def check_multigrid_cshapes(cshapes, axes=None):
    """Validates that every active axis halves exactly between levels."""
    if not len(cshapes):
        return
    ndim = len(cshapes[0])
    axes = axes or [True] * ndim
    assert len(axes) == ndim
    for lvl in range(1, len(cshapes)):
        for d in range(ndim):
            if axes[d] and cshapes[lvl - 1][d] != 2 * cshapes[lvl][d]:
                raise ValueError(f"Expected exact halving per level, got cshapes={cshapes}")


def latin_hypercube(ndim, size, dtype):
    """Latin-hypercube sample of `size` points from the unit cube."""
    edges = np.linspace(0, 1, size + 1, dtype=dtype)
    jitter = np.random.rand(size, ndim).astype(dtype)
    pts = edges[:size, None] + jitter * (edges[1:, None] - edges[:size, None])
    out = np.empty_like(pts)
    for j in range(ndim):
        out[:, j] = pts[np.random.permutation(size), j]
    return out


class Domain:
    """Descriptor of a structured grid with named axes and staggered values.

    cshape: grid size per axis, measured in cells.
    dimnames: axis names (default x, y, z, ...).
    lower/upper: physical bounds (scalar or per-axis).
    multigrid: build the coarsening hierarchy for multigrid decomposition.
    mg_*: hierarchy options (levels, per-level factors, active axes, interp).
    mesh, partition: optional `jax.sharding.Mesh` and dict mapping dimension
        names to mesh axis names for SPMD execution.
    """

    def __init__(
        self,
        cshape,
        dimnames=None,
        lower=0.0,
        upper=1.0,
        dtype=None,
        multigrid=False,
        mg_convert_all=True,
        mg_nlvl=None,
        mg_factors=None,
        mg_axes=None,
        mg_interp=None,
        mod=None,
        mesh=None,
        partition=None,
    ):
        cshape = tuple(int(n) for n in cshape)
        ndim = len(cshape)
        self.ndim = ndim
        self.cshape = cshape
        self.dimnames = list(dimnames) if dimnames else ["x", "y", "z", "w", "v", "u"][:ndim]
        assert len(self.dimnames) == ndim, f"dimnames={self.dimnames} vs cshape={cshape}"

        if mod is None:
            from . import runtime

            mod = runtime.mod
        self.mod = mod

        if dtype is None:
            from . import runtime

            dtype = runtime.dtype
        dtype = np.dtype(dtype)
        if dtype == np.float64:
            from . import runtime

            runtime.ensure_x64()
        self.dtype = dtype
        self.lower = (np.ones(ndim) * lower).astype(dtype)
        self.upper = (np.ones(ndim) * upper).astype(dtype)

        # Sharding.
        self.mesh = mesh
        self.partition = dict(partition) if partition else None
        self._sharding_warned = set()

        # Multigrid hierarchy.
        self.multigrid = multigrid
        if multigrid:
            self.mg_factors = mg_factors
            mg_axes = mg_axes or [True] * ndim
            nlvl_max = min(
                round(math.log2(n)) if active else max(cshape) for n, active in zip(cshape, mg_axes)
            )
            if mg_nlvl is not None:
                assert mg_nlvl >= 1
                mg_nlvl = min(mg_nlvl, nlvl_max)
            else:
                mg_nlvl = nlvl_max
            self.mg_nlvl = mg_nlvl
            self.mg_cshapes = [
                tuple(n >> lvl if active else n for n, active in zip(cshape, mg_axes))
                for lvl in range(mg_nlvl)
            ]
            check_multigrid_cshapes(self.mg_cshapes, mg_axes)
            self.mg_axes = mg_axes
            self.mg_interp = mg_interp
            self.mg_convert_all = mg_convert_all

    # -- Geometry ----------------------------------------------------------

    def _dim_indices(self, dims, dimnames):
        """Converts a mix of names/indices to indices; empty means all."""
        res = dims if dims is not None and len(dims) else range(len(dimnames))
        return tuple(dimnames.index(d) if isinstance(d, str) else d for d in res)

    def cast(self, value, dtype=None):
        return self.mod.cast(value, dtype or self.dtype)

    def get_minimal(self):
        return core_min.Domain(self)

    def _points_1d(self, d, loc):
        if loc == "c":
            x = np.linspace(self.lower[d], self.upper[d], self.cshape[d], endpoint=False, dtype=self.dtype)
            if len(x) > 1:
                x = x + (x[1] - x[0]) * 0.5
            return x
        if loc == "n":
            return np.linspace(self.lower[d], self.upper[d], self.cshape[d] + 1, dtype=self.dtype)
        raise ValueError("Unknown loc=" + loc)

    def points_1d(self, *dims, loc=None):
        loc = loc or "c" * self.ndim
        idims = self._dim_indices(dims, self.dimnames)
        res = [self._points_1d(i, c) for i, c in zip(idims, loc)]
        return res[0] if len(dims) == 1 else res

    def points(self, *dims, loc=None):
        """Meshgrid coordinate arrays for the requested dims at location `loc`.
        Axes marked '.' in loc are absent from the output arrays."""
        loc = loc or "c" * self.ndim
        assert len(loc) == self.ndim, f"loc={loc} vs ndim={self.ndim}"
        active_names = [v for v, c in zip(self.dimnames, loc) if c != "."]
        idims = self._dim_indices(dims, active_names)
        axes_1d = [self._points_1d(d, loc[d]) for d in range(self.ndim) if loc[d] != "."]
        grids = self.mod.meshgrid(*axes_1d, indexing="ij")
        res = tuple(grids[i] for i in idims)
        return res[0] if len(dims) == 1 else res

    def _indices_1d(self, d, loc):
        n = self.cshape[d] + (1 if loc == "n" else 0)
        return np.arange(n, dtype=int)

    def indices(self, *dims, loc=None):
        loc = loc or "c" * self.ndim
        active_names = [v for v, c in zip(self.dimnames, loc) if c in "cn"]
        idims = self._dim_indices(dims, active_names)
        axes_1d = [self._indices_1d(d, loc[d]) for d in range(self.ndim) if loc[d] in "cn"]
        grids = self.mod.meshgrid(*axes_1d, indexing="ij")
        res = tuple(grids[i] for i in idims)
        return res[0] if len(dims) == 1 else res

    @staticmethod
    def _get_field_shape(cshape, loc=None):
        loc = loc or "c" * len(cshape)
        assert all(c in "cn" for c in loc)
        return tuple(s + 1 if c == "n" else s for s, c in zip(cshape, loc))

    def get_field_shape(self, loc=None):
        return self._get_field_shape(self.cshape, loc=loc)

    def size(self, *dims, loc=None):
        loc = loc or "c" * self.ndim
        assert len(loc) == self.ndim, f"loc={loc} vs ndim={self.ndim}"
        idims = self._dim_indices(dims, self.dimnames)
        res = [self.cshape[i] + (1 if loc[i] == "n" else 0) for i in idims]
        return res[0] if len(dims) == 1 else res

    def step_by_dim(self, i):
        return (self.upper[i] - self.lower[i]) / self.cshape[i]

    def step(self, *dims):
        idims = self._dim_indices(dims, self.dimnames)
        res = tuple(self.step_by_dim(i) for i in idims)
        return res[0] if len(dims) == 1 else res

    # -- Random sampling (PINN collocation) --------------------------------

    def random_inner(self, size):
        pts = latin_hypercube(self.ndim, size, dtype=self.dtype).T
        for i in range(self.ndim):
            pts[i] = self.lower[i] + (self.upper[i] - self.lower[i]) * pts[i]
        return [p for p in pts]

    def random_boundary(self, normal, side, size):
        """Random points on the face with the given normal axis and side."""
        assert normal < self.ndim
        assert side in (0, 1)
        pts = latin_hypercube(self.ndim - 1, size, dtype=self.dtype).T
        face = np.ones(size, dtype=self.dtype) * side
        pts = np.vstack((pts[:normal], face, pts[normal:]))
        for i in range(self.ndim):
            pts[i] = self.lower[i] + (self.upper[i] - self.lower[i]) * pts[i]
        return [p for p in pts]

    # -- Sharding ----------------------------------------------------------

    def field_sharding(self, loc=None, shape=None, allow_uneven=False):
        """NamedSharding for a grid field, or None.

        Axes whose size does not divide the mesh axis are replicated in the
        STORAGE layout (``jax.device_put`` requires divisibility).  With
        ``allow_uneven=True`` -- legal only inside jit, where
        ``with_sharding_constraint`` accepts uneven tiling (XLA pads the
        last shard internally) -- the partition is kept, which is how
        node-located axes of N+1 entries genuinely shard under GSPMD
        (``Problem._constrain_fields``).  A non-divisible axis at the
        *finest* grid size that uneven tiling will NOT pick up (cell count
        itself not divisible, i.e. a mistyped mesh: the whole axis silently
        serializes) logs a warning once per (dim, size, mesh axis)."""
        if self.mesh is None or self.partition is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        axis_sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        entries = []
        for d, name in enumerate(self.dimnames):
            axis = self.partition.get(name)
            if axis is not None and shape is not None and shape[d] % axis_sizes[axis] != 0:
                if allow_uneven:
                    entries.append(axis)
                    continue
                # The ghost-node case -- N cells divide, the N+1 node array
                # does not -- is handled by the uneven in-jit constraint, so
                # only the genuinely-serialized case warns.
                if shape[d] >= self.cshape[d] and (
                    shape[d] != self.cshape[d] + 1
                    or self.cshape[d] % axis_sizes[axis] != 0
                ):
                    key = (name, shape[d], axis)
                    if key not in self._sharding_warned:
                        self._sharding_warned.add(key)
                        from .util import printlog

                        printlog(
                            f"warning: replicating dim '{name}' (size {shape[d]}) "
                            f"instead of sharding over mesh axis '{axis}' "
                            f"({axis_sizes[axis]} devices): size does not divide "
                            f"the axis; this serializes the dimension"
                        )
                axis = None
            entries.append(axis)
        return NamedSharding(self.mesh, PartitionSpec(*entries))

    def _place(self, array, loc=None):
        """Casts to device, applying the domain sharding for grid fields."""
        array = self.mod.cast(array, self.dtype)
        sharding = self.field_sharding(loc, shape=tuple(array.shape))
        if sharding is not None and self.mod.jax is not None:
            return self.mod.jax.device_put(array, sharding)
        return array

    def constrain(self, array):
        """Applies the domain sharding constraint inside a jitted function.
        Uneven tiling is allowed here (in-jit constraints may pad the last
        shard), so node-located axes shard even though their storage layout
        replicates them."""
        if self.mesh is None or self.partition is None:
            return array
        from jax.lax import with_sharding_constraint

        return with_sharding_constraint(
            array,
            self.field_sharding(shape=tuple(array.shape), allow_uneven=True),
        )

    # -- Multigrid decomposition -------------------------------------------

    def multigrid_to_regular(self, mgfield):
        """Flattens a MultigridField to a single fine-grid Field:
        u = terms[0]*f0 + I(terms[1]*f1 + I(terms[2]*f2 + ...))."""
        factors = mgfield.factors or self.mg_factors or [1] * len(mgfield.terms)
        axes = mgfield.axes or self.mg_axes
        assert len(factors) == len(mgfield.terms)
        method = mgfield.method or self.mg_interp
        loc_active = "".join(l if ax else "." for l, ax in zip(mgfield.loc, axes))
        scaled = [t.array * f for t, f in zip(mgfield.terms, factors)]
        acc = scaled[-1]
        for arr in reversed(scaled[:-1]):
            acc = arr + interp_to_finer(acc, loc_active, method, self.mod)
        return Field(acc, loc=mgfield.loc)

    def get_regular_array(self, field):
        """Data array of a Field, MultigridField, or Array."""
        if isinstance(field, (Field, Array)):
            return field.array
        if isinstance(field, MultigridField):
            return self.multigrid_to_regular(field).array
        raise TypeError(f"Expected Field or MultigridField, got {type(field).__name__}")

    def regular_to_multigrid(self, field, cshapes=None, factors=None, method=None):
        """Seeds a MultigridField: level 0 holds the field, coarser levels zero."""
        if isinstance(field, (MultigridField, NeuralNet)):
            raise TypeError(f"Expected Field or ndarray, got {type(field).__name__}")
        field = self.init_field(field)
        cshapes = cshapes or self.mg_cshapes
        factors = factors or self.mg_factors or [1] * len(cshapes)
        assert len(cshapes) == len(factors)
        method = method or self.mg_interp
        terms = [Field(field.array / factors[0], loc=field.loc, cshape=field.cshape)]
        for cs in cshapes[1:]:
            zero = self.mod.zeros(self._get_field_shape(cs, loc=field.loc), dtype=self.dtype)
            terms.append(Field(zero, loc=field.loc, cshape=cs))
        return MultigridField(terms=terms, loc=field.loc, factors=factors, method=method)

    # -- State construction ------------------------------------------------

    def init_field(self, field):
        """Normalizes any accepted field spec into an initialized field object."""
        mod = self.mod
        if field is None:
            return self.init_field(Field(None, loc="c" * self.ndim, cshape=self.cshape))
        if isinstance(field, np.ndarray) or mod.is_tensor(field):
            return self.init_field(Field(field, loc="c" * field.ndim, cshape=field.shape))
        if isinstance(field, Field):
            cshape = tuple(field.cshape) if field.cshape else self.cshape
            loc = field.loc or "c" * len(cshape)
            assert len(loc) == len(cshape)
            shape = self._get_field_shape(cshape, loc=loc)
            array = field.array
            if array is None:
                array = mod.zeros(shape, dtype=self.dtype)
            array = self._place(array, loc=loc)
            assert tuple(array.shape) == shape, f"{array.shape} vs {shape}"
            return Field(array, loc=loc, cshape=cshape)
        if isinstance(field, MultigridField):
            return MultigridField(
                [self.init_field(t) for t in field.terms],
                loc=field.loc,
                factors=field.factors,
                axes=field.axes,
                method=field.method,
            )
        if isinstance(field, NeuralNet):
            return NeuralNet(
                [mod.variable(w, dtype=self.dtype) for w in field.weights],
                [mod.variable(b, dtype=self.dtype) for b in field.biases],
                func_in=field.func_in,
                func_out=field.func_out,
                activation=field.activation,
            )
        if isinstance(field, list):
            arr = mod.cast(mod.array(field), self.dtype)
            return self.init_field(Array(arr, shape=arr.shape))
        if isinstance(field, Array):
            array = field.array
            if array is None:
                array = mod.zeros(field.shape, dtype=self.dtype)
            array = mod.variable(array, dtype=self.dtype)
            return Array(array, tuple(array.shape))
        raise TypeError(f"Unknown field type '{type(field).__name__}'")

    def init_state(self, state):
        """Initializes every field of `state`, converting plain fields to
        multigrid decompositions when the domain hierarchy requests it."""
        fields = dict()
        for key, spec in state.fields.items():
            field = self.init_field(spec)
            if (
                self.multigrid
                and self.mg_convert_all
                and not isinstance(field, (MultigridField, NeuralNet, Array))
            ):
                field = self.regular_to_multigrid(spec)
            fields[key] = field
        return State(fields=fields, initialized=True)

    # -- Array <-> state conversions ---------------------------------------

    def arrays_from_field(self, field):
        return field_arrays(field)

    def arrays_from_state(self, state):
        res = []
        for key in state.fields:
            res += field_arrays(state.fields[key])
        return res

    @staticmethod
    def arrays_to_field(arrays, field):
        return set_field_arrays(field, arrays)

    @staticmethod
    def arrays_to_state(arrays, state):
        offset = 0
        for key in state.fields:
            offset += set_field_arrays(state.fields[key], arrays[offset:])
        return offset

    def pack_field(self, field):
        mod = self.mod
        return mod.concatenate([mod.flatten(a) for a in field_arrays(field)], axis=0)

    def pack_state(self, state):
        mod = self.mod
        return mod.concatenate([mod.flatten(a) for a in self.arrays_from_state(state)], axis=0)

    def unpack_field(self, packed, field):
        mod = self.mod
        arrays = field_arrays(field)
        sizes = [math.prod(a.shape) for a in arrays]
        parts = mod.split_by_sizes(packed[: sum(sizes)], sizes)
        set_field_arrays(field, [mod.reshape(p, a.shape) for p, a in zip(parts, arrays)])
        return sum(sizes)

    def unpack_state(self, packed, state):
        offset = 0
        for key in state.fields:
            offset += self.unpack_field(packed[offset:], state.fields[key])
        return offset

    # -- Convenience accessors ---------------------------------------------

    def make_neural_net(self, layers, initializer="lecun", func_in=None, func_out=None, activation=None):
        return make_neural_net(layers, self.dtype, self.mod, initializer, func_in, func_out, activation)

    def field(self, state, key, *shift):
        """Returns the (flattened, optionally shifted) data array of a field."""
        mod = self.mod
        field = state.fields[key]
        if not isinstance(field, (Field, MultigridField, Array)):
            raise TypeError(f"Expected Field or MultigridField, got {type(field).__name__} for '{key}'")
        if isinstance(field, Array):
            if len(shift):
                raise RuntimeError("Array requires an empty shift")
            return field.array
        shift = shift or (0,) * self.ndim
        if len(shift) != self.ndim:
            raise RuntimeError(f"Expected {self.ndim} shift components, got shift={shift}")
        array = self.get_regular_array(field)
        return mod.roll(array, [-s for s in shift], range(self.ndim))

    def neural_net(self, state, key):
        net = state.fields[key]
        if not isinstance(net, NeuralNet):
            raise TypeError(f"Expected NeuralNet, got {type(net).__name__} for '{key}'")
        return lambda *inputs: eval_neural_net(net, inputs, self.mod)

    def get_context(self, state, extra=None, tracers=None):
        from .context import Context

        return Context(self, state, extra=extra, tracers=tracers)
