"""Explicit shard_map + ppermute halo-exchange evaluation path.

The default SPMD path lets the XLA GSPMD partitioner turn the global
``roll``s of ``ctx.field`` into collective-permutes automatically.  This
module is the *manual* variant promised in SURVEY.md §2.3/§7: the loss is
evaluated inside ``jax.shard_map`` over the domain mesh, each device holding
one block of every grid field.  Stencil shifts become slices into a
halo-extended local block; the halos are exchanged ONCE per field per
evaluation with ``jax.lax.ppermute`` rings (periodic wrap comes free from
the ring, exactly matching the reference's periodic ``mod.roll`` semantics,
``src/odil/core.py:956-969``), and every loss ``mean`` becomes one
``psum``.  Gradients flow through ``shard_map`` natively (``ppermute``
transposes to the reverse ``ppermute``).

Why it can beat GSPMD: the partitioner re-derives a halo exchange for every
shifted read; here all shifts of a field share one widened exchange, and
the collective schedule is explicit.  Needs real multi-chip hardware for
perf validation; correctness is tested on a virtual 8-device CPU mesh
(tests/test_halo.py).

Node-located ('+1 node') axes along partitioned dimensions use a ghost-node
convention: the global ``N+1`` nodes (``N`` divisible by the mesh axis) are
re-laid-out as ``k`` overlapping blocks of ``N/k+1`` nodes before
``shard_map`` -- adjacent devices duplicate their shared node.  The gather
that builds the ghosted layout transposes to a scatter-add, so duplicated
cotangents sum exactly; duplicated rows are masked out of every loss sum
(the left device owns the shared node), and halo selection is corrected per
device so the periodic wrap matches the reference's ``roll`` over ``N+1``
(``src/odil/core.py:956-969``) bit-for-bit.

Restrictions (validated at build/trace time, clear errors):
- the cell count along each partitioned dimension must be divisible by the
  mesh axis size;
- no staggered-location conversion (``loc=`` retargeting) along partitioned
  axes -- use it freely on unsharded axes;
- residual terms of grid rank must have the cell or node extent along every
  partitioned dimension: operators that slice a term along a partitioned
  dimension (e.g. a global ``[:-1]`` trim) are rejected at trace time, since
  the trim would silently become per-device;
- operators must read fields through ``ctx.field`` (the contract), not
  through raw global rolls, and must not return ``Context.Raw`` terms;
- ``extra`` arrays whose shape matches trailing grid axes are sharded and
  localized automatically (e.g. veltracer's ``u_init`` of shape (Nx, Ny));
  pass ``extra_partition={'name': ('x','y') | None}`` to override.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .context import Context
from .fields import Array, Field, MultigridField, NeuralNet, State, field_arrays
from .nn import eval_neural_net

__all__ = ["make_halo_loss_fn"]


def _shard_map(fun, mesh, in_specs, out_specs):
    import inspect

    sm = getattr(jax, "shard_map", None)
    if sm is None:  # older JAX
        from jax.experimental.shard_map import shard_map as sm
    kwargs = {}
    params = inspect.signature(sm).parameters
    for flag in ("check_vma", "check_rep"):
        if flag in params:
            kwargs[flag] = False
            break
    return sm(fun, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kwargs)


def _flatten_all_multigrid(problem, state):
    """Flattens every MultigridField to a plain fine-grid Field (the batched
    ladder for groups, the per-field ladder for singletons)."""
    st = problem._flatten_multigrid_batched(state)
    fields = dict(st.fields)
    for key, f in fields.items():
        if isinstance(f, MultigridField):
            fields[key] = Field(problem.domain.multigrid_to_regular(f), loc=f.loc)
    return State(fields=fields, initialized=True)


def _ghost_nodes(a, plan, node_dims):
    """Re-lays-out each axis in `node_dims` (a {array_dim: mesh_axis} map of
    node-located partitioned axes with N+1 entries) into k overlapping blocks
    of N/k+1 entries, duplicating the nodes shared by adjacent blocks.  The
    ghosted global extent N+k divides the mesh axis evenly; the gather's
    transpose is a scatter-add, so duplicated cotangents sum exactly."""
    for j, axis in node_dims.items():
        k = plan.axis_sizes[axis]
        if k == 1:
            continue
        B = (a.shape[j] - 1) // k
        blocks = []
        for i in range(k):
            idx = [slice(None)] * a.ndim
            idx[j] = slice(i * B, i * B + B + 1)
            blocks.append(a[tuple(idx)])
        a = jnp.concatenate(blocks, axis=j)
    return a


class _HaloPlan:
    """Static plan built once per (problem, state): which dims are sharded,
    per-field halo widths, extra localization, term names."""

    def __init__(self, problem, state, extra_partition=None):
        domain = problem.domain
        if domain.mesh is None or not domain.partition:
            raise ValueError("halo mode requires Domain(mesh=..., partition=...)")
        self.domain = domain
        self.mesh = domain.mesh
        self.axis_sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        # dim index -> mesh axis name, for partitioned dims only.
        self.dim_axis = {
            d: domain.partition[name]
            for d, name in enumerate(domain.dimnames)
            if domain.partition.get(name)
        }
        self.names, self.locs, self.widths, self.param_keys = self._discover(problem, state)
        self._validate(problem, state)
        # Extra arrays with a node-sized partitioned axis need the same
        # ghost-node re-layout as fields: {name: {array_dim: mesh_axis}}.
        self.extra_node_dims = {}
        self.extra_specs = self._plan_extra(problem, extra_partition)

    def field_node_dims(self, key):
        """{array_dim: mesh_axis} of node-located partitioned axes of a
        grid field (the axes needing the ghost-node re-layout)."""
        return {
            d: axis
            for d, axis in self.dim_axis.items()
            if self.locs[key][d] == "n"
        }

    # -- Discovery -----------------------------------------------------------

    def _discover(self, problem, state):
        """Abstractly traces the operator once to learn every (key, shift,
        loc) stencil read, the parameter unknowns, and the term names."""
        domain = problem.domain
        descs, raws, names_out = [], [], []

        def probe(arrays, tracers):
            st = _flatten_all_multigrid(problem, problem.state_from_arrays(arrays))
            ctx = Context(domain, st, extra=problem.extra, tracers=tracers)
            names, values = problem._run_operator(ctx)
            descs.extend(ctx.desc_to_array.keys())
            descs.extend((k, None, None) for k in ctx.key_to_array_jac.keys())
            raws.extend(isinstance(v, Context.Raw) for v in values)
            names_out.extend(names)
            return 0.0

        problem._capture_structure(state)
        arrays0 = domain.arrays_from_state(state)
        jax.eval_shape(probe, arrays0, problem.tracers)
        if any(raws):
            raise ValueError(
                "halo mode does not support Context.Raw terms (fused-kernel "
                "operators); use the plain XLA operator (kernel='xla')"
            )

        st = _flatten_all_multigrid(problem, state)
        locs, widths, param_keys = {}, {}, []
        for key, f in st.fields.items():
            if isinstance(f, Field):
                locs[key] = f.loc
                widths[key] = [[0, 0] for _ in range(domain.ndim)]
            else:
                param_keys.append(key)
        for key, shift, loc in descs:
            if shift is None or key not in widths:
                continue
            floc = locs[key]
            for d, s in enumerate(shift):
                if d in self.dim_axis:
                    if loc[d] != floc[d]:
                        raise ValueError(
                            f"halo mode: field '{key}' read at loc '{loc}' but stored at "
                            f"'{floc}'; staggered retargeting along the partitioned "
                            f"dimension '{self.domain.dimnames[d]}' is unsupported"
                        )
                    widths[key][d][0] = max(widths[key][d][0], max(0, -s))
                    widths[key][d][1] = max(widths[key][d][1], max(0, s))
        return names_out, locs, widths, param_keys

    def _validate(self, problem, state):
        domain = self.domain
        st = _flatten_all_multigrid(problem, state)
        for key, f in st.fields.items():
            if not isinstance(f, Field):
                continue
            shape = tuple(np.shape(f.array))
            for d, axis in self.dim_axis.items():
                k = self.axis_sizes[axis]
                # Node-located axes carry N+1 entries for N cells; the cell
                # count must divide (ghost-node blocks of N/k+1 each).
                cells = shape[d] - 1 if self.locs[key][d] == "n" else shape[d]
                if cells % k != 0:
                    raise ValueError(
                        f"halo mode: field '{key}' has {cells} cells along partitioned "
                        f"dimension '{domain.dimnames[d]}', not divisible by mesh axis "
                        f"'{axis}' ({k} devices); drop that axis from the partition"
                    )
                lo, hi = self.widths[key][d]
                if lo + hi >= cells // k:
                    raise ValueError(
                        f"halo mode: stencil width ({lo}+{hi}) along "
                        f"'{domain.dimnames[d]}' exceeds the local block "
                        f"({cells}//{k}); use fewer devices on that axis"
                    )

    def _plan_extra(self, problem, extra_partition):
        """Maps array-valued ``extra`` attributes to PartitionSpecs.  Arrays
        whose shape matches a trailing run of grid axes get those axes'
        specs; anything else is replicated."""
        domain = self.domain
        extra = problem.extra
        if extra is None:
            return {}
        items = vars(extra) if not isinstance(extra, dict) else extra
        specs = {}
        for name, value in items.items():
            if not isinstance(value, (np.ndarray, jnp.ndarray)) or np.ndim(value) == 0:
                continue
            if extra_partition is not None and name in extra_partition:
                dims = extra_partition[name]
                if dims is None:
                    specs[name] = P()
                else:
                    idx = {d: i for i, d in enumerate(dims)}
                    entries = [None] * np.ndim(value)
                    for dimname, i in idx.items():
                        entries[i] = domain.partition.get(dimname)
                    specs[name] = P(*entries)
                continue
            offset = domain.ndim - np.ndim(value)
            if offset < 0:
                continue
            shape = tuple(np.shape(value))
            entries, matched = [], True
            for j, s in enumerate(shape):
                d = offset + j
                if s not in (domain.cshape[d], domain.cshape[d] + 1):
                    matched = False
                    break
                axis = self.dim_axis.get(d)
                if axis is not None:
                    cells = s - 1 if s == domain.cshape[d] + 1 else s
                    if cells % self.axis_sizes[axis] != 0:
                        raise ValueError(
                            f"halo mode: extra array '{name}' has size {s} along "
                            f"partitioned dimension '{domain.dimnames[d]}', not "
                            f"divisible; pass extra_partition={{'{name}': None}} to "
                            f"replicate it (the operator must then handle the "
                            f"global/local shape mismatch)"
                        )
                    if s == domain.cshape[d] + 1:
                        self.extra_node_dims.setdefault(name, {})[j] = axis
                    entries.append(axis)
                else:
                    entries.append(None)
            if matched:
                specs[name] = P(*entries)
        return specs

    def field_spec(self, key):
        loc = self.locs[key]
        entries = [self.dim_axis.get(d) for d in range(self.domain.ndim)]
        return P(*entries)


class _HaloContext:
    """Context lookalike evaluated inside shard_map on local blocks.

    ``field`` resolves stencil reads by slicing a halo-extended local block
    (one ppermute exchange per field, shared across all its shifts);
    ``indices``/``points`` return the *global* coordinate values of the
    local block (offset by the device's mesh position)."""

    Raw = Context.Raw

    def __init__(self, plan, grid, params, extra, tracers):
        domain = plan.domain
        self.plan = plan
        self.domain = domain
        self.mod = domain.mod
        self.dtype = domain.dtype
        self.extra = extra
        self.tracers = tracers
        self.step = domain.step
        self.size = domain.size
        self._grid = grid  # key -> local block
        self._params = params  # key -> Array | NeuralNet with local arrays
        self._extended = {}
        self._cache = {}

    def cast(self, value, dtype=None):
        return self.mod.cast(value, dtype or self.dtype)

    # -- Halo exchange -------------------------------------------------------

    def _extend(self, key):
        """Returns the local block of `key` extended by its halo widths along
        every partitioned dimension (one ppermute pair per dimension).

        Cell axes: the neighbor's edge rows ARE the halo (the ring gives
        periodic wrap for free).  Node axes (ghost-node blocks of B+1 rows,
        adjacent blocks sharing one duplicated node): the slab is one row
        wider and each receiver selects its h rows at a device-dependent
        offset -- interior devices skip the duplicated shared node, while the
        ring-wrap devices shift by one so the read reproduces the reference's
        periodic roll over the N+1 global nodes."""
        if key in self._extended:
            return self._extended[key]
        a = self._grid[key]
        for d, axis in self.plan.dim_axis.items():
            lo, hi = self.plan.widths[key][d]
            if not (lo or hi):
                continue
            k = self.plan.axis_sizes[axis]
            node = self.plan.locs[key][d] == "n"
            parts = []

            def exchange(h, leading):
                """Fetches an h-row halo slab from the previous (leading) or
                next ring neighbor along `axis`."""
                n = a.shape[d]
                w = h + 1 if node else h
                idx = [slice(None)] * a.ndim
                idx[d] = slice(n - w, n) if leading else slice(0, w)
                slab = a[tuple(idx)]
                if k > 1:
                    shift = 1 if leading else -1
                    slab = jax.lax.ppermute(
                        slab, axis, perm=[(i, (i + shift) % k) for i in range(k)]
                    )
                if node:
                    # Drop the duplicated shared node: interior receivers
                    # take [0:h] (leading) / [1:h+1] (trailing); the wrapped
                    # receiver (first/last device) shifts by one to match
                    # periodic indexing modulo N+1.
                    i = jax.lax.axis_index(axis)
                    if leading:
                        start = jnp.where(i == 0, 1, 0)
                    else:
                        start = jnp.where(i == k - 1, 0, 1)
                    slab = jax.lax.dynamic_slice_in_dim(slab, start, h, axis=d)
                return slab

            if lo:
                parts.append(exchange(lo, leading=True))
            parts.append(a)
            if hi:
                parts.append(exchange(hi, leading=False))
            a = jnp.concatenate(parts, axis=d) if len(parts) > 1 else a
        self._extended[key] = a
        return a

    # -- Context API ---------------------------------------------------------

    def field(self, key, *shift, loc=None, frozen=False):
        mod = self.mod
        ndim = self.domain.ndim
        if key in self._params:
            f = self._params[key]
            if not isinstance(f, Array):
                raise TypeError(f"Expected Field or Array, got {type(f).__name__} for '{key}'")
            if len(shift):
                raise RuntimeError("Array requires an empty shift")
            return mod.stop_gradient(f.array) if frozen else f.array
        if key not in self._grid:
            raise KeyError(f"Unknown field '{key}'")
        shift = tuple(shift) or (0,) * ndim
        if len(shift) != ndim:
            raise RuntimeError(f"Expected {ndim} shift components, got shift={shift}")
        floc = self.plan.locs[key]
        loc = loc or floc
        desc = (key, shift, loc)
        if desc in self._cache:
            array = self._cache[desc]
        else:
            array = self._extend(key)
            local = self._grid[key]
            # Partitioned dims: static slice into the halo-extended block.
            slices = []
            for d in range(ndim):
                if d in self.plan.dim_axis:
                    lo, _ = self.plan.widths[key][d]
                    n = local.shape[d]
                    slices.append(slice(lo + shift[d], lo + shift[d] + n))
                else:
                    slices.append(slice(None))
            array = array[tuple(slices)]
            # Unpartitioned dims: the reference pad/roll/trim path.
            pad_width = [
                (1, 0) if (lf == "c" and l == "n" and d not in self.plan.dim_axis) else (0, 0)
                for d, (lf, l) in enumerate(zip(floc, loc))
            ]
            if any(w != (0, 0) for w in pad_width):
                array = mod.pad(array, pad_width=pad_width, mode="constant")
            roll_shift = [
                -shift[d] if d not in self.plan.dim_axis else 0 for d in range(ndim)
            ]
            if any(roll_shift):
                array = mod.roll(array, roll_shift, range(ndim))
            trim = [
                slice(0, -1) if (lf == "n" and l == "c" and d not in self.plan.dim_axis) else slice(None)
                for d, (lf, l) in enumerate(zip(floc, loc))
            ]
            if any(s != slice(None) for s in trim):
                array = array[tuple(trim)]
            self._cache[desc] = array
        return mod.stop_gradient(array) if frozen else array

    def neural_net(self, key, frozen=False):
        net = self._params[key]
        if not isinstance(net, NeuralNet):
            raise TypeError(f"Expected NeuralNet, got {type(net).__name__} for '{key}'")
        return lambda *inputs: eval_neural_net(net, inputs, self.mod, frozen=frozen)

    # -- Localized geometry ---------------------------------------------------

    def _local_1d(self, full, d, loc_d):
        """Slices a global per-axis 1D array down to this device's block."""
        axis = self.plan.dim_axis.get(d)
        if axis is None:
            return full
        k = self.plan.axis_sizes[axis]
        n = len(full)
        if loc_d == "n":
            # Ghost-node blocks: device i holds nodes [i*B, i*B + B].
            B = (n - 1) // k
            offset = jax.lax.axis_index(axis) * B
            return jax.lax.dynamic_slice(jnp.asarray(full), (offset,), (B + 1,))
        ln = n // k
        offset = jax.lax.axis_index(axis) * ln
        return jax.lax.dynamic_slice(jnp.asarray(full), (offset,), (ln,))

    def indices(self, *dims, loc=None):
        domain = self.domain
        loc = loc or "c" * domain.ndim
        active_names = [v for v, c in zip(domain.dimnames, loc) if c in "cn"]
        idims = domain._dim_indices(dims, active_names)
        axes_1d = [
            self._local_1d(domain._indices_1d(d, loc[d]), d, loc[d])
            for d in range(domain.ndim)
            if loc[d] in "cn"
        ]
        grids = jnp.meshgrid(*[jnp.asarray(a) for a in axes_1d], indexing="ij")
        res = tuple(grids[i] for i in idims)
        return res[0] if len(dims) == 1 else res

    def points(self, *dims, loc=None):
        domain = self.domain
        loc = loc or "c" * domain.ndim
        assert len(loc) == domain.ndim, f"loc={loc} vs ndim={domain.ndim}"
        active_names = [v for v, c in zip(domain.dimnames, loc) if c != "."]
        idims = domain._dim_indices(dims, active_names)
        axes_1d = [
            self._local_1d(domain._points_1d(d, loc[d]), d, loc[d])
            for d in range(domain.ndim)
            if loc[d] != "."
        ]
        grids = jnp.meshgrid(*[jnp.asarray(a) for a in axes_1d], indexing="ij")
        res = tuple(grids[i] for i in idims)
        return res[0] if len(dims) == 1 else res


def make_halo_loss_fn(problem, state, extra_partition=None):
    """Returns (loss_fn, arrays0) with the standard pure signature
    ``loss_fn(arrays, tracers) -> (loss, (terms, norms))``, evaluated inside
    ``shard_map`` with explicit ppermute halo exchange -- a drop-in for
    ``Problem.make_loss_fn`` that binds into every scanned optimizer.

    extra_partition: optional {attr_name: tuple-of-dim-names | None}
    overriding the automatic localization of ``ctx.extra`` arrays."""
    plan = _HaloPlan(problem, state, extra_partition=extra_partition)
    domain = problem.domain
    mesh = plan.mesh
    axis_names = tuple(mesh.axis_names)
    ndev = int(np.prod(mesh.devices.shape))

    problem._capture_structure(state)
    arrays0 = domain.arrays_from_state(state)

    extra = problem.extra
    extra_items = {} if extra is None else (vars(extra) if not isinstance(extra, dict) else extra)
    extra_arrays = {
        k: _ghost_nodes(jnp.asarray(v), plan, plan.extra_node_dims.get(k, {}))
        for k, v in extra_items.items()
        if k in plan.extra_specs
    }

    nterms = len(plan.names)
    # Parameter-field metadata (weight counts, NN transforms); arrays unused.
    param_meta = {k: state.fields[k] for k in plan.param_keys}

    def local_eval(grid, params_flat, extra_arrs, tracers):
        params = {}
        pos = 0
        for key in plan.param_keys:
            f = param_meta[key]
            n = len(field_arrays(f))
            arrs = params_flat[pos : pos + n]
            pos += n
            if isinstance(f, Array):
                params[key] = Array(arrs[0])
            else:
                nw = len(f.weights)
                params[key] = NeuralNet(
                    list(arrs[:nw]),
                    list(arrs[nw:]),
                    func_in=f.func_in,
                    func_out=f.func_out,
                    activation=f.activation,
                )
        if extra is None:
            local_extra = None
        elif isinstance(extra, dict):
            local_extra = dict(extra)
            local_extra.update(extra_arrs)
        else:
            import copy

            local_extra = copy.copy(extra)
            for k, v in extra_arrs.items():
                setattr(local_extra, k, v)
        ctx = _HaloContext(plan, grid, params, local_extra, tracers)
        _, values = problem._run_operator(ctx)
        terms = []
        for ti, v in enumerate(values):
            if isinstance(v, Context.Raw):
                raise ValueError("halo mode does not support Context.Raw terms")
            sq = jnp.square(v)
            if jnp.ndim(v) == domain.ndim:
                # Grid-rank term: per-dimension accounting.  Along each
                # partitioned dimension the local extent must be the cell
                # block B or the ghost-node block B+1 (anything else means
                # the operator sliced the term along a partitioned dimension,
                # which would silently become a per-device slice).  Duplicated
                # shared-node rows are masked out (the left device owns the
                # node), making the psum an exact global sum.
                count = 1.0
                for d in range(domain.ndim):
                    s = v.shape[d]
                    axis = plan.dim_axis.get(d)
                    if axis is None:
                        count *= s
                        continue
                    k = plan.axis_sizes[axis]
                    B = domain.cshape[d] // k
                    if s == B:
                        count *= B * k
                    elif s == B + 1:
                        count *= B * k + 1
                        if k > 1:
                            m = (jnp.arange(s) > 0) | (jax.lax.axis_index(axis) == 0)
                            mshape = [1] * domain.ndim
                            mshape[d] = s
                            sq = sq * m.reshape(mshape).astype(sq.dtype)
                    else:
                        raise ValueError(
                            f"halo mode: term {ti} ('{plan.names[ti]}') has local "
                            f"extent {s} along partitioned dimension "
                            f"'{domain.dimnames[d]}' (expected the cell block {B} "
                            f"or node block {B + 1}); operators must not slice "
                            f"terms along partitioned dimensions"
                        )
                # Mesh axes that partition no term dimension replicate it.
                used = {plan.dim_axis[d] for d in range(domain.ndim) if d in plan.dim_axis}
                for axis, k in plan.axis_sizes.items():
                    if axis not in used:
                        count *= k
            else:
                # Non-grid term (scalar penalty, parameter regularizer):
                # replicated on every device.
                count = float(np.prod(np.shape(v))) * ndev
            total = jax.lax.psum(jnp.sum(sq), axis_names)
            terms.append(total / count)
        loss = sum(terms)
        norms = [jnp.sqrt(t) for t in terms]
        return loss, (terms, norms)

    st0 = _flatten_all_multigrid(problem, state)
    grid_keys = [k for k, f in st0.fields.items() if isinstance(f, Field)]
    grid_specs = {k: plan.field_spec(k) for k in grid_keys}
    param_count = sum(len(field_arrays(st0.fields[k])) for k in plan.param_keys)

    def loss_fn(arrays, tracers):
        st = _flatten_all_multigrid(problem, problem.state_from_arrays(arrays))
        grid = {
            k: _ghost_nodes(st.fields[k].array, plan, plan.field_node_dims(k))
            for k in grid_keys
        }
        params_flat = [a for k in plan.param_keys for a in field_arrays(st.fields[k])]
        sharded = _shard_map(
            local_eval,
            mesh,
            in_specs=(
                grid_specs,
                [P()] * param_count,
                {k: plan.extra_specs[k] for k in extra_arrays},
                jax.tree_util.tree_map(lambda _: P(), tracers),
            ),
            out_specs=(P(), ([P()] * nterms, [P()] * nterms)),
        )
        return sharded(grid, params_flat, extra_arrays, tracers)

    return loss_fn, arrays0
