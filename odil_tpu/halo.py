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
  through raw global rolls, and must not return hand-made ``Context.Raw``
  terms (local means cannot be combined across devices).  Fused-kernel
  operators compose via ``ctx.rowwise_terms``: the kernel then runs *per
  device shard* on halo-extended local blocks -- the same widened exchange,
  with halo/duplicated rows masked out of the kernel's loss sums and the
  per-device sums combined by ``psum`` against the global residual count
  (``_HaloContext.rowwise_terms``).  Per-row ``data`` arrays are localized
  and halo-extended like the fields (global-shaped dims sliced to the local
  block, local-shaped dims passed through, size-1 plane dims broadcast).
  Restrictions there: partitioned plane axes must be cell-located.  The
  last (lane) plane axis partitions too -- the extended lane extent
  ``Ny/k + 2*halox`` is no longer a multiple of 128, so Mosaic pads the
  lane dimension (a bandwidth cost priced in docs/SCALING.md; prefer
  leading-axis partitions when the mesh allows).  ONE-PASS loss+grad
  (the training-step kernels) also composes, through
  ``make_halo_loss_grad_fn``: ANY ``ctx.rowwise_terms`` operator gets the
  GENERIC one-pass (deferred-kernel replay inside one per-shard
  ``jax.vjp``; the default -- measured fastest at halo geometries), and
  operators exposing a ``kernel_decl`` declaration may opt into the
  MG-fused per-shard kernel via ``fuse="mg"`` (fine multigrid rows
  reconstructed in VMEM from the sharded level-0 term plus a time-window
  of the replicated level-1 partial, loss sums and cotangents emitted
  together); each route's docstring lists its envelope, outside which
  the builder returns None and training falls back to value_and_grad of
  the halo loss;
- ``extra`` arrays whose shape matches trailing grid axes are sharded and
  localized automatically (e.g. veltracer's ``u_init`` of shape (Nx, Ny));
  pass ``extra_partition={'name': ('x','y') | None}`` to override.

Multigrid ladders run INSIDE shard_map by default (``mg_ladder='local'``):
the finest level is sharded like the flattened field, coarser levels (each
<= 1/2^d of the fine size) are replicated, and each device prolongs only
the coarse window feeding its fine block through dynamically sliced dense
interp matrices -- zero ladder communication, versus the GSPMD-partitioned
prologue of ``mg_ladder='global'`` whose per-axis interp matmuls contract
over partitioned dimensions.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .context import Context
from .fields import Array, Field, MultigridField, NeuralNet, State, field_arrays
from .nn import eval_neural_net

__all__ = [
    "make_halo_loss_fn",
    "make_halo_loss_grad_fn",
    "make_halo_residual_fn",
]


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
            # multigrid_to_regular already returns a Field (singleton ladder;
            # groups were flattened by the batched ladder above).
            fields[key] = problem.domain.multigrid_to_regular(f)
    return State(fields=fields, initialized=True)


def _plain_term_mask(plan, v, ti, replicas=True):
    """0/1 ownership mask (or None) and the GLOBAL residual count of one
    non-kernel term evaluated inside shard_map.

    Grid-rank terms get per-dimension accounting: along each partitioned
    dimension the local extent must be the cell block B or the ghost-node
    block B+1 (anything else means the operator sliced the term along a
    partitioned dimension, which would silently become a per-device slice);
    duplicated shared-node rows are masked out (the left device owns the
    node), so ``psum(sum(sq * mask)) / count`` is an exact global mean.
    Non-grid terms (scalar penalties, parameter regularizers) are replicated
    on every device; their count absorbs the device multiplicity.

    replicas=True: the count also absorbs mesh axes that partition no term
    dimension (they replicate blocks), matching a psum over ALL mesh axes.
    replicas=False: the count matches a psum over partitioning axes only --
    the convention of the kernel terms and the one-pass grad route."""
    domain = plan.domain
    used = set(plan.dim_axis.values())
    mult = 1
    for axis, k in plan.axis_sizes.items():
        if axis not in used:
            mult *= k
    mask = None
    if jnp.ndim(v) == domain.ndim:
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
                    m = m.reshape(mshape).astype(v.dtype)
                    mask = m if mask is None else mask * m
            else:
                raise ValueError(
                    f"halo mode: term {ti} ('{plan.names[ti]}') has local "
                    f"extent {s} along partitioned dimension "
                    f"'{domain.dimnames[d]}' (expected the cell block {B} "
                    f"or node block {B + 1}); operators must not slice "
                    f"terms along partitioned dimensions"
                )
        if replicas:
            count *= mult
    else:
        # Non-grid term: replicated on every device.
        count = float(np.prod(np.shape(v))) * len(plan.mesh.devices.reshape(-1)) \
            if replicas else float(np.prod(np.shape(v))) * (
                int(np.prod(plan.mesh.devices.shape)) // mult)
    return mask, count


def _plain_term_sum(plan, v, ti):
    """Local masked sum-of-squares and GLOBAL count of one non-kernel term
    (the ``make_halo_loss_fn`` convention: psum over ALL mesh axes)."""
    mask, count = _plain_term_mask(plan, v, ti, replicas=True)
    sq = jnp.square(v)
    if mask is not None:
        sq = sq * mask.astype(sq.dtype)
    return jnp.sum(sq), count


def _local_extra_of(extra, extra_arrs):
    """The device-local ``ctx.extra``: the global extra object with its
    planned array attributes replaced by this device's blocks."""
    if extra is None:
        return None
    if isinstance(extra, dict):
        out = dict(extra)
        out.update(extra_arrs)
        return out
    import copy

    out = copy.copy(extra)
    for k, v in extra_arrs.items():
        setattr(out, k, v)
    return out


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


def _mg_ladder_meta(domain, plan, key, mgfield):
    """Static metadata for running the multigrid Horner ladder *locally*
    inside shard_map (VERDICT r1 item 2a): the finest level is sharded like
    the flattened field, coarser levels (each <= 1/2^d of the fine size) are
    replicated, and each device prolongs only the coarse *window* feeding
    its fine block -- dynamically sliced dense per-axis interp matrices
    (static window sizes, device-dependent starts), zero communication.

    Returns a dict with, per level: array shapes, per-dim static window
    sizes (or None = whole axis), factors, and per-(level, dim) dense interp
    matrices (numpy; the matmul form of transfer.interp_to_finer, which is
    the TPU default and numerically identical to the slice form)."""
    from .transfer import _interp_matrix

    factors = mgfield.factors or domain.mg_factors or [1] * len(mgfield.terms)
    axes = mgfield.axes or domain.mg_axes
    method = mgfield.method or domain.mg_interp
    loc = mgfield.loc
    ndim = domain.ndim
    shapes = [tuple(t.array.shape) for t in mgfield.terms]
    nlvl = len(shapes)
    active = [bool(ax) and loc[d] != "." for d, ax in enumerate(axes)]

    # Static window sizes per level per dim.  Level 0 = the local block
    # (ghost-node block B+1 on node axes); each coarser active level needs
    # the interp support of the finer window: floor(size/2) + 3 covers the
    # 2-point linear stencil plus the boundary-extrapolation rows.  None
    # means the whole axis (replicated levels are full arrays anyway).
    sizes = []
    s0 = []
    for d in range(ndim):
        if d in plan.dim_axis:
            k = plan.axis_sizes[plan.dim_axis[d]]
            B = domain.cshape[d] // k
            s0.append(B + (1 if loc[d] == "n" else 0))
        else:
            s0.append(None)
    sizes.append(tuple(s0))
    for lvl in range(1, nlvl):
        prev = sizes[-1]
        cur = []
        for d in range(ndim):
            if prev[d] is None:
                cur.append(None)
            elif active[d]:
                w = prev[d] // 2 + 3
                cur.append(None if w >= shapes[lvl][d] else w)
            else:
                cur.append(None if prev[d] >= shapes[lvl][d] else prev[d])
        sizes.append(tuple(cur))

    # Dense per-axis interp matrices M[lvl][d]: level lvl+1 -> lvl.
    mats = []
    dtype = np.dtype(domain.dtype)
    for lvl in range(nlvl - 1):
        row = {}
        for d in range(ndim):
            if active[d]:
                row[d] = _interp_matrix(shapes[lvl + 1][d], loc[d], dtype)
        mats.append(row)
    return {
        "factors": [float(f) for f in factors],
        "loc": loc,
        "active": active,
        "method": method,
        "shapes": shapes,
        "sizes": sizes,
        "mats": mats,
    }


def _local_mg_block(plan, meta, levels):
    """Evaluates the Horner ladder ``u = s0 + I(s1 + I(s2 + ...))`` for one
    device's fine block inside shard_map.  ``levels[0]`` is the local
    (ghost-noded) block of the finest term; ``levels[1:]`` are the full
    replicated coarser terms.  Windows along partitioned dims are selected
    with ``dynamic_slice`` (static sizes from the meta, device-dependent
    starts); active unpartitioned dims use the full interp matrix."""
    from .transfer import _interp_axis_matmul, dot_xw

    domain = plan.domain
    ndim = domain.ndim
    nlvl = len(levels)
    shapes, sizes, mats = meta["shapes"], meta["sizes"], meta["mats"]
    active, factors = meta["active"], meta["factors"]
    xp = jnp

    # Device-dependent window starts per level per partitioned dim.
    starts = []
    s0 = {}
    for d, axis in plan.dim_axis.items():
        k = plan.axis_sizes[axis]
        B = domain.cshape[d] // k
        s0[d] = jax.lax.axis_index(axis) * B
    starts.append(s0)
    for lvl in range(1, nlvl):
        prev, cur = starts[-1], {}
        for d in plan.dim_axis:
            w = sizes[lvl][d]
            if w is None:
                cur[d] = jnp.int32(0)
            elif active[d]:
                ideal = prev[d] // 2 - 1
                cur[d] = jnp.clip(ideal, 0, shapes[lvl][d] - w)
            else:
                cur[d] = prev[d]
        starts.append(cur)

    def window(a, lvl):
        """Slices the replicated level array to this device's window."""
        start = [jnp.int32(0)] * ndim
        size = list(a.shape)
        needs = False
        for d in plan.dim_axis:
            w = sizes[lvl][d]
            if w is not None:
                start[d] = starts[lvl][d]
                size[d] = w
                needs = True
        if not needs:
            return a
        return jax.lax.dynamic_slice(a, start, size)

    acc = window(levels[-1], nlvl - 1) * factors[nlvl - 1]
    for lvl in range(nlvl - 2, -1, -1):
        # Prolong acc (level lvl+1 window) into the level-lvl window.
        for d in range(ndim):
            if not active[d]:
                continue
            M = mats[lvl][d]  # (n_lvl, n_lvl+1) dense, numpy constant
            w_out, w_in = sizes[lvl][d], sizes[lvl + 1][d]
            if d in plan.dim_axis and (w_out is not None or w_in is not None):
                r0 = starts[lvl][d] if w_out is not None else jnp.int32(0)
                c0 = starts[lvl + 1][d] if w_in is not None else jnp.int32(0)
                Msub = jax.lax.dynamic_slice(
                    jnp.asarray(M, acc.dtype),
                    (r0, c0),
                    (w_out if w_out is not None else M.shape[0],
                     w_in if w_in is not None else M.shape[1]),
                )
                moved = jnp.moveaxis(acc, d, -1)
                # Split-operand exact dot: Msub is a window of the interp
                # matrix (bf16-exact entries); see transfer.dot_xw.
                acc = jnp.moveaxis(dot_xw(moved, Msub.T), -1, d)
            else:
                acc = _interp_axis_matmul(acc, d, meta["loc"][d], xp)
        lv = levels[lvl] if lvl == 0 else window(levels[lvl], lvl)
        acc = lv * factors[lvl] + acc
    return acc


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
        descs, raws, names_out, rowwise_calls = [], [], [], []

        def probe(arrays, tracers):
            st = _flatten_all_multigrid(problem, problem.state_from_arrays(arrays))
            ctx = Context(domain, st, extra=problem.extra, tracers=tracers)
            names, values = problem._run_operator(ctx)
            descs.extend(ctx.desc_to_array.keys())
            descs.extend((k, None, None) for k in ctx.key_to_array_jac.keys())
            # Raw terms are allowed only when kernel-produced (via
            # ctx.rowwise_terms, rerouted to the per-shard kernel here);
            # hand-made Raw means cannot be combined across devices.
            raws.extend(
                isinstance(v, Context.Raw) and not getattr(v, "from_rowwise", False)
                for v in values
            )
            rowwise_calls.extend(ctx.rowwise_calls)
            names_out.extend(names)
            return 0.0

        problem._capture_structure(state)
        arrays0 = domain.arrays_from_state(state)
        jax.eval_shape(probe, arrays0, problem.tracers)
        if any(raws):
            raise ValueError(
                "halo mode does not support hand-made Context.Raw terms; "
                "evaluate fused kernels through ctx.rowwise_terms (sharded "
                "automatically) or use the plain XLA operator (kernel='xla')"
            )
        self.rowwise_calls = rowwise_calls

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
        # Kernel operators (ctx.rowwise_terms): the declared reaches size the
        # exchanges -- `hist` backward rows along the leading/time axis,
        # `halox` both ways along partitioned plane axes.
        for call in rowwise_calls:
            for key in call["keys"]:
                if key not in widths:
                    raise ValueError(
                        f"halo mode: rowwise_terms key '{key}' is not a grid field"
                    )
                floc = locs[key]
                for d in range(domain.ndim):
                    if d not in self.dim_axis:
                        continue
                    if d == 0:
                        widths[key][0][0] = max(widths[key][0][0], call["hist"])
                        continue
                    if floc[d] != "c":
                        raise ValueError(
                            "halo mode: kernel operators require cell-located "
                            "plane axes along partitioned dimensions"
                        )
                    widths[key][d][0] = max(widths[key][d][0], call["halox"])
                    widths[key][d][1] = max(widths[key][d][1], call["halox"])
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
        # Parameter unknowns (Array/NeuralNet, replicated) are reachable as
        # ctx.state.fields[...] for operators that pull raw weights (e.g.
        # heat's fused conductivity net); grid fields are deliberately
        # absent -- read them through ctx.field / ctx.rowwise_terms.
        self.state = State(fields=dict(params), initialized=True)
        self._extended = {}
        self._cache = {}
        # Deferred-kernel mode (the generic halo one-pass in
        # make_halo_loss_grad_fn): rowwise_terms performs the localization
        # (exchange, data/const prep, row-fn wrapping) but records the
        # kernel call instead of running it, returning placeholders.
        self.rowwise_defer = False
        self.rowwise_deferred = []

    def cast(self, value, dtype=None):
        return self.mod.cast(value, dtype or self.dtype)

    # -- Halo exchange -------------------------------------------------------

    def _extend(self, key):
        """Returns the local block of `key` extended by its halo widths along
        every partitioned dimension (one ppermute pair per dimension)."""
        if key in self._extended:
            return self._extended[key]
        a = self._extend_array(self._grid[key], self.plan.widths[key], self.plan.locs[key])
        self._extended[key] = a
        return a

    def _extend_array(self, a, widths, loc):
        """Extends a local block by per-dimension halo widths along every
        partitioned dimension (one ppermute pair per dimension).

        Cell axes: the neighbor's edge rows ARE the halo (the ring gives
        periodic wrap for free).  Node axes (ghost-node blocks of B+1 rows,
        adjacent blocks sharing one duplicated node): the slab is one row
        wider and each receiver selects its h rows at a device-dependent
        offset -- interior devices skip the duplicated shared node, while the
        ring-wrap devices shift by one so the read reproduces the reference's
        periodic roll over the N+1 global nodes."""
        for d, axis in self.plan.dim_axis.items():
            lo, hi = widths[d]
            if not (lo or hi):
                continue
            k = self.plan.axis_sizes[axis]
            node = loc[d] == "n"
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

    def rowwise_terms(
        self,
        row_fn,
        keys,
        params=(),
        data=(),
        consts=(),
        nterms=1,
        hist=1,
        halox=1,
        interpret=None,
        block_rows=None,
        stream=False,
    ):
        """The sharded form of ``Context.rowwise_terms``: runs the fused
        row-wise kernel on this device's halo-extended local blocks (the
        plan sized the exchanges from the declared ``hist``/``halox``), with
        a wrapped row function that (a) offsets the row index to its global
        value so ``it``-based masking lands correctly, and (b) multiplies
        every residual by a 0/1 mask zeroing halo rows/columns and the
        duplicated shared node of ghost-node time blocks.  Returns Raw terms
        carrying (local sum, global count); ``local_eval`` psums them.

        The halo exchange happens in ``_extend`` *outside* the kernel, so
        shard_map autodiff transposes it to the exact scatter-add of edge
        cotangents back to the owning devices -- no manual fold needed."""
        plan = self.plan
        domain = self.domain
        ndim = domain.ndim
        keys = tuple(keys)
        w0 = plan.widths[keys[0]]
        loc0 = plan.locs[keys[0]]
        for k in keys[1:]:
            if plan.widths[k] != w0 or plan.locs[k] != loc0:
                raise ValueError(
                    "halo mode: rowwise_terms fields must share one halo "
                    f"plan; '{keys[0]}' and '{k}' differ (are they also read "
                    "through ctx.field with different shifts?)"
                )
        exts = [self._extend(k) for k in keys]
        local_shape = tuple(self._grid[keys[0]].shape)
        dtype = exts[0].dtype

        # Per-row data arrays (read at offset 0 forward, offsets 0..hist by
        # the backward recompute) are brought to the same halo-extended local
        # shape as the fields: global-shaped dims (replicated extras) are
        # sliced to this device's real block, local-shaped dims (auto-sharded
        # extras, or data computed from local fields) pass through, and
        # size-1 plane dims broadcast inside the row function so they skip
        # the exchange.  The halo rows then come from the same ppermute
        # exchange as the fields, so cotangents of data computed from local
        # unknowns transpose to the exact edge scatter-add.
        def _localize_data(darr):
            dloc = jnp.asarray(darr)
            if dloc.ndim != ndim:
                raise ValueError(
                    "halo mode: rowwise_terms data arrays must have grid "
                    f"rank (T, *plane); got shape {tuple(dloc.shape)}"
                )
            dwidths = [(0, 0)] * ndim
            for dim, axis in plan.dim_axis.items():
                nglob = domain.cshape[dim] + (1 if loc0[dim] == "n" else 0)
                nloc = local_shape[dim]
                s = dloc.shape[dim]
                if s == 1 and dim > 0:
                    continue
                if s == nglob and s != nloc:
                    Bd = domain.cshape[dim] // plan.axis_sizes[axis]
                    start = (jax.lax.axis_index(axis) * Bd).astype(jnp.int32)
                    dloc = jax.lax.dynamic_slice_in_dim(dloc, start, nloc, axis=dim)
                elif s != nloc:
                    raise ValueError(
                        f"halo mode: data array size {s} along partitioned "
                        f"dimension '{domain.dimnames[dim]}' matches neither "
                        f"the global ({nglob}) nor the local ({nloc}) extent"
                    )
                dwidths[dim] = tuple(w0[dim])
            return self._extend_array(dloc, dwidths, loc0)

        ext_data = tuple(_localize_data(d) for d in data)

        lo0 = w0[0][0]
        node0 = loc0[0] == "n"
        ax0 = plan.dim_axis.get(0)
        k0 = plan.axis_sizes[ax0] if ax0 else 1
        n_real = local_shape[0]
        B0 = domain.cshape[0] // k0

        # Plane mask: zero on halo columns of partitioned plane axes.
        pshape = exts[0].shape[1:]
        pmask = jnp.ones(pshape, dtype)
        for d in range(1, ndim):
            lo, hi = w0[d]
            if not (lo or hi):
                continue
            n = pshape[d - 1]
            m1 = (jnp.arange(n) >= lo) & (jnp.arange(n) < n - hi)
            mshape = [1] * len(pshape)
            mshape[d - 1] = n
            pmask = pmask * m1.reshape(mshape).astype(dtype)

        # Per-device metadata: global row of ext row 0, first-row ownership.
        if ax0 is not None:
            i0 = jax.lax.axis_index(ax0)
            off = (i0 * B0 - lo0).astype(jnp.int32)
            own = (i0 == 0).astype(jnp.int32)
        else:
            off = jnp.asarray(-lo0, jnp.int32)
            own = jnp.asarray(1, jnp.int32)
        meta = jnp.stack([off, own]).reshape(1, 2)

        # Consts that are exactly local-plane-shaped get zero-padded to the
        # ext plane (their halo columns are masked out of every residual);
        # scalars and pre-shaped arrays pass through.  Along partitioned
        # plane axes const values must be used pointwise (documented).
        def _pad_const(c):
            c = jnp.asarray(c)
            if c.ndim == ndim - 1 and tuple(c.shape) == tuple(local_shape[1:]):
                pad = [tuple(w0[d]) for d in range(1, ndim)]
                if any(p != (0, 0) for p in pad):
                    c = jnp.pad(c, pad)
            return c

        user_consts = tuple(_pad_const(c) for c in consts)
        T_glob = domain.cshape[0] + (1 if node0 else 0)
        nuser = len(user_consts)

        def wrapped(it, _T, rows, data_rows, pv, cons):
            pm, mt = cons[nuser], cons[nuser + 1]
            it_g = it + mt[0, 0]
            res = row_fn(it_g, T_glob, rows, data_rows, pv, cons[:nuser])
            m = pm
            if ax0 is not None and (lo0 or w0[0][1]):
                inb = (it >= lo0) & (it < lo0 + n_real)
                if node0 and k0 > 1:
                    # The left device owns the shared node.
                    inb = inb & ((it != lo0) | (mt[0, 1] > 0))
                m = m * inb.astype(dtype)
            return tuple(r * m for r in res)

        count = 1.0
        for d in range(ndim):
            count *= domain.cshape[d] + (1 if loc0[d] == "n" else 0)
        # Beyond-VMEM local blocks route to the x-tiled kernel: when the x
        # plane dim is partitioned, its halo columns (>= the declared reach)
        # are masked out of every residual above, which is exactly the
        # masked-edge contract that lets the non-tileable extended extent
        # (B + lo + hi) be edge-padded to a tileable one (rowwise.py).
        xpad_ok = (
            ndim == 3
            and plan.dim_axis.get(1) is not None
            and w0[1][0] >= halox
            and w0[1][1] >= halox
        )
        if self.rowwise_defer:
            idx = len(self.rowwise_deferred)
            self.rowwise_deferred.append(
                dict(
                    row_fn=wrapped,
                    fields=tuple(exts),
                    params=tuple(params),
                    data=ext_data,
                    consts=user_consts + (pmask, meta),
                    nterms=nterms,
                    hist=hist,
                    count=count,
                    block_rows=block_rows,
                    stream=stream,
                    halox=halox,
                    xpad_masked=xpad_ok,
                    interpret=interpret,
                )
            )
            out = []
            for t in range(nterms):
                r = Context.Raw(None)
                r.from_rowwise = True
                r.deferred = (idx, t)
                out.append(r)
            return out
        from .ops.rowwise import rowwise_loss_sums

        sums = rowwise_loss_sums(
            wrapped,
            tuple(exts),
            params=params,
            data=ext_data,
            consts=user_consts + (pmask, meta),
            nterms=nterms,
            hist=hist,
            interpret=interpret,
            block_rows=block_rows,
            halox=halox,
            xpad_masked=xpad_ok,
        )
        out = []
        for s in sums:
            r = Context.Raw(None)
            r.halo_sum = (s, count)
            r.from_rowwise = True
            out.append(r)
        return out

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


def _local_grid_params(plan, mg_meta, param_meta, grid, mg_levels, params_flat):
    """Rebuilds the device-local (grid, params) dicts inside shard_map: the
    multigrid ladder runs locally (``_local_mg_block``) and the flat
    parameter arrays are regrouped into their Array/NeuralNet structures."""
    grid = dict(grid)
    for k, levels in mg_levels.items():
        grid[k] = _local_mg_block(plan, mg_meta[k], levels)
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
    return grid, params


def _halo_global_inputs(problem, plan, mg_keys, grid_keys, arrays):
    """The pre-shard_map input split shared by the halo loss and one-pass
    builders: multigrid level arrays (finest ghost-noded, coarser levels
    replicated), ghost-noded plain grid blocks, and the flat parameter
    arrays.  Differentiable -- the ghost-node gather transposes to the exact
    duplicated-node scatter-add."""
    st = problem.state_from_arrays(arrays)
    mg_levels = {}
    for k in mg_keys:
        f = st.fields[k]
        levels = [t.array for t in f.terms]
        levels[0] = _ghost_nodes(levels[0], plan, plan.field_node_dims(k))
        mg_levels[k] = levels
    if mg_keys:
        st = State(
            fields={k: v for k, v in st.fields.items() if k not in mg_keys},
            initialized=True,
        )
    st = _flatten_all_multigrid(problem, st)
    grid = {
        k: _ghost_nodes(st.fields[k].array, plan, plan.field_node_dims(k))
        for k in grid_keys
    }
    params_flat = [a for k in plan.param_keys for a in field_arrays(st.fields[k])]
    return grid, mg_levels, params_flat


def make_halo_loss_fn(problem, state, extra_partition=None, mg_ladder="local"):
    """Returns (loss_fn, arrays0) with the standard pure signature
    ``loss_fn(arrays, tracers) -> (loss, (terms, norms))``, evaluated inside
    ``shard_map`` with explicit ppermute halo exchange -- a drop-in for
    ``Problem.make_loss_fn`` that binds into every scanned optimizer.

    extra_partition: optional {attr_name: tuple-of-dim-names | None}
    overriding the automatic localization of ``ctx.extra`` arrays.

    mg_ladder: 'local' (default) runs the multigrid Horner ladder INSIDE
    shard_map -- finest level sharded, coarser levels replicated, each
    device prolonging only its own window through dynamically sliced dense
    interp matrices (zero ladder communication); 'global' keeps the ladder
    outside shard_map as a GSPMD-partitioned prologue (useful for
    comparison)."""
    plan = _HaloPlan(problem, state, extra_partition=extra_partition)
    domain = problem.domain
    mesh = plan.mesh
    axis_names = tuple(mesh.axis_names)
    # Mesh axes that actually partition a grid dimension; axes outside this
    # set replicate every block (their contribution enters term counts as a
    # multiplicity, never as a psum).
    used_axes = tuple(dict.fromkeys(plan.dim_axis.values()))
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

    # Local-ladder metadata per MultigridField key (mg_ladder='local').
    mg_keys = (
        [k for k, f in state.fields.items() if isinstance(f, MultigridField)]
        if mg_ladder == "local"
        else []
    )
    mg_meta = {
        k: _mg_ladder_meta(domain, plan, k, state.fields[k]) for k in mg_keys
    }

    def local_eval(grid, mg_levels, params_flat, extra_arrs, tracers):
        grid, params = _local_grid_params(
            plan, mg_meta, param_meta, grid, mg_levels, params_flat
        )
        local_extra = _local_extra_of(extra, extra_arrs)
        ctx = _HaloContext(plan, grid, params, local_extra, tracers)
        _, values = problem._run_operator(ctx)
        terms = []
        for ti, v in enumerate(values):
            if isinstance(v, Context.Raw):
                hs = getattr(v, "halo_sum", None)
                if hs is None:
                    raise ValueError(
                        "halo mode does not support hand-made Context.Raw "
                        "terms; evaluate fused kernels through "
                        "ctx.rowwise_terms"
                    )
                # Kernel term: (masked local sum, global count).  Sum only
                # over mesh axes that partition a grid dimension: an axis
                # partitioning nothing replicates the block, and psumming
                # across it would overcount by its size.
                terms.append(jax.lax.psum(hs[0], used_axes) / hs[1])
                continue
            total, count = _plain_term_sum(plan, v, ti)
            terms.append(jax.lax.psum(total, axis_names) / count)
        loss = sum(terms)
        norms = [jnp.sqrt(t) for t in terms]
        return loss, (terms, norms)

    st0 = _flatten_all_multigrid(problem, state)
    grid_keys = [
        k for k, f in st0.fields.items() if isinstance(f, Field) and k not in mg_keys
    ]
    grid_specs = {k: plan.field_spec(k) for k in grid_keys}
    # Local ladder in_specs: finest level sharded like the flattened field
    # (ghost-noded), coarser levels replicated.
    mg_specs = {
        k: [plan.field_spec(k)] + [P()] * (len(mg_meta[k]["shapes"]) - 1)
        for k in mg_keys
    }
    param_count = sum(len(field_arrays(st0.fields[k])) for k in plan.param_keys)

    def loss_fn(arrays, tracers):
        grid, mg_levels, params_flat = _halo_global_inputs(
            problem, plan, mg_keys, grid_keys, arrays
        )
        sharded = _shard_map(
            local_eval,
            mesh,
            in_specs=(
                grid_specs,
                mg_specs,
                [P()] * param_count,
                {k: plan.extra_specs[k] for k in extra_arrays},
                jax.tree_util.tree_map(lambda _: P(), tracers),
            ),
            out_specs=(P(), ([P()] * nterms, [P()] * nterms)),
        )
        return sharded(grid, mg_levels, params_flat, extra_arrays, tracers)

    return loss_fn, arrays0


def make_halo_residual_fn(problem, state, extra_partition=None):
    """Returns ``(f, x0)`` with the ``Problem.residual_fn`` contract
    (f(packed) -> concatenated residual vector, term_names/term_sizes
    attached), the evaluation running inside ``shard_map`` with explicit
    ppermute halo exchange over the domain mesh.

    Each grid-rank term comes back as the stitched ghost-noded global array
    with duplicated shared-node rows masked to zero: up to a fixed
    permutation plus structurally-zero rows (whose Jacobian rows are zero),
    f is the same residual map as ``Problem.residual_fn`` -- the
    Gauss-Newton normal equations J^T J v and J^T r are identical -- so
    ``newton.optimize_gauss_newton`` consumes it unchanged.  Kernel
    (``ctx.rowwise_terms``) operators are not supported on this route
    (their halo form reduces straight to masked sums); use the plain
    operator (kernel='xla')."""
    import math

    plan = _HaloPlan(problem, state, extra_partition=extra_partition)
    if plan.rowwise_calls:
        raise ValueError(
            "make_halo_residual_fn: kernel operators (ctx.rowwise_terms) "
            "have no per-row residual form under halo; build the problem "
            "with the plain operator (kernel='xla')"
        )
    domain = problem.domain
    mesh = plan.mesh

    problem._capture_structure(state)
    arrays0 = domain.arrays_from_state(state)
    shapes = [tuple(a.shape) for a in arrays0]
    sizes = [math.prod(s) for s in shapes]
    bounds = np.cumsum(sizes)[:-1]

    extra = problem.extra
    extra_items = {} if extra is None else (
        vars(extra) if not isinstance(extra, dict) else extra
    )
    extra_arrays = {
        k: _ghost_nodes(jnp.asarray(v), plan, plan.extra_node_dims.get(k, {}))
        for k, v in extra_items.items()
        if k in plan.extra_specs
    }
    param_meta = {k: state.fields[k] for k in plan.param_keys}
    mg_keys = [
        k for k, f in state.fields.items() if isinstance(f, MultigridField)
    ]
    mg_meta = {
        k: _mg_ladder_meta(domain, plan, k, state.fields[k]) for k in mg_keys
    }

    def local_eval(grid, mg_levels, params_flat, extra_arrs, tracers):
        grid, params = _local_grid_params(
            plan, mg_meta, param_meta, grid, mg_levels, params_flat
        )
        local_extra = _local_extra_of(extra, extra_arrs)
        ctx = _HaloContext(plan, grid, params, local_extra, tracers)
        _, values = problem._run_operator(ctx)
        out = []
        for ti, v in enumerate(values):
            assert not isinstance(v, Context.Raw)  # declined above
            mask, _count = _plain_term_mask(plan, v, ti)
            if mask is not None:
                v = v * mask.astype(v.dtype)
            out.append(v)
        return out

    st0 = _flatten_all_multigrid(problem, state)
    grid_keys = [
        k for k, f in st0.fields.items() if isinstance(f, Field) and k not in mg_keys
    ]
    grid_specs = {k: plan.field_spec(k) for k in grid_keys}
    mg_specs = {
        k: [plan.field_spec(k)] + [P()] * (len(mg_meta[k]["shapes"]) - 1)
        for k in mg_keys
    }
    param_count = sum(len(field_arrays(st0.fields[k])) for k in plan.param_keys)

    # Per-term out specs from an abstract probe of the global residual map:
    # grid-rank terms stitch along the partitioned axes, anything else
    # (scalar penalties, parameter regularizers) is replicated.
    def global_terms(arrays):
        st = problem._flatten_multigrid_batched(problem.state_from_arrays(arrays))
        ctx = Context(domain, st, extra=problem.extra, tracers=problem.tracers)
        _, values = problem._run_operator(ctx)
        return [v.value if isinstance(v, Context.Raw) else v for v in values]

    gshapes = jax.eval_shape(global_terms, arrays0)
    term_specs = [
        P(*[plan.dim_axis.get(d) for d in range(domain.ndim)])
        if len(s.shape) == domain.ndim
        else P()
        for s in gshapes
    ]
    tracers = problem.tracers

    def f_values(x):
        parts = jnp.split(x, bounds)
        arrays = [p.reshape(s) for p, s in zip(parts, shapes)]
        grid, mg_levels, params_flat = _halo_global_inputs(
            problem, plan, mg_keys, grid_keys, arrays
        )
        sharded = _shard_map(
            local_eval,
            mesh,
            in_specs=(
                grid_specs,
                mg_specs,
                [P()] * param_count,
                {k: plan.extra_specs[k] for k in extra_arrays},
                jax.tree_util.tree_map(lambda _: P(), tracers),
            ),
            out_specs=term_specs,
        )
        return sharded(grid, mg_levels, params_flat, extra_arrays, tracers)

    def f(x):
        return jnp.concatenate([v.reshape(-1) for v in f_values(x)], axis=0)

    x0 = jnp.concatenate([jnp.asarray(a).reshape(-1) for a in arrays0], axis=0)
    tshapes = jax.eval_shape(f_values, jax.ShapeDtypeStruct(x0.shape, x0.dtype))
    f.term_names = list(plan.names)
    f.term_sizes = [int(math.prod(s.shape)) for s in tshapes]
    return f, x0


def make_halo_loss_grad_fn(
    problem, state, extra_partition=None, interpret=None, fuse=None
):
    """One-pass fused loss+gradients INSIDE shard_map: the ``--halo`` form
    of ``Problem.make_loss_grad_fn`` (same contract: a pure
    ``fn(arrays, tracers) -> ((loss, (terms, norms)), grads)``).

    Two routes: the GENERIC one-pass for any operator whose kernels run
    through ``ctx.rowwise_terms`` (``_make_halo_onepass_loss_grad_fn``:
    deferred-call replay inside one ``jax.vjp`` per shard, the backward
    kernel emitting loss sums and cotangents together, the multigrid
    ladder in the fast local per-field matmul form), and the MG-fused
    per-shard kernel (``_make_halo_mg_loss_grad_fn``: multigrid
    reconstruction inside the kernel, for operators exposing a
    ``kernel_decl``).

    ``fuse`` picks the route tried first: ``"generic"`` (the default; env
    ``ODIL_HALO_FUSE`` overrides) or ``"mg"``.  Unlike the single-device
    routing (MG-fused first -- it wins there), halo mode defaults to the
    generic route because it MEASURES faster at halo geometries on one
    v5e: 0.651 vs 0.735 ms/iter at (64,256,256) and 4.58 vs 5.02 at
    (64,512,512) tiled -- in-kernel reconstruction pays runtime window
    gathers per shard that the local XLA ladder avoids (BENCH_NOTES.md
    round 3).  Whichever is tried first, the other is the fallback, so
    capability is unaffected.  The returned function carries the chosen
    route name as ``fn.route``.  Returns None when neither applies;
    callers fall back to ``jax.value_and_grad(make_halo_loss_fn(...))``."""
    if fuse is None:
        fuse = os.environ.get("ODIL_HALO_FUSE", "generic")
    if fuse not in ("generic", "mg"):
        raise ValueError(f"halo fuse must be 'generic' or 'mg', got {fuse!r}")
    builders = [
        ("generic", _make_halo_onepass_loss_grad_fn),
        ("mg", _make_halo_mg_loss_grad_fn),
    ]
    if fuse == "mg":
        builders.reverse()
    for name, builder in builders:
        fn = builder(
            problem, state, extra_partition=extra_partition, interpret=interpret
        )
        if fn is not None:
            fn.route = name
            return fn
    return None


def _make_halo_mg_loss_grad_fn(problem, state, extra_partition=None, interpret=None):
    """The MG-fused halo one-pass: composes
    the MG-fused backward kernel (ops/rowwise_mg.rowwise_mg_local_loss_and_grads)
    with the explicit halo exchange.  Per device and training step this runs
    ONE kernel on the halo-extended local block -- the fine multigrid rows
    are reconstructed in VMEM from the sharded level-0 term plus a
    time-window of the replicated level-1 Horner partial, and the backward
    sweep accumulates the loss terms while emitting cotangents -- instead of
    the forward+backward kernel pair plus the per-device XLA ladder of the
    ``make_halo_loss_fn`` + ``jax.value_and_grad`` route.

    Structure (all exchanges transpose exactly, so gradients match the
    GSPMD path to roundoff):

    - prologue (outside shard_map, ``jax.vjp``-wrapped): the batched
      multigrid flattening stopped at the level-1 partial
      (``Problem._flatten_multigrid_batched(partial_out=...)``), plus the
      ghost-node re-layout of the sharded level-0 term;
    - localization (inside shard_map, ``jax.vjp``-wrapped): x-halo ppermute
      extension of the level-0 block, the device's time-window of the
      replicated coarse partial, and the ``hist`` fine rows preceding the
      block -- reconstructed by the ring predecessor with the kernel's exact
      operation order and ppermuted forward (periodic wrap for device 0
      comes free from the ring, matching the reference's roll semantics,
      ``src/odil/core.py:956-969``);
    - kernel: per-shard one-pass loss+grad with a wrapped row function
      (global row offsets, halo-column / duplicated-node masking); per-term
      SUMS and the replicated-coarse cotangents are ``psum``-combined.

    Returns None when the fused path does not apply -- no
    ``operator.kernel_decl``, multigrid off, 64-bit dtype (Mosaic), 2D/4D+
    grids, parameter unknowns, odd local time blocks, per-row data arrays,
    or local blocks beyond the kernel's VMEM fit -- and callers fall back to
    ``jax.value_and_grad(make_halo_loss_fn(...))``."""
    domain = problem.domain
    op = problem.operator
    decl_fn = getattr(op, "kernel_decl", None)
    if decl_fn is None or getattr(op, "loss_and_grads", None) is None:
        return None
    if not getattr(problem, "mg_partial", False):
        return None
    if np.dtype(domain.dtype).itemsize > 4 and jax.default_backend() == "tpu":
        return None  # Mosaic cannot lower 64-bit kernels (interpret is fine).
    if domain.ndim != 3 or domain.cshape[0] % 2:
        return None
    problem._capture_structure(state)
    arrays0 = domain.arrays_from_state(state)
    probe = {}
    problem._flatten_multigrid_batched(
        problem.state_from_arrays(arrays0), partial_out=probe
    )
    if not probe:
        return None
    plan = _HaloPlan(problem, state, extra_partition=extra_partition)
    if plan.param_keys or len(plan.rowwise_calls) != 1:
        return None
    if plan.dim_axis.get(domain.ndim - 1) is not None:
        # Lane-axis (last-dim) partitions take the generic route: the
        # MG-fused local kernels' reconstruction windows assume a whole
        # lane plane.
        return None
    call = plan.rowwise_calls[0]
    keys = tuple(call["keys"])
    hist, halox, nterms = call["hist"], call["halox"], call["nterms"]
    if hist < 1:
        return None
    if set(keys) != set(probe) or any(len(probe[k]) != 3 for k in keys):
        return None  # Depth-2 partials / extra grouped fields: unsupported.
    if any(plan.locs[k] != "ncc" for k in keys):
        return None
    # Build-time declaration probe (global extras; the traced evaluation
    # re-runs decl_fn on the localized ones): per-row data arrays are not
    # supported on this route -- DECLINE to the fallback instead of
    # asserting mid-trace -- and the VMEM gate must count the operator's
    # actual const planes (plus the two internal consts, mask and meta).
    decl0 = decl_fn(Context(domain, state, extra=problem.extra, tracers=problem.tracers))
    if decl0.get("data"):
        return None
    nconsts_decl = len(decl0.get("consts", ())) + 2
    ax_t = plan.dim_axis.get(0)
    ax_x = plan.dim_axis.get(1)
    k_t = plan.axis_sizes[ax_t] if ax_t else 1
    k_x = plan.axis_sizes[ax_x] if ax_x else 1
    Tcells, X, Y = domain.cshape
    B = Tcells // k_t
    if k_t > 1 and B % 2:
        # The coarse time-window and its in-kernel parity logic need even
        # owned blocks (window row = local_row // 2 only when g0 is even).
        return None
    XB = X // k_x
    Tl = B + 1
    if Tl <= 2 * hist or (k_x > 1 and XB <= 2 * halox):
        return None
    T_glob = Tcells + 1
    cells = float(T_glob) * X * Y
    hx = halox if k_x > 1 else 0
    Xe = XB + 2 * hx

    from .ops.rowwise_mg import (
        MG_VMEM_LIMIT,
        _recon_rows_xla,
        mg_vmem_estimate,
        rowwise_mg_local_loss_and_grads,
    )

    t0_shapes = tuple(tuple(probe[k][0].shape) for k in keys)
    if any(s != (T_glob, X, Y) for s in t0_shapes):
        return None
    CX, CY = probe[keys[0]][2].shape[1:]
    if (CX, CY) != (X // 2, Y // 2):
        return None
    local_shapes = tuple((Tl, Xe, Y) for _ in keys)
    tiled_cfg = None
    if (
        mg_vmem_estimate(local_shapes, domain.dtype, hist=hist, nconsts=nconsts_decl)
        > MG_VMEM_LIMIT
    ):
        # Beyond-VMEM local blocks: the x-tiled local MG kernel
        # (ops/rowwise_mg_local_tiled.py) keeps the fused route, with the
        # window geometry host-verified for every device index of this
        # mesh before committing to it.
        from .ops.rowwise_mg_local_tiled import (
            mg_local_tiled_supported,
            verify_support,
        )
        from .transfer import _interp_matrix as _imat

        tiled_cfg = mg_local_tiled_supported(
            Xe, Y, domain.dtype, len(keys), nconsts_decl, hist,
            halox=max(int(halox), 1), hx=hx,
        )
        if tiled_cfg is not None and not verify_support(
            _imat(X // 2, "c", np.float64), X, X // 2, XB, hx, k_x, tiled_cfg
        ):
            tiled_cfg = None
        if tiled_cfg is None:
            return None  # Fall back to the generic tiled one-pass.

    from .transfer import _interp_matrix

    np_dtype = np.dtype(domain.dtype)
    Wx_full = jnp.asarray(_interp_matrix(CX, "c", np_dtype))
    Wy_full = jnp.asarray(_interp_matrix(CY, "c", np_dtype))
    f0s = tuple(float(probe[k][1]) for k in keys)
    Tcw = B // 2 + 1
    x_widths = [(0, 0), (hx, hx), (0, 0)]

    mesh = plan.mesh
    used_axes = tuple(dict.fromkeys(plan.dim_axis.values()))
    extra = problem.extra
    extra_items = {} if extra is None else (
        vars(extra) if not isinstance(extra, dict) else extra
    )
    extra_arrays = {
        k: _ghost_nodes(jnp.asarray(v), plan, plan.extra_node_dims.get(k, {}))
        for k, v in extra_items.items()
        if k in plan.extra_specs
    }

    def local_onepass(parts, extra_arrs, tracers):
        local_extra = _local_extra_of(extra, extra_arrs)
        dctx = _HaloContext(plan, {}, {}, local_extra, tracers)
        decl = decl_fn(dctx)
        row_fn = decl["row_fn"]
        assert tuple(decl["keys"]) == keys and decl["nterms"] == nterms
        assert not decl.get("data"), "halo one-pass: per-row data unsupported"

        def pad_const(c):
            # Exactly-local const planes are zero-padded to the x-extended
            # plane; their halo columns are masked out of every residual.
            c = jnp.asarray(c)
            if c.ndim == 2 and tuple(c.shape) == (XB, Y) and hx:
                c = jnp.pad(c, ((hx, hx), (0, 0)))
            return c

        user_consts = tuple(pad_const(c) for c in decl.get("consts", ()))
        nuser = len(user_consts)

        i_t = jax.lax.axis_index(ax_t) if ax_t else jnp.int32(0)
        g0 = (i_t * B).astype(jnp.int32)
        own = (i_t == 0).astype(jnp.int32)
        meta = jnp.stack([g0, own]).reshape(1, 2)
        rdtype = jnp.asarray(parts[keys[0]][0]).dtype
        pmask = jnp.ones((Xe, Y), rdtype)
        if hx:
            mcol = (jnp.arange(Xe) >= hx) & (jnp.arange(Xe) < Xe - hx)
            pmask = pmask * mcol[:, None].astype(rdtype)
        x0 = jax.lax.axis_index(ax_x) * XB if ax_x is not None else jnp.int32(0)
        if ax_x is not None:
            Wxl = jnp.take(
                Wx_full, (x0 - hx + jnp.arange(Xe)) % X, axis=0
            )
        else:
            Wxl = Wx_full

        def localize(p):
            t0x, Pw, heads = {}, {}, {}
            for j, k in enumerate(keys):
                t0_loc, P1 = p[k]
                a = dctx._extend_array(t0_loc, x_widths, "ncc") if hx else t0_loc
                w = (
                    jax.lax.dynamic_slice_in_dim(P1, g0 // 2, Tcw, axis=0)
                    if k_t > 1
                    else P1
                )
                # The `hist` fine rows preceding local row 0: each device
                # reconstructs its TAIL slab (rows Tl-1-hist .. Tl-1, the
                # kernel's exact operation order) and ppermutes it forward;
                # the receiver's node-rule start skips the shared node
                # (interior) or shifts by one (ring wrap, device 0), exactly
                # as the field halo exchange does.
                slab = _recon_rows_xla(
                    a, w, range(Tl - 1 - hist, Tl), Wxl, Wy_full, f0s[j]
                )
                if k_t > 1:
                    slab = jax.lax.ppermute(
                        slab, ax_t, perm=[(q, (q + 1) % k_t) for q in range(k_t)]
                    )
                    start = jnp.where(i_t == 0, 1, 0)
                else:
                    start = 1
                heads[k] = jax.lax.dynamic_slice_in_dim(slab, start, hist, axis=0)
                t0x[k] = a
                Pw[k] = w
            return t0x, Pw, heads

        (t0x, Pw, heads), vjp_loc = jax.vjp(localize, dict(parts))

        def wrapped(it, _T, rows, data_rows, pv, cons):
            pm, mt = cons[nuser], cons[nuser + 1]
            it_g = it + mt[0, 0]
            res = row_fn(it_g, T_glob, rows, data_rows, pv, cons[:nuser])
            m = pm
            if k_t > 1:
                # The left device owns the shared ghost node (local row 0).
                m = m * ((it != 0) | (mt[0, 1] > 0)).astype(rdtype)
            return tuple(r * m for r in res)

        kernel_kwargs = dict(
            t0s=tuple(t0x[k] for k in keys),
            coarse=tuple(Pw[k] for k in keys),
            Wx=Wxl,
            Wy=Wy_full,
            factors0=f0s,
            heads=tuple(heads[k] for k in keys),
            consts=user_consts + (pmask, meta),
            nterms=nterms,
            hist=hist,
            gscale=1.0 / cells,
            interpret=interpret,
        )
        if tiled_cfg is not None:
            from .ops.rowwise_mg_local_tiled import (
                rowwise_mg_local_tiled_loss_and_grads,
            )

            sums, (dt0x, dPw, dheads, dparams) = (
                rowwise_mg_local_tiled_loss_and_grads(
                    wrapped,
                    s_shift=x0 // 2 - tiled_cfg[4],
                    cfg=tiled_cfg,
                    **kernel_kwargs,
                )
            )
        else:
            sums, (dt0x, dPw, dheads, dparams) = rowwise_mg_local_loss_and_grads(
                wrapped, **kernel_kwargs
            )
        assert not dparams
        (dparts,) = vjp_loc(
            (
                {k: dt0x[j] for j, k in enumerate(keys)},
                {k: dPw[j] for j, k in enumerate(keys)},
                {k: dheads[j] for j, k in enumerate(keys)},
            )
        )
        sums_g = jax.lax.psum(sums, used_axes)
        terms = [sums_g[j] / cells for j in range(nterms)]
        out = {
            k: (dparts[k][0], jax.lax.psum(dparts[k][1], used_axes)) for k in keys
        }
        loss = sum(terms)
        norms = [jnp.sqrt(t) for t in terms]
        return loss, terms, norms, out

    parts_specs = {k: (plan.field_spec(k), P()) for k in keys}

    def loss_grad_fn(arrays, tracers):
        def prologue(arrs):
            partials = {}
            problem._flatten_multigrid_batched(
                problem.state_from_arrays(arrs), partial_out=partials
            )
            return {
                k: (
                    _ghost_nodes(partials[k][0], plan, plan.field_node_dims(k)),
                    partials[k][2],
                )
                for k in keys
            }

        parts, vjp_pro = jax.vjp(prologue, arrays)
        sharded = _shard_map(
            local_onepass,
            mesh,
            in_specs=(
                parts_specs,
                {k: plan.extra_specs[k] for k in extra_arrays},
                jax.tree_util.tree_map(lambda _: P(), tracers),
            ),
            out_specs=(
                P(),
                [P()] * nterms,
                [P()] * nterms,
                {k: (plan.field_spec(k), P()) for k in keys},
            ),
        )
        loss, terms, norms, dparts = sharded(parts, extra_arrays, tracers)
        (grads,) = vjp_pro(dparts)
        return (loss, (list(terms), list(norms))), grads

    return loss_grad_fn


def _make_halo_onepass_loss_grad_fn(problem, state, extra_partition=None, interpret=None):
    """The GENERIC halo one-pass fused loss+grad: the shard_map mirror of
    ``Problem._make_onepass_loss_grad_fn``, for ANY operator whose kernel
    terms come through ``ctx.rowwise_terms`` (wave, heat with NeuralNet
    params and imposed data, veltracer with multigrid off or flattened --
    the multigrid ladder then runs locally inside the same ``jax.vjp``).

    Per device and training step: the operator runs once in deferred mode
    inside one ``jax.vjp`` of the whole localization (local multigrid
    ladder, parameter regrouping, ppermute halo exchange, per-row data
    localization) -- ``_HaloContext.rowwise_terms`` performs the exchange
    and row-function wrapping but records the kernel call and returns
    placeholders.  Each recorded call then runs the one-pass backward
    kernel (ops/rowwise.rowwise_loss_and_grads: masked per-term SUMS plus
    cotangents in one sweep, no forward kernel), non-kernel terms (scalar
    penalties, weight regularizers, imposed-value residuals evaluated in
    XLA) get analytic masked mean-square cotangents, and all cotangents
    fold back through the single ``jax.vjp`` -- whose transpose turns the
    halo ppermutes into the exact reverse-edge scatter-adds.  Per-term
    sums and replicated-input cotangents (coarse multigrid levels,
    parameters) are ``psum``-combined over the mesh axes that partition a
    grid dimension only (replicating axes enter the counts instead).

    Returns None when no kernel call is recorded or any call falls outside
    the kernel envelope (off-TPU unless ``interpret=True``, 64-bit dtype,
    streaming variant, beyond-VMEM local working set); callers fall back
    to ``jax.value_and_grad(make_halo_loss_fn(...))``."""
    from .ops.rowwise import (
        _FORCE_TILE,
        _on_tpu,
        onepass_supported,
        rowwise_loss_and_grads,
    )

    domain = problem.domain
    if (
        interpret is None
        and (not _on_tpu() or np.dtype(domain.dtype).itemsize > 4)
        and not _FORCE_TILE
    ):
        return None
    plan = _HaloPlan(problem, state, extra_partition=extra_partition)
    if not plan.rowwise_calls or any(c.get("stream") for c in plan.rowwise_calls):
        return None
    problem._capture_structure(state)
    arrays0 = domain.arrays_from_state(state)

    mesh = plan.mesh
    used_axes = tuple(dict.fromkeys(plan.dim_axis.values()))
    nterms_total = len(plan.names)
    param_meta = {k: state.fields[k] for k in plan.param_keys}
    mg_keys = [k for k, f in state.fields.items() if isinstance(f, MultigridField)]
    mg_meta = {k: _mg_ladder_meta(domain, plan, k, state.fields[k]) for k in mg_keys}
    st0 = _flatten_all_multigrid(problem, state)
    grid_keys = [
        k for k, f in st0.fields.items() if isinstance(f, Field) and k not in mg_keys
    ]
    grid_specs = {k: plan.field_spec(k) for k in grid_keys}
    mg_specs = {
        k: [plan.field_spec(k)] + [P()] * (len(mg_meta[k]["shapes"]) - 1)
        for k in mg_keys
    }
    param_count = sum(len(field_arrays(st0.fields[k])) for k in plan.param_keys)

    extra = problem.extra
    extra_items = {} if extra is None else (
        vars(extra) if not isinstance(extra, dict) else extra
    )
    extra_arrays = {
        k: _ghost_nodes(jnp.asarray(v), plan, plan.extra_node_dims.get(k, {}))
        for k, v in extra_items.items()
        if k in plan.extra_specs
    }
    extra_sub_specs = {k: plan.extra_specs[k] for k in extra_arrays}

    def build_split(recs, layout, extra_arrs, tracers):
        def split(inputs):
            grid_in, mg_in, params_in = inputs
            g, params = _local_grid_params(
                plan, mg_meta, param_meta, grid_in, mg_in, params_in
            )
            local_extra = _local_extra_of(extra, extra_arrs)
            ctx = _HaloContext(plan, g, params, local_extra, tracers)
            ctx.rowwise_defer = True
            _, values = problem._run_operator(ctx)
            del recs[:], layout[:]
            recs.extend(ctx.rowwise_deferred)
            others = []
            for ti, v in enumerate(values):
                if isinstance(v, Context.Raw):
                    if getattr(v, "deferred", None) is None:
                        raise ValueError(
                            "halo mode does not support hand-made Context.Raw "
                            "terms; evaluate fused kernels through "
                            "ctx.rowwise_terms"
                        )
                    layout.append(("k", v.deferred[0], v.deferred[1], ti))
                else:
                    layout.append(("sq", len(others), ti))
                    others.append(v)
            kin = tuple(
                (r["fields"], r["params"], r["data"], r["consts"]) for r in recs
            )
            return kin, tuple(others)

        return split

    # One in_specs layout shared by the probe and the real shard_map, so
    # the build-time envelope check cannot diverge from the path it gates.
    def in_specs_of(tracers):
        return (
            grid_specs,
            mg_specs,
            [P()] * param_count,
            extra_sub_specs,
            jax.tree_util.tree_map(lambda _: P(), tracers),
        )

    # Build-time envelope probe: collect the kernel calls' local shapes
    # (extended blocks) through an abstract shard_map trace.
    probe_recs = []

    def probe_local(grid, mg_levels, params_flat, extra_arrs, tracers):
        build_split(probe_recs, [], extra_arrs, tracers)(
            (grid, mg_levels, params_flat)
        )
        return jnp.zeros(())

    def probe_fn(arrays, tracers):
        grid, mg_levels, params_flat = _halo_global_inputs(
            problem, plan, mg_keys, grid_keys, arrays
        )
        sharded = _shard_map(
            probe_local,
            mesh,
            in_specs=in_specs_of(tracers),
            out_specs=P(),
        )
        return sharded(grid, mg_levels, params_flat, extra_arrays, tracers)

    try:
        jax.eval_shape(probe_fn, arrays0, problem.tracers)
    except Exception:
        return None
    if not probe_recs or any(r["stream"] for r in probe_recs):
        return None
    if interpret is None:
        for r in probe_recs:
            if r.get("interpret") is not None:
                continue  # Call-forced interpreter/compile mode always runs.
            if not onepass_supported(
                r["fields"], r["params"], r["data"], r["consts"],
                r["nterms"], r["hist"], halox=r.get("halox"),
                xpad_masked=r.get("xpad_masked", False),
            ):
                return None

    def local_onepass(grid, mg_levels, params_flat, extra_arrs, tracers):
        recs, layout = [], []
        split = build_split(recs, layout, extra_arrs, tracers)
        (kin, others), vjp_split = jax.vjp(split, (grid, mg_levels, params_flat))

        kterms = {}
        dkin = []
        for idx, r in enumerate(recs):
            flds, prms, dat, cns = kin[idx]
            count = r["count"]
            call_interp = r.get("interpret")
            out = rowwise_loss_and_grads(
                r["row_fn"], flds, params=prms, data=dat, consts=cns,
                nterms=r["nterms"], hist=r["hist"],
                interpret=interpret if call_interp is None else call_interp,
                block_rows=r["block_rows"], gscale=1.0 / count,
                halox=r.get("halox"), xpad_masked=r.get("xpad_masked", False),
            )
            assert out is not None, "halo one-pass kernel declined at trace time"
            sums, dfields, dprm = out
            sums = jax.lax.psum(sums, used_axes)
            for t in range(r["nterms"]):
                kterms[(idx, t)] = sums[t] / count
            dkin.append(
                (
                    tuple(dfields),
                    tuple(dprm),
                    tuple(jnp.zeros_like(d) for d in dat),
                    tuple(jnp.zeros_like(c) for c in cns),
                )
            )

        d_others = [None] * len(others)
        oterms = {}
        for kind in layout:
            if kind[0] != "sq":
                continue
            j, ti = kind[1], kind[2]
            v = others[j]
            mask, count = _plain_term_mask(plan, v, ti, replicas=False)
            sq = jnp.square(v)
            d = (2.0 / count) * v
            if mask is not None:
                sq = sq * mask
                d = d * mask
            oterms[ti] = jax.lax.psum(jnp.sum(sq), used_axes) / count
            d_others[j] = d
        (dinputs,) = vjp_split((tuple(dkin), tuple(d_others)))
        dgrid, dmg, dparams = dinputs
        # Replicated inputs (coarse ladder levels, parameters): each device
        # along a partitioning axis holds a distinct contribution; replicas
        # along non-partitioning axes already hold the full value.
        dmg = {
            k: [lv[0]] + [jax.lax.psum(l, used_axes) for l in lv[1:]]
            for k, lv in dmg.items()
        }
        dparams = [jax.lax.psum(p, used_axes) for p in dparams]
        terms = []
        for kind in layout:
            if kind[0] == "k":
                terms.append(kterms[(kind[1], kind[2])])
            else:
                terms.append(oterms[kind[2]])
        loss = sum(terms)
        norms = [jnp.sqrt(jnp.maximum(t, 0.0)) for t in terms]
        return loss, terms, norms, dgrid, dmg, dparams

    def loss_grad_fn(arrays, tracers):
        def prologue(arrs):
            return _halo_global_inputs(problem, plan, mg_keys, grid_keys, arrs)

        (grid, mg_levels, params_flat), vjp_pro = jax.vjp(prologue, arrays)
        sharded = _shard_map(
            local_onepass,
            mesh,
            in_specs=in_specs_of(tracers),
            out_specs=(
                P(),
                [P()] * nterms_total,
                [P()] * nterms_total,
                grid_specs,
                mg_specs,
                [P()] * param_count,
            ),
        )
        loss, terms, norms, dgrid, dmg, dparams = sharded(
            grid, mg_levels, params_flat, extra_arrays, tracers
        )
        (grads,) = vjp_pro((dgrid, dmg, dparams))
        return (loss, (list(terms), list(norms))), grads

    return loss_grad_fn
