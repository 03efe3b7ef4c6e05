"""Problem: compiles a user operator into device-resident evaluation products.

Counterpart of the reference ``Problem`` (``src/odil/core.py:993-1386``) with
three products:

1. ``eval_loss_grad``  -- loss = sum of mean-squared residuals, gradients
   w.r.t. every state array.  One fused XLA computation via
   ``jax.jit(jax.value_and_grad(...))``.
2. ``eval_operator``   -- residual fields only.
3. ``eval_operator_grad`` / ``linearize`` -- per-stencil-offset gradient
   arrays and a global sparse Jacobian for Newton.  The reference implements
   this only for TensorFlow (``core.py:1363-1364`` raises for JAX); here it
   is native JAX: every (key, shift, loc) sample is rebound as an
   independent input of a replayed operator, then differentiated directly.

For optimizers, ``make_loss_fn`` exposes the *uncompiled* pure function so
the whole training loop (including the optimizer update) can live inside a
single ``lax.scan`` on device.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .context import Context
from .fields import Field, MultigridField, field_arrays

__all__ = ["Problem"]

# Multigrid flatten ladder form: "batched" stacks the coarse levels (>= 1)
# across same-shaped fields into one ladder; "perfield" runs each field's
# ladder separately in the dense-matmul form (the form the halo route uses
# locally).  "auto" (default) picks per consumer from the measured
# comparison in BENCH_NOTES.md: FULL flattens (the generic one-pass /
# value_and_grad paths) run per-field -- the stack's slice/concat vjp
# transposes cost more than the batching saves -- while the mg-partial
# path (the MG-fused kernel prologue, which stops at level 1) keeps the
# batched ladder.  Both forms are bitwise-identical in value.
_MG_LADDER = os.environ.get("ODIL_MG_LADDER", "auto")
if _MG_LADDER not in ("auto", "batched", "perfield"):
    raise ValueError(
        f"ODIL_MG_LADDER={_MG_LADDER!r}: expected 'auto', 'batched' or 'perfield'"
    )


def _horner_ladder(terms, factors, loc, method, mod, stop=0):
    """Folds the multigrid Horner ladder from the coarsest level down to
    level ``stop``: returns ``terms[stop]*factors[stop] + I(terms[stop+1]*
    factors[stop+1] + I(...))``.  ``stop=0`` is the full flatten (returns
    the fine array); ``stop>=1`` returns the partial sum the MG-fused
    kernels consume.  Works on per-field term lists and on stacked
    (batched) level arrays alike -- the caller picks ``loc`` accordingly."""
    from .transfer import interp_to_finer

    acc = terms[-1] * factors[-1]
    for lvl in range(len(terms) - 2, stop - 1, -1):
        acc = terms[lvl] * factors[lvl] + interp_to_finer(acc, loc, method, mod)
    return acc


class Problem:

    def __init__(
        self, operator, domain, extra=None, tracers=None, jit=None, remat=False, mg_partial=False
    ):
        """
        operator: callable(ctx) returning a list of residual fields or
            (name, field) tuples; each field is an equation to drive to zero.
        domain: Domain instance.
        extra: static Python payload available as ``ctx.extra`` (not traced).
        tracers: dict of arrays/scalars that become part of the jitted
            signature; ``tracers['epoch']`` is provided by default.
        remat: rematerialize the operator in the backward pass
            (``jax.checkpoint``) -- trades FLOPs for memory on grids whose
            stencil intermediates would not fit HBM.
        mg_partial: stop the multigrid Horner flatten one level early inside
            the loss path and expose ``ctx.mg_partials[key]`` = (term0,
            factor0, level-1 partial) for the MG-fused Pallas kernel
            (ops/rowwise_mg.py).  Operators must handle an empty dict (fall
            back to ``ctx.field``).
        """
        self.domain = domain
        self.operator = operator
        self.extra = extra
        self.remat = remat
        self.mg_partial = mg_partial
        tracers = dict(tracers) if tracers is not None else dict()
        tracers.setdefault("epoch", 0)
        self.tracers = tracers
        if jit is None:
            from . import runtime

            jit = runtime.enable_jit
        self.jit = jit

        self._names = None
        self._treedef = None
        self._compiled_loss_grad = None
        self._compiled_operator = None
        self._compiled_operator_grad = None

    # -- State (de)construction --------------------------------------------

    def _capture_structure(self, state):
        if self._treedef is None:
            arrays, treedef = jax.tree_util.tree_flatten(state)
            self._treedef = treedef

    def state_from_arrays(self, arrays):
        """Functionally rebuilds a State from the flat array list (pytree
        leaves in ``arrays_from_state`` order)."""
        return jax.tree_util.tree_unflatten(self._treedef, arrays)

    # -- Core evaluation ----------------------------------------------------

    def _run_operator(self, ctx):
        ff = self.operator(ctx)
        assert isinstance(ff, (tuple, list)) and len(ff), "Operator must return a non-empty list"
        names = [f[0] if isinstance(f, tuple) else "" for f in ff]
        nonempty = [n for n in names if n]
        assert len(nonempty) == len(set(nonempty)), f"Names of fields must be unique, got {nonempty}"
        values = [f[1] if isinstance(f, tuple) else f for f in ff]
        self._names = names
        return names, values

    def _flatten_multigrid_batched(self, state, partial_out=None, partial_depth=1):
        """Flattens groups of identically-shaped MultigridFields to regular
        Fields with ONE batched interpolation ladder per group.

        The reference flattens each field separately inside ``ctx.field``
        (``src/odil/core.py:948``); batching the ladders across fields (e.g.
        u, vx, vy in velocity_from_tracer) turns many small transfer ops on
        coarse levels into few larger ones.  Differentiable; semantics
        identical.  Ladder FORM is routed by ``_MG_LADDER`` ("auto"
        default): full flattens run per field in the dense-matmul form (the
        stack's slice/concat vjp transposes were measured to cost more than
        the batching saves on the generic one-pass training path), while
        partial flattens (``partial_out`` given, the MG-fused kernel
        prologue) keep the batched coarse ladder, which measured faster
        there; both forms are bitwise-identical in value (BENCH_NOTES.md).

        partial_out: optional dict; when given (and the group is at least
        two levels deep) the Horner ladder STOPS one step early and
        partial_out[key] = (term0_array, factor0, P) where P is the level-1
        partial sum -- the contract of the MG-fused Pallas kernel
        (ops/rowwise_mg.py).  The state still receives fully flattened
        Fields so non-fused consumers (ctx.field) keep working."""
        from collections import defaultdict

        from .transfer import interp_to_finer

        domain = self.domain
        groups = defaultdict(list)
        for key, f in state.fields.items():
            if isinstance(f, MultigridField):
                sig = (
                    tuple(tuple(t.array.shape) for t in f.terms),
                    f.loc,
                    tuple(f.factors) if f.factors else None,
                    tuple(f.axes) if f.axes else None,
                    f.method,
                )
                groups[sig].append(key)
        groups = {sig: keys for sig, keys in groups.items() if len(keys) > 1}
        if not groups:
            return state
        mod = domain.mod
        new_fields = dict(state.fields)
        for keys in groups.values():
            fs = [state.fields[k] for k in keys]
            f0 = fs[0]
            nlvl = len(f0.terms)
            factors = f0.factors or domain.mg_factors or [1] * nlvl
            axes = f0.axes or domain.mg_axes
            method = f0.method or domain.mg_interp
            loc_field = "".join(l if ax else "." for l, ax in zip(f0.loc, axes))
            loc_active = "." + loc_field
            # Batch the ladder only at levels >= 1: the coarse arrays are
            # tiny (<= 1/8 of the fine size), so batching them turns many
            # sub-tile transfer ops into few -- but stacking the FINEST
            # level would materialize an (nf, T, X, Y) copy, and its
            # slice/concat transposes under jax.vjp cost several full-size
            # HBM sweeps per training step (measured ~2 ms/iter at 512^2,
            # BENCH_NOTES round 3).  The finest Horner step runs per field
            # instead, fusing into one multiply-add per field.
            perfield = _MG_LADDER == "perfield" or (
                _MG_LADDER == "auto" and partial_out is None
            )
            stop = 2 if (partial_depth >= 2 and nlvl >= 3) else 1

            def head_terms(f, stop=stop, factors=factors):
                # The un-folded fine levels handed to the MG-fused kernel:
                # (term0, factor0[, term1, factor1]) ahead of the partial.
                out = []
                for lvl in range(stop):
                    out += [f.terms[lvl].array, factors[lvl]]
                return tuple(out)

            if perfield:
                for i, k in enumerate(keys):
                    terms = [t.array for t in fs[i].terms]
                    if partial_out is not None and nlvl >= 2:
                        acc = _horner_ladder(terms, factors, loc_field, method, mod, stop)
                        partial_out[k] = head_terms(fs[i]) + (acc,)
                    else:
                        fine = _horner_ladder(terms, factors, loc_field, method, mod)
                        new_fields[k] = Field(fine, loc=f0.loc)
                continue
            # Batched form: levels >= 1 stacked across the group (index j of
            # `stacked` is level j+1, paired with factors[j+1] by slicing).
            stacked = [mod.stack([f.terms[lvl].array for f in fs]) for lvl in range(1, nlvl)]
            if partial_out is not None and nlvl >= 2:
                # Stop the Horner ladder early; the fused kernel does the
                # fused step(s) in VMEM.  depth 1: stop at level 1 (the
                # kernel fuses the finest step); depth 2 (and nlvl >= 3):
                # stop at level 2 (the kernel also fuses the level-1 step).
                # (A level-batched composed-matrix contraction was measured
                # SLOWER end to end than this stepwise ladder of tiny ops;
                # see BENCH_NOTES.md.)
                acc = _horner_ladder(stacked, factors[1:], loc_active, method, mod, stop - 1)
                for i, k in enumerate(keys):
                    partial_out[k] = head_terms(fs[i]) + (acc[i],)
                continue
            if nlvl >= 2:
                acc = _horner_ladder(stacked, factors[1:], loc_active, method, mod)
                for i, k in enumerate(keys):
                    fine = fs[i].terms[0].array * factors[0] + interp_to_finer(
                        acc[i], loc_field, method, mod
                    )
                    new_fields[k] = Field(fine, loc=f0.loc)
            else:
                for i, k in enumerate(keys):
                    new_fields[k] = Field(fs[i].terms[0].array * factors[0], loc=f0.loc)
        from .fields import State

        return State(fields=new_fields, initialized=True)

    def _constrain_fields(self, state):
        """Re-asserts the domain sharding on flattened fine-grid fields
        INSIDE jit.  ``with_sharding_constraint`` accepts uneven tiling
        (XLA pads the last shard), so node-located axes of N+1 entries --
        whose storage layout must stay replicated along their mesh axis
        (``device_put`` requires divisibility) -- genuinely shard here:
        XLA re-shards by a free local slice on entry, partitions the
        stencil rolls into collective-permutes, and transposes the entry
        reshard to an all-gather on the cotangent.  No-op without a mesh."""
        domain = self.domain
        if domain.mesh is None or not domain.partition:
            return state
        fields = dict(state.fields)
        changed = False
        for k, f in fields.items():
            # Tracers only: eager evaluation (debug mode) rejects uneven
            # constraints, and sharding propagation only matters under jit.
            if (
                isinstance(f, Field)
                and isinstance(f.array, jax.core.Tracer)
                and np.ndim(f.array) == domain.ndim
            ):
                fields[k] = Field(domain.constrain(f.array), loc=f.loc)
                changed = True
        if not changed:
            return state
        from .fields import State

        return State(fields=fields, initialized=True)

    def loss_terms(self, arrays, tracers):
        """Pure function: (arrays, tracers) -> (loss, terms, norms).

        terms[i] = mean(residual_i^2) (or the raw mean for Context.Raw);
        norms[i] = sqrt(terms[i]) uniformly.  The reference reports Raw
        terms un-rooted (``src/odil/core.py:1095``), but no reference
        example uses Raw; here Raw terms are the fused kernels'
        mean-squared residuals, so one sqrt convention keeps the reported
        residual norms identical between the fused in-loop epochs and the
        epoch_start callback (clamped at 0 for negative raw terms)."""
        mod = self.domain.mod
        partials = {} if self.mg_partial else None
        state = self._flatten_multigrid_batched(self.state_from_arrays(arrays), partial_out=partials)
        state = self._constrain_fields(state)
        ctx = Context(self.domain, state, extra=self.extra, tracers=tracers)
        ctx.mg_partials = partials or {}
        _, values = self._run_operator(ctx)
        terms = [mod.mean(v.value) if isinstance(v, Context.Raw) else mod.mean(mod.square(v)) for v in values]
        loss = sum(terms)
        norms = [mod.sqrt(mod.maximum(t, 0)) for t in terms]
        return loss, terms, norms

    def make_loss_fn(self, state, halo=False):
        """Returns (loss_fn, arrays0): the pure loss function over the flat
        array list, and the initial arrays.  loss_fn(arrays, tracers) ->
        (loss, (terms, norms)), suitable for value_and_grad inside scan.

        halo=True evaluates inside shard_map with explicit ppermute halo
        exchange over the domain mesh (halo.py) instead of relying on the
        GSPMD partitioner; requires Domain(mesh=..., partition=...)."""
        if halo:
            from .halo import make_halo_loss_fn

            return make_halo_loss_fn(self, state)
        self._capture_structure(state)
        arrays0 = self.domain.arrays_from_state(state)

        def loss_fn(arrays, tracers):
            loss, terms, norms = self.loss_terms(arrays, tracers)
            return loss, (terms, norms)

        if self.remat:
            loss_fn = jax.checkpoint(loss_fn)
        return loss_fn, arrays0

    def make_loss_grad_fn(
        self, state, halo=False, interpret=None, extra_partition=None,
        halo_fuse=None,
    ):
        """Optimizer-path product: a pure function
        ``fn(arrays, tracers) -> ((loss, (terms, norms)), grads)`` -- the
        exact signature of ``jax.value_and_grad(loss_fn, has_aux=True)``.

        When the operator carries a ``loss_and_grads`` attribute (a fused
        Pallas pass producing the loss terms and their gradients together,
        e.g. models/veltracer._mg_loss_and_grads), the problem runs
        mg_partial, and the dtype is 32-bit (Mosaic cannot lower 64-bit
        kernels), the forward kernel is skipped entirely: the backward
        sweep recomputes every residual row anyway, so it yields the loss
        for free.  Valid because ``loss_terms`` always composes
        loss = sum of mean-squared terms (fixed term weights).  Returns
        None when no fused path applies -- callers fall back to
        ``jax.value_and_grad(make_loss_fn(...))``.

        halo=True builds the shard_map form instead (one per-shard kernel
        on halo-extended local blocks, halo.make_halo_loss_grad_fn): the
        generic one-pass for any operator whose kernels run through
        ``ctx.rowwise_terms``, with the MG-fused per-shard kernel as the
        ``halo_fuse="mg"`` alternative (measured slower at halo
        geometries; see make_halo_loss_grad_fn).

        Routes, most-fused first: (1) the multigrid-partial fused pass
        (operator.loss_and_grads, also fusing the finest Horner step);
        (2) the GENERIC one-pass for any operator whose kernels run
        through ``ctx.rowwise_terms`` (deferred-call replay +
        ops/rowwise.rowwise_loss_and_grads; non-kernel terms keep exact
        gradients through the same ``jax.vjp``)."""
        if halo:
            from .halo import make_halo_loss_grad_fn

            return make_halo_loss_grad_fn(
                self, state, extra_partition=extra_partition,
                interpret=interpret, fuse=halo_fuse,
            )
        fn = self._make_mg_loss_grad_fn(state)
        if fn is not None:
            return fn
        return self._make_onepass_loss_grad_fn(state, interpret=interpret)

    def _make_mg_loss_grad_fn(self, state):
        fused = getattr(self.operator, "loss_and_grads", None)
        if (
            fused is None
            or not self.mg_partial
            or np.dtype(self.domain.dtype).itemsize > 4
        ):
            return None
        self._capture_structure(state)
        arrays0 = self.domain.arrays_from_state(state)
        probe = {}
        self._flatten_multigrid_batched(self.state_from_arrays(arrays0), partial_out=probe)
        if not probe:
            return None  # multigrid off / nothing grouped: no partials.
        supported = getattr(fused, "supported", None)
        if supported is not None and not supported(
            tuple(v[0].shape for v in probe.values()), self.domain.dtype
        ):
            return None  # e.g. VMEM-fit gate for 512^2+ planes.
        # Fusion depth: operators may fuse >1 Horner step (partial_depth
        # attribute; callable variants decide per shapes/dtype).
        depth = getattr(fused, "partial_depth", 1)
        if callable(depth):
            depth = depth(tuple(v[0].shape for v in probe.values()), self.domain.dtype)
        if depth >= 2:
            probe2 = {}
            self._flatten_multigrid_batched(
                self.state_from_arrays(arrays0), partial_out=probe2, partial_depth=2
            )
            probe = probe2
        # Partial tuples alternate (traced array, static factor, ...):
        # (t0, f0, P1) at depth 1, (t0, f0, t1, f1, P2) at depth 2.
        statics = {k: tuple(v[1::2]) for k, v in probe.items()}
        mod = self.domain.mod

        def loss_grad_fn(arrays, tracers):
            def prologue(arrs):
                partials = {}
                self._flatten_multigrid_batched(
                    self.state_from_arrays(arrs), partial_out=partials,
                    partial_depth=depth,
                )
                return {k: tuple(v[0::2]) for k, v in partials.items()}

            parts, vjp_pro = jax.vjp(prologue, arrays)
            state_v = self.state_from_arrays(arrays)
            ctx = Context(self.domain, state_v, extra=self.extra, tracers=tracers)

            def interleave(traced, facs):
                out = []
                for i, a in enumerate(traced):
                    out.append(a)
                    if i < len(facs):
                        out.append(facs[i])
                return tuple(out)

            ctx.mg_partials = {
                k: interleave(traced, statics[k]) for k, traced in parts.items()
            }
            terms, dparts = fused(ctx)
            loss = sum(terms)
            norms = [mod.sqrt(t) for t in terms]
            (grads,) = vjp_pro({k: tuple(dparts[k]) for k in parts})
            return (loss, (list(terms), norms)), grads

        return loss_grad_fn

    def _make_onepass_loss_grad_fn(self, state, interpret=None):
        """Generic one-pass fused loss+grad: works for ANY operator whose
        kernel terms come through ``ctx.rowwise_terms`` (wave, heat with
        NeuralNet params and imposed data, veltracer without multigrid
        partials).  The operator runs once in deferred mode inside
        ``jax.vjp``: kernel calls record their traced inputs and return
        placeholders, non-kernel terms (scalar penalties, weight
        regularizers) come out as plain values.  Each recorded call then
        runs the one-pass backward kernel (rowwise_loss_and_grads: per-term
        sums + cotangents in one sweep, no forward kernel), and all
        cotangents -- kernel fields/params plus the analytic mean-square
        cotangents of the non-kernel terms -- fold back through the single
        ``jax.vjp``.  Valid because ``loss_terms`` always composes
        loss = sum of per-term means with fixed weights.

        Returns None when no kernel call is recorded or any call falls
        outside the kernel envelope (off-TPU unless ``interpret=True``,
        64-bit dtype, streaming variant, beyond-VMEM working set); callers
        fall back to ``jax.value_and_grad``."""
        self._capture_structure(state)
        arrays0 = self.domain.arrays_from_state(state)
        from .ops.rowwise import _on_tpu

        probe_recs = []

        def probe(arrays, tracers):
            st = self._flatten_multigrid_batched(self.state_from_arrays(arrays))
            ctx = Context(self.domain, st, extra=self.extra, tracers=tracers)
            ctx.rowwise_defer = True
            self._run_operator(ctx)
            probe_recs.extend(ctx.rowwise_deferred)
            return 0.0

        try:
            jax.eval_shape(probe, arrays0, self.tracers)
        except Exception:
            return None
        if not probe_recs or any(r["stream"] for r in probe_recs):
            return None
        if interpret is None:
            from .ops.rowwise import _FORCE_TILE, onepass_supported

            if (
                not _on_tpu() or np.dtype(self.domain.dtype).itemsize > 4
            ) and not _FORCE_TILE:
                return None
            for r in probe_recs:
                if r.get("interpret") is not None:
                    continue  # Call-forced interpreter/compile mode always runs.
                if not onepass_supported(
                    r["fields"], r["params"], r["data"], r["consts"],
                    r["nterms"], r["hist"], halox=r.get("halox"),
                ):
                    return None
        from .ops.rowwise import rowwise_loss_and_grads

        mod = self.domain.mod

        def loss_grad_fn(arrays, tracers):
            recs = []
            layout = []

            def split(arrs):
                st = self._flatten_multigrid_batched(self.state_from_arrays(arrs))
                ctx = Context(self.domain, st, extra=self.extra, tracers=tracers)
                ctx.rowwise_defer = True
                _, values = self._run_operator(ctx)
                del recs[:], layout[:]
                recs.extend(ctx.rowwise_deferred)
                others = []
                for v in values:
                    if isinstance(v, Context.Raw):
                        if getattr(v, "deferred", None) is not None:
                            layout.append(("k",) + v.deferred)
                        else:
                            layout.append(("raw", len(others)))
                            others.append(v.value)
                    else:
                        layout.append(("sq", len(others)))
                        others.append(v)
                kin = tuple(
                    (r["fields"], r["params"], r["data"], r["consts"]) for r in recs
                )
                return kin, tuple(others)

            (kin, others), vjp_split = jax.vjp(split, arrays)

            kterms = {}
            dkin = []
            for idx, r in enumerate(recs):
                flds, prms, dat, cns = kin[idx]
                cells = float(np.prod(flds[0].shape))
                # The call's own interpret= (recorded by ctx.rowwise_terms)
                # overrides the builder's, matching the forward-loss path.
                call_interp = r.get("interpret")
                out = rowwise_loss_and_grads(
                    r["row_fn"], flds, params=prms, data=dat, consts=cns,
                    nterms=r["nterms"], hist=r["hist"],
                    interpret=interpret if call_interp is None else call_interp,
                    block_rows=r["block_rows"], gscale=1.0 / cells,
                    halox=r.get("halox"),
                )
                assert out is not None, "one-pass kernel declined at trace time"
                sums, dfields, dparams = out
                for t in range(r["nterms"]):
                    kterms[(idx, t)] = sums[t] / cells
                dkin.append(
                    (
                        tuple(dfields),
                        tuple(dparams),
                        tuple(jnp.zeros_like(d) for d in dat),
                        tuple(jnp.zeros_like(c) for c in cns),
                    )
                )

            d_others = []
            oterms = []
            for kind_j in layout:
                if kind_j[0] == "k":
                    continue
                v = others[kind_j[1]]
                numel = float(np.prod(jnp.shape(v))) or 1.0
                if kind_j[0] == "raw":
                    oterms.append(mod.mean(v))
                    d_others.append(jnp.full(jnp.shape(v), 1.0 / numel, jnp.result_type(v)))
                else:
                    oterms.append(mod.mean(mod.square(v)))
                    d_others.append(2.0 * v / numel)

            (grads,) = vjp_split((tuple(dkin), tuple(d_others)))

            terms = []
            oi = iter(oterms)
            for kind_j in layout:
                if kind_j[0] == "k":
                    terms.append(kterms[(kind_j[1], kind_j[2])])
                else:
                    terms.append(next(oi))
            loss = sum(terms)
            norms = [mod.sqrt(mod.maximum(t, 0)) for t in terms]
            return (loss, (terms, norms)), grads

        return loss_grad_fn

    def eval_loss_grad(self, state):
        """Evaluates loss, gradients, and residual norms on `state`.

        Returns (loss, grads, terms, names, norms); loss/terms/norms as
        numpy scalars, grads as device arrays in state-array order."""
        if not state.initialized:
            raise RuntimeError("Uninitialized state, use `state = domain.init_state(state)`")
        self._capture_structure(state)
        if self._compiled_loss_grad is None:

            def func(arrays, tracers):
                def loss_with_aux(a, t):
                    loss, terms, norms = self.loss_terms(a, t)
                    return loss, (terms, norms)

                (loss, (terms, norms)), grads = jax.value_and_grad(loss_with_aux, has_aux=True)(
                    arrays, tracers
                )
                return loss, grads, terms, norms

            self._compiled_loss_grad = jax.jit(func) if self.jit else func

        arrays = self.domain.arrays_from_state(state)
        loss, grads, terms, norms = self._compiled_loss_grad(arrays, self.tracers)
        if self._names is None:
            # Trigger one eager trace to capture names (cache hit path).
            self.loss_terms(arrays, self.tracers)
        loss = np.array(loss)
        terms = list(map(np.array, terms))
        norms = list(map(np.array, norms))
        return loss, grads, terms, list(self._names), norms

    def eval_operator(self, state):
        """Evaluates the residual fields. Returns (values, names)."""
        if not state.initialized:
            raise RuntimeError("Uninitialized state, use `state = domain.init_state(state)`")
        self._capture_structure(state)
        if self._compiled_operator is None:

            def func(arrays, tracers):
                st = self._flatten_multigrid_batched(self.state_from_arrays(arrays))
                ctx = Context(self.domain, st, extra=self.extra, tracers=tracers)
                _, values = self._run_operator(ctx)
                return [v.value if isinstance(v, Context.Raw) else v for v in values]

            self._compiled_operator = jax.jit(func) if self.jit else func
        arrays = self.domain.arrays_from_state(state)
        values = self._compiled_operator(arrays, self.tracers)
        if self._names is None:
            self.loss_terms(arrays, self.tracers)
        return values, list(self._names)

    # -- Newton linearization ----------------------------------------------

    def _discover_descriptors(self, state):
        """Runs the operator once in distinct-shift mode to discover which
        (key, shift, loc) samples and which parameter unknowns it reads."""
        ctx = Context(self.domain, state, extra=self.extra, tracers=self.tracers, distinct_shift=True)
        names, values = self._run_operator(ctx)
        grid_descs = list(ctx.desc_to_array.keys())
        # Drop source descriptors of MultigridFields (constants for Newton).
        grid_descs = [d for d in grid_descs if isinstance(state.fields[d[0]], Field)]
        param_keys = list(ctx.key_to_array_jac.keys())
        seed = {d: ctx.desc_to_array[d] for d in grid_descs}
        param_seed = {k: ctx.key_to_array_jac[k] for k in param_keys}
        return names, values, seed, param_seed

    def eval_operator_grad(self, state):
        """Evaluates residuals and their gradients w.r.t. stencil samples.

        Returns (values, grads, names) where grads[i] maps descriptors
        (key, shift, loc) to the gradient array of sum(values[i]) w.r.t.
        that sample, and (key, None, None) to full-Jacobian blocks for
        Array/NeuralNet unknowns.  Native JAX (the reference supports this
        for TF only, ``src/odil/core.py:1363``)."""
        if not state.initialized:
            raise RuntimeError("Uninitialized state, use `state = domain.init_state(state)`")
        self._capture_structure(state)
        names, _, grid_seed, param_seed = self._discover_descriptors(state)

        def replay(grid_bindings, param_bindings):
            bindings = dict(grid_bindings)
            bindings.update(param_bindings)
            ctx = Context(
                self.domain,
                state,
                extra=self.extra,
                tracers=self.tracers,
                distinct_shift=True,
                bindings=bindings,
            )
            _, values = self._run_operator(ctx)
            for v in values:
                assert not isinstance(v, Context.Raw), "Raw terms are not supported by Newton"
            return values

        nterms = len(names)

        def compute(grid_seed, param_seed):
            values = replay(grid_seed, param_seed)
            grads = []
            for i in range(nterms):
                gsum = jax.grad(lambda gb: sum_all(replay(gb, param_seed)[i]))(grid_seed)
                entry = dict(gsum)
                if param_seed:
                    jac = jax.jacrev(lambda pb: replay(grid_seed, pb)[i])(param_seed)
                    for key, blocks in jac.items():
                        entry[key] = blocks
                grads.append(entry)
            return values, grads

        def sum_all(x):
            return self.domain.mod.sum(x)

        values, grads = (jax.jit(compute) if self.jit else compute)(grid_seed, param_seed)
        return values, grads, names

    def linearize(self, state, modsp=None):
        """Assembles V0 and the global sparse Jacobian M of the operator:
            operator(V) ~= M @ (V - V0) + operator(V0)
        over the flattened state vector.  Host-side scipy assembly; the
        gradient arrays themselves come from the device."""
        if not state.initialized:
            raise RuntimeError("Uninitialized state, use `state = domain.init_state(state)`")
        if modsp is None:
            import scipy.sparse as modsp

        domain = self.domain
        values, grads, names = self.eval_operator_grad(state)
        values = [np.asarray(v) for v in values]

        # Flat-vector offsets per unknown key, in pack order.
        key_to_offset, key_to_size = dict(), dict()
        offset = 0
        for key, field in state.fields.items():
            size = sum(math.prod(a.shape) for a in field_arrays(field))
            key_to_offset[key] = offset
            key_to_size[key] = size
            offset += size
        size_all = offset

        def stencil_columns(key, shift, loc, field):
            """Column indices for a shifted/retargeted grid sample, built by
            transporting the flat index grid along the same pad/roll/trim
            path as the sample itself.  Padded entries get -1 (no unknown)."""
            cols = key_to_offset[key] + np.arange(key_to_size[key]).reshape(field.array.shape)
            pad_width = [(1, 0) if (lf == "c" and l == "n") else (0, 0) for lf, l in zip(field.loc, loc)]
            if any(w != (0, 0) for w in pad_width):
                cols = np.pad(cols, pad_width, mode="constant", constant_values=-1)
            if any(shift):
                cols = np.roll(cols, [-s for s in shift], range(domain.ndim))
            trim = [slice(0, -1) if (lf == "n" and l == "c") else slice(None) for lf, l in zip(field.loc, loc)]
            cols = cols[tuple(trim)]
            return cols

        matrices, vectors = [], []
        for name, value, grad in zip(names, values, grads):
            nrows = math.prod(value.shape)
            mshape = (nrows, size_all)
            matrix = modsp.csr_matrix(mshape, dtype=domain.dtype)
            for desc, garray in grad.items():
                key, shift, loc = desc
                if garray is None:
                    continue
                field = state.fields[key]
                if shift is None:
                    # Array / NeuralNet unknowns: dense Jacobian blocks.
                    blocks = garray if isinstance(garray, (list, tuple)) else [garray]
                    dense = np.concatenate(
                        [np.asarray(b).reshape(nrows, -1) for b in blocks], axis=1
                    )
                    m = modsp.csr_matrix(dense)
                    m = modsp.csr_matrix(
                        (m.data, m.indices + key_to_offset[key], m.indptr), shape=mshape
                    )
                    matrix = matrix + m
                    continue
                if not isinstance(field, Field):
                    raise TypeError(f"Expected Field, got {type(field).__name__} for '{key}'")
                garray = np.asarray(garray)
                if not np.any(garray):
                    continue
                cols = stencil_columns(key, shift, loc, field)
                if garray.shape == value.shape:
                    rows = np.arange(nrows)
                elif value.shape == ():
                    rows = np.zeros(cols.size, dtype=int)
                else:
                    raise ValueError(
                        f"Residual '{name}' shape {value.shape} incompatible with "
                        f"sample shape {garray.shape}; Newton requires pointwise terms"
                    )
                cols = cols.reshape(-1)
                data = garray.reshape(-1)
                valid = cols >= 0
                m = modsp.csr_matrix(
                    (data[valid], (np.asarray(rows).reshape(-1)[valid], cols[valid])),
                    shape=mshape,
                    dtype=domain.dtype,
                )
                matrix = matrix + m
            matrices.append(matrix)
            vectors.append(value.reshape(-1))

        return np.concatenate(vectors, axis=0), modsp.vstack(matrices).tocsr()

    # -- Matrix-free products (Gauss-Newton) --------------------------------

    def residual_fn(self, state, halo=False):
        """Returns (f, x0): f(packed) -> concatenated residual vector as a
        pure jittable function of the packed unknown vector; x0 the current
        packed state.  The Jacobian-vector products jvp/vjp of f are the
        matrix-free substitutes for `linearize` (SURVEY.md §7).

        halo=True evaluates inside shard_map with explicit ppermute halo
        exchange (halo.make_halo_residual_fn): the same residual map up to
        a fixed permutation plus structurally-zero ghost rows, so the
        Gauss-Newton normal equations are unchanged."""
        if halo:
            from .halo import make_halo_residual_fn

            return make_halo_residual_fn(self, state)
        self._capture_structure(state)
        domain = self.domain
        arrays0 = domain.arrays_from_state(state)
        shapes = [tuple(a.shape) for a in arrays0]
        sizes = [math.prod(s) for s in shapes]
        bounds = np.cumsum(sizes)[:-1]
        mod = domain.mod

        def unpack(x):
            parts = mod.xp.split(x, bounds)
            return [mod.reshape(p, s) for p, s in zip(parts, shapes)]

        meta = {}

        def f_values(x):
            arrays = unpack(x)
            st = self._flatten_multigrid_batched(self.state_from_arrays(arrays))
            st = self._constrain_fields(st)
            ctx = Context(domain, st, extra=self.extra, tracers=self.tracers)
            names, values = self._run_operator(ctx)
            meta["names"] = list(names)
            return [v.value if isinstance(v, Context.Raw) else v for v in values]

        def f(x):
            return mod.concatenate([mod.flatten(v) for v in f_values(x)], axis=0)

        x0 = mod.concatenate([mod.flatten(a) for a in arrays0], axis=0)
        # Term metadata (names, flat sizes) for callers that report per-term
        # residual norms straight from f(x) slices -- lets the Gauss-Newton
        # driver reuse the step's own residual instead of a second
        # eval_loss_grad pass per epoch.
        term_shapes = jax.eval_shape(f_values, jax.ShapeDtypeStruct(x0.shape, x0.dtype))
        f.term_names = meta["names"]
        f.term_sizes = [int(math.prod(s.shape)) for s in term_shapes]
        return f, x0

    def get_context(self, state):
        return Context(self.domain, state, extra=self.extra, tracers=self.tracers)
