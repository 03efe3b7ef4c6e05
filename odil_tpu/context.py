"""Context: the user operator's window onto the state.

Reproduces the reference contract (``src/odil/core.py:865-990``):

- ``ctx.field(key, *shift, loc=..., frozen=...)`` resolves one stencil
  sample: flatten a MultigridField to its fine grid, convert staggered
  location by pad/trim, apply the (periodic!) shift with ``roll``, cache by
  descriptor ``(key, shift, loc)``.
- ``ctx.neural_net(key)`` returns a pointwise-callable MLP.
- ``ctx.extra`` is static Python payload (not traced); ``ctx.tracers`` is a
  pytree of arrays that is part of the jitted signature (e.g. ``epoch``).

Two evaluation modes beyond the default:

- ``distinct_shift=True``: each (key, shift, loc) sample becomes an
  independent autodiff symbol (source is stop-gradiented), which is what
  makes per-stencil-offset Jacobian extraction possible for Newton.
- ``bindings``: a replay mode used by ``Problem.eval_operator_grad`` -- the
  sample arrays are substituted from a provided dict so JAX can
  differentiate with respect to them directly (the reference can only do
  this with TensorFlow tapes; here it works under jit).
"""

from .fields import Array, Field, MultigridField, NeuralNet
from .nn import eval_neural_net

__all__ = ["Context"]


class Context:

    class Raw:
        """Wraps a precomputed mean loss term (used verbatim, not squared)."""

        def __init__(self, value):
            self.value = value

    def __init__(
        self,
        domain,
        state,
        watch_func=None,
        extra=None,
        tracers=None,
        distinct_shift=False,
        bindings=None,
    ):
        self.domain = domain
        self.state = state
        self.watch_func = watch_func or (lambda _: None)
        self.extra = extra
        self.tracers = tracers
        self.dtype = domain.dtype
        self.mod = domain.mod
        self.distinct_shift = distinct_shift
        self.bindings = bindings
        # Filled by Problem when mg_partial=True: key -> (term0, factor0, P).
        self.mg_partials = {}
        # Recorded ctx.rowwise_terms calls: halo.py's plan discovery reads
        # these to size the per-shard halo exchanges of kernel operators.
        self.rowwise_calls = []
        # Deferred-kernel mode (Problem's generic one-pass loss+grad):
        # rowwise_terms records its full argument set here and returns
        # placeholder Raw terms instead of running the forward kernel.
        self.rowwise_defer = False
        self.rowwise_deferred = []
        # Descriptor (key, shift, loc) -> resolved sample array.
        self.desc_to_array = dict()
        # Descriptors needing a full Jacobian (Array / NeuralNet unknowns).
        self.key_to_array_jac = dict()
        # Domain aliases, so operators can write ctx.step('x') etc.
        self.step = domain.step
        self.size = domain.size
        self.indices = domain.indices
        self.points = domain.points

    def cast(self, value, dtype=None):
        return self.mod.cast(value, dtype or self.dtype)

    def _resolve_sample(self, field, shift, loc):
        """Builds the sample array for a grid field: location change by
        pad/trim, shift by periodic roll."""
        mod = self.mod
        ndim = self.domain.ndim
        shift_src = (0,) * ndim
        desc_src = None  # computed by caller
        array = self.domain.get_regular_array(field)
        if self.distinct_shift:
            # Each shifted sample is an independent symbol; detach the source.
            array = mod.stop_gradient(array)
        # Cell field read at node location: prepend one zero layer.
        pad_width = [(1, 0) if (lf == "c" and l == "n") else (0, 0) for lf, l in zip(field.loc, loc)]
        if any(w != (0, 0) for w in pad_width):
            array = mod.pad(array, pad_width=pad_width, mode="constant")
        if tuple(shift) != shift_src:
            array = mod.roll(array, [-s for s in shift], range(ndim))
        # Node field read at cell location: drop the trailing layer.
        trim = [slice(0, -1) if (lf == "n" and l == "c") else slice(None) for lf, l in zip(field.loc, loc)]
        if any(s != slice(None) for s in trim):
            array = array[tuple(trim)]
        return array

    def field(self, key, *shift, loc=None, frozen=False):
        domain = self.domain
        mod = self.mod
        field = self.state.fields[key]
        if not isinstance(field, (Field, MultigridField, Array)):
            raise TypeError(f"Expected Field or MultigridField, got {type(field).__name__} for '{key}'")

        if isinstance(field, Array):
            if len(shift):
                raise RuntimeError("Array requires an empty shift")
            desc = (key, None, None)
            if self.bindings is not None and desc in self.bindings:
                array = self.bindings[desc]
            else:
                array = field.array
            self.watch_func(array)
            self.key_to_array_jac[desc] = array
            return mod.stop_gradient(array) if frozen else array

        shift = tuple(shift) or (0,) * domain.ndim
        if len(shift) != domain.ndim:
            raise RuntimeError(f"Expected {domain.ndim} shift components, got shift={shift}")
        loc = loc or field.loc
        desc = (key, shift, loc)
        if self.bindings is not None and desc in self.bindings:
            array = self.bindings[desc]
            self.desc_to_array[desc] = array
            return mod.stop_gradient(array) if frozen else array
        if desc in self.desc_to_array:
            array = self.desc_to_array[desc]
        else:
            if not self.distinct_shift:
                # Watch the underlying state arrays (Newton bookkeeping noop
                # in gradient mode; kept for API parity).
                if isinstance(field, Field):
                    self.watch_func(field.array)
                elif isinstance(field, MultigridField):
                    for t in field.terms:
                        self.watch_func(t.array)
            array = self._resolve_sample(field, shift, loc)
            if self.distinct_shift and isinstance(field, Field):
                self.watch_func(array)
            self.desc_to_array[desc] = array
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
        """Per-term mean-squared losses of ``row_fn`` over the named grid
        fields through the fused row-wise Pallas kernel (ops/rowwise.py),
        returned as a list of ``Context.Raw`` terms.

        This is the Context *service* form of ``rowwise_loss_terms``: under
        the default evaluation it is exactly ``rowwise_loss_terms(row_fn,
        [ctx.field(k) for k in keys], ...)``, but in halo/shard_map
        evaluation (``--halo``, odil_tpu/halo.py) the same operator code runs
        the kernel per device shard on halo-extended local blocks with the
        residuals of halo/duplicated rows masked out of the loss sums --
        declare ``hist`` (backward history reach along the leading/time
        axis) and ``halox`` (stencil reach along partitioned plane axes)
        honestly, they size the exchanges."""
        fields = tuple(self.field(k) for k in keys)
        self.rowwise_calls.append(
            {"keys": tuple(keys), "hist": hist, "halox": halox, "nterms": nterms}
        )
        if self.rowwise_defer:
            # Generic one-pass mode (Problem.make_loss_grad_fn): record the
            # full call -- traced arrays AND the static row function/config
            # -- and return placeholders; the caller runs the one-pass
            # backward kernel (rowwise_loss_and_grads) on the recorded
            # inputs and transposes everything through jax.vjp.
            idx = len(self.rowwise_deferred)
            self.rowwise_deferred.append(
                dict(
                    row_fn=row_fn,
                    keys=tuple(keys),
                    fields=fields,
                    params=tuple(params),
                    data=tuple(data),
                    consts=tuple(consts),
                    nterms=nterms,
                    hist=hist,
                    halox=halox,
                    interpret=interpret,
                    block_rows=block_rows,
                    stream=stream,
                )
            )
            out = []
            for t in range(nterms):
                r = Context.Raw(None)
                r.from_rowwise = True
                r.deferred = (idx, t)
                out.append(r)
            return out
        from .ops.rowwise import rowwise_loss_terms

        terms = rowwise_loss_terms(
            row_fn,
            fields,
            params=params,
            data=data,
            consts=consts,
            nterms=nterms,
            hist=hist,
            halox=halox,
            interpret=interpret,
            block_rows=block_rows,
            stream=stream,
        )
        out = []
        for t in terms:
            r = Context.Raw(t)
            # Marks the term as kernel-produced: halo.py accepts these
            # (it reroutes the call to the sharded kernel), while hand-made
            # Raw means stay rejected there.
            r.from_rowwise = True
            out.append(r)
        return out

    def neural_net(self, key, frozen=False):
        field = self.state.fields[key]
        if not isinstance(field, NeuralNet):
            raise TypeError(f"Expected NeuralNet, got {type(field).__name__} for '{key}'")
        desc = (key, None, None)
        if self.bindings is not None and desc in self.bindings:
            params = self.bindings[desc]
            n = len(field.weights)
            net = NeuralNet(
                list(params[:n]),
                list(params[n:]),
                func_in=field.func_in,
                func_out=field.func_out,
                activation=field.activation,
            )
        else:
            net = field
        arrays = list(net.weights) + list(net.biases)
        self.watch_func(arrays)
        if self.distinct_shift or self.bindings is not None:
            self.key_to_array_jac[desc] = arrays
        return lambda *inputs: eval_neural_net(net, inputs, self.mod, frozen=frozen)
