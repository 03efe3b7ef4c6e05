"""Fused row-wise residual + loss-reduction Pallas kernel ("FlashODIL").

The hot loop of every ODIL problem is: evaluate stencil residuals over a
space-time grid, square, reduce to per-term means, and backpropagate.  Under
plain XLA each stencil shift materializes a full-array copy in HBM and the
backward pass doubles that traffic.  This kernel streams the grid row-by-row
(leading = time axis) through VMEM instead:

- forward: each program loads the rows of every field needed by one residual
  row (time offsets 0..-hist, periodic wrap like ``jnp.roll``), evaluates the
  user's residual function entirely in VMEM, and accumulates per-term
  sums-of-squares into a single resident output block -- HBM traffic is one
  read of the state per evaluation.
- backward: flash-attention-style recompute.  Each program re-evaluates the
  residual rows that read its output row and obtains exact cotangents by
  calling ``jax.vjp`` on the row function *inside the kernel* -- no
  hand-derived adjoint stencils, any row function is supported.

The row function sees periodic wraparound across the time axis, exactly
matching ``ctx.field`` shift semantics (reference ``src/odil/core.py:963``),
so boundary masking stays the author's responsibility as usual.

API (see ``rowwise_loss_terms`` for the high-level entry):
    sums = rowwise_sumsq(row_fn, nterms, hist, interpret, fields, consts)
      fields: tuple of arrays shaped (T, *plane) -- the unknowns.
      consts: tuple of arrays shaped (*plane); not differentiated.
      row_fn(it, T, rows, consts) -> tuple of nterms residual planes, where
              rows[f][o] is field f at time row (it - o) % T, o in 0..hist.
      returns: (nterms,) array of sum(residual_k**2) over the whole grid.

Gradients flow to `fields` only.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["rowwise_sumsq", "rowwise_loss_terms"]


def _on_tpu():
    return jax.default_backend() == "tpu"


def _row_spec(shape, T, offset):
    """BlockSpec selecting time row (i + offset) mod T of a (T, *plane) array."""
    ndim = len(shape)
    zeros = (0,) * (ndim - 1)

    def index_map(i):
        return ((i + offset) % T,) + zeros

    return pl.BlockSpec((1,) + tuple(shape[1:]), index_map)


def _const_spec(shape):
    ndim = len(shape)
    return pl.BlockSpec(tuple(shape), lambda i: (0,) * ndim)


def _forward(row_fn, nterms, hist, interpret, fields, consts):
    T = fields[0].shape[0]
    nf = len(fields)

    def kernel(*refs):
        field_refs = refs[: nf * (hist + 1)]
        const_refs = refs[nf * (hist + 1) : -1]
        out_ref = refs[-1]
        i = pl.program_id(0)
        rows = tuple(
            tuple(field_refs[f * (hist + 1) + o][0] for o in range(hist + 1)) for f in range(nf)
        )
        consts_v = tuple(r[...] for r in const_refs)
        res = row_fn(i, T, rows, consts_v)
        sums = jnp.stack([jnp.sum(r * r) for r in res])

        # The (1, nterms) output block is resident across the sequential TPU
        # grid; initialize at the first program and accumulate.
        @pl.when(i == 0)
        def _():
            out_ref[0, :] = jnp.zeros((nterms,), out_ref.dtype)

        out_ref[0, :] += sums

    in_specs = []
    for f in fields:
        for o in range(hist + 1):
            in_specs.append(_row_spec(f.shape, T, -o))
    for c in consts:
        in_specs.append(_const_spec(c.shape))

    inputs = [f for f in fields for _ in range(hist + 1)] + list(consts)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nterms), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, nterms), fields[0].dtype),
        interpret=interpret,
    )(*inputs)
    return out[0]


def _backward(row_fn, nterms, hist, interpret, fields, consts, g):
    """d(sum_k g[k] * S[k]) / d(fields).

    Program i accumulates, for each residual row j = (i + o) % T that reads
    row i (offset o = 0..hist), the vjp cotangent of that row's residuals
    with cotangent 2 * g[k] * residual_k[j]."""
    T = fields[0].shape[0]
    nf = len(fields)
    span = 2 * hist + 1  # Offsets -hist..hist relative to program row.
    gmat = jnp.reshape(g, (1, nterms))

    def kernel(*refs):
        field_refs = refs[: nf * span]
        const_refs = refs[nf * span : nf * span + len(consts)]
        g_ref = refs[nf * span + len(consts)]
        out_refs = refs[nf * span + len(consts) + 1 :]

        i = pl.program_id(0)
        consts_v = tuple(r[...] for r in const_refs)
        gvec = g_ref[0]

        def plane(f, d):
            # Row (i + d) % T of field f; d in -hist..hist.
            return field_refs[f * span + (d + hist)][0]

        accs = [jnp.zeros(fields[f].shape[1:], fields[f].dtype) for f in range(nf)]
        for o in range(hist + 1):
            j = (i + o) % T

            def residuals_of(*flat_rows, _j=j):
                rows = tuple(
                    tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1)) for f in range(nf)
                )
                return tuple(row_fn(_j, T, rows, consts_v))

            flat_rows = tuple(plane(f, o - m) for f in range(nf) for m in range(hist + 1))
            res, vjp_fn = jax.vjp(residuals_of, *flat_rows)
            w = tuple(2.0 * gvec[k] * res[k] for k in range(nterms))
            cots = vjp_fn(w)
            # Only the offset-o sample of residual row j is our row i.
            for f in range(nf):
                accs[f] = accs[f] + cots[f * (hist + 1) + o]
        for f in range(nf):
            out_refs[f][0] = accs[f]

    in_specs = []
    for f in fields:
        for d in range(-hist, hist + 1):
            in_specs.append(_row_spec(f.shape, T, d))
    for c in consts:
        in_specs.append(_const_spec(c.shape))
    in_specs.append(_const_spec((1, nterms)))

    out_specs = [_row_spec(f.shape, T, 0) for f in fields]
    out_shapes = [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in fields]

    inputs = [f for f in fields for _ in range(span)] + list(consts) + [gmat]
    grads = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)
    return tuple(grads)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def rowwise_sumsq(row_fn, nterms, hist, interpret, fields, consts):
    return _forward(row_fn, nterms, hist, interpret, fields, consts)


def _fwd_rule(row_fn, nterms, hist, interpret, fields, consts):
    out = _forward(row_fn, nterms, hist, interpret, fields, consts)
    return out, (fields, consts)


def _bwd_rule(row_fn, nterms, hist, interpret, residuals, g):
    fields, consts = residuals
    dfields = _backward(row_fn, nterms, hist, interpret, fields, consts, g)
    dconsts = tuple(jnp.zeros_like(c) for c in consts)
    return dfields, dconsts


rowwise_sumsq.defvjp(_fwd_rule, _bwd_rule)


def rowwise_loss_terms(row_fn, fields, consts=(), nterms=1, hist=1, interpret=None):
    """Per-term mean-squared losses through the fused kernel.

    Equivalent to ``[mean(residual_k**2)]`` with residuals over the full
    (T, *plane) grid.  1-D planes are padded to 2-D internally to satisfy
    TPU tiling; pass `interpret=True` to force the Pallas interpreter
    (automatic off-TPU)."""
    fields = tuple(fields)
    consts = tuple(consts)
    if interpret is None:
        interpret = not _on_tpu()
    T = fields[0].shape[0]
    plane = int(np.prod(fields[0].shape[1:]))

    if fields[0].ndim == 2:
        # (T, N) -> (T, 1, N): TPU block shapes need a unit sublane axis.
        fields2 = tuple(f[:, None, :] for f in fields)
        consts2 = tuple(c[None, :] if c.ndim == 1 else c for c in consts)

        def row_fn2(it, T_, rows, cons):
            rows1 = tuple(tuple(p[0] for p in f_rows) for f_rows in rows)
            cons1 = tuple(c[0] if c.ndim == 2 and c.shape[0] == 1 else c for c in cons)
            return tuple(r[None, :] for r in row_fn(it, T_, rows1, cons1))

        sums = rowwise_sumsq(row_fn2, nterms, hist, interpret, fields2, consts2)
    else:
        sums = rowwise_sumsq(row_fn, nterms, hist, interpret, fields, consts)
    return [sums[k] / (T * plane) for k in range(nterms)]
