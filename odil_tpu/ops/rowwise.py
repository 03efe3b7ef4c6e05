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
  hand-derived adjoint stencils, any row function is supported, including
  neural networks evaluated pointwise on the rows (their weight gradients
  are accumulated across the sequential grid in a resident block).

The row function sees periodic wraparound across the time axis, exactly
matching ``ctx.field`` shift semantics (reference ``src/odil/core.py:963``),
so boundary masking stays the author's responsibility as usual.

Input groups:
  fields: tuple of (T, *plane) arrays -- the unknowns; differentiated; the
          row function receives offsets 0..hist with periodic wrap.
  params: tuple of arrays of any shape (e.g. NeuralNet weights);
          differentiated; broadcast to every row.
  data:   tuple of (T, *plane) arrays read at offset 0 only (masks,
          measurements); not differentiated.
  consts: tuple of (*plane) or (1, 1)-scalar arrays; not differentiated.

row_fn(it, T, rows, data_rows, params, consts) -> tuple of nterms residual
planes; rows[f][o] is field f at time row (it - o) % T.

High-level entry: ``rowwise_loss_terms`` (handles 1-D planes and returns
per-term mean-squared losses).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "rowwise_sumsq",
    "rowwise_loss_terms",
    "rowwise_loss_sums",
    "rowwise_loss_and_grads",
    "onepass_supported",
]



def _sumsq_vec(res):
    """(nterms,) per-term sums of squares without 0-d intermediates
    (Mosaic cannot squeeze 64-bit values to scalars)."""
    return jnp.concatenate(
        [jnp.sum(r * r, axis=tuple(range(r.ndim)), keepdims=True).reshape(1) for r in res]
    )


def _weights_of(gvec, res, nterms):
    """w[k] = 2 * g[k] * res[k] via (1,)-shaped g slices (no f64 scalars)."""
    return tuple(2.0 * gvec[k : k + 1] * res[k] for k in range(nterms))

def _on_tpu():
    return jax.default_backend() == "tpu"


# Test hook: set to a tile width to force the x-tiled route (interpret mode
# off-TPU) regardless of plane size, e.g. `rowwise._FORCE_TILE = 8` in a CPU
# test of the halo x-tiled composition.
_FORCE_TILE = None


def _pick_tiled_route(fields, data, consts, hist, halox, allow_pad):
    """(tile, xpad) for the x-tiled kernel route, or None when it does not
    apply: reach undeclared, non-3D grids, data not field-shaped, non-2D
    consts, f64 on real TPU (Mosaic), or no tile width fits the VMEM
    budget.  ``allow_pad`` admits the edge-padded route for non-tileable x
    extents (the halo masked-edge contract; see rowwise_tiled.py)."""
    # halox > 8 exceeds the tiled kernels' 8-row halo-block streams
    # (rowwise_tiled._HB): decline so callers take the exact fallback.
    if halox is None or halox > 8 or fields[0].ndim != 3:
        return None
    if not all(tuple(d.shape) == tuple(fields[0].shape) for d in data):
        return None
    if not all(getattr(c, "ndim", 0) == 2 for c in consts):
        return None
    # f64 cannot lower through Mosaic; the forced (test) route runs the
    # interpreter off-TPU, where f64 is fine.
    if fields[0].dtype.itemsize > 4 and not (_FORCE_TILE and not _on_tpu()):
        return None
    if not (_on_tpu() or _FORCE_TILE):
        return None
    from .rowwise_tiled import pick_tile, pick_tile_pad

    T, X, Y = fields[0].shape
    isz = fields[0].dtype.itemsize
    tile = _FORCE_TILE or pick_tile(X, Y, isz, len(fields), len(data), len(consts), hist)
    if tile is not None and tile < X and X % tile == 0:
        return tile, None
    if allow_pad:
        if _FORCE_TILE:
            return _FORCE_TILE, -(-X // _FORCE_TILE) * _FORCE_TILE
        tw = pick_tile_pad(X, Y, isz, len(fields), len(data), len(consts) + 1, hist)
        if tw is not None:
            return tw
    return None


def _row_spec(shape, T, offset):
    """BlockSpec selecting time row (i + offset) mod T of a (T, *plane) array."""
    ndim = len(shape)
    zeros = (0,) * (ndim - 1)

    def index_map(i):
        return ((i + offset) % T,) + zeros

    return pl.BlockSpec((1,) + tuple(shape[1:]), index_map)


def _whole_spec(shape):
    ndim = len(shape)
    return pl.BlockSpec(tuple(shape), lambda i: (0,) * ndim)


def _forward(row_fn, nterms, hist, interpret, fields, params, data, consts):
    T = fields[0].shape[0]
    nf, np_, nd = len(fields), len(params), len(data)

    def kernel(*refs):
        pos = 0
        field_refs = refs[pos : pos + nf * (hist + 1)]
        pos += nf * (hist + 1)
        data_refs = refs[pos : pos + nd]
        pos += nd
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        out_ref = refs[-1]

        i = pl.program_id(0)
        rows = tuple(
            tuple(field_refs[f * (hist + 1) + o][0] for o in range(hist + 1)) for f in range(nf)
        )
        data_rows = tuple(r[0] for r in data_refs)
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)
        res = row_fn(i, T, rows, data_rows, params_v, consts_v)
        sums = _sumsq_vec(res)

        # The (1, nterms) output block stays resident across the sequential
        # TPU grid; initialize at the first program and accumulate.
        @pl.when(i == 0)
        def _():
            out_ref[0, :] = jnp.zeros((nterms,), out_ref.dtype)

        out_ref[0, :] += sums

    in_specs = (
        [_row_spec(f.shape, T, -o) for f in fields for o in range(hist + 1)]
        + [_row_spec(d.shape, T, 0) for d in data]
        + [_whole_spec(c.shape) for c in consts]
        + [_whole_spec(p.shape) for p in params]
    )
    inputs = (
        [f for f in fields for _ in range(hist + 1)] + list(data) + list(consts) + list(params)
    )
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nterms), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, nterms), fields[0].dtype),
        interpret=interpret,
    )(*inputs)
    return out[0]


def _backward(row_fn, nterms, hist, interpret, fields, params, data, consts, g,
              with_sums=False):
    """d(sum_k g[k] * S[k]) / d(fields, params).

    Field row i receives cotangents from residual rows j = (i + o) % T
    (o = 0..hist) through their offset-o sample; param gradients are
    accumulated from each program's own residual row into resident blocks.

    with_sums=True additionally accumulates the per-term sums of squares
    S[k] (each program evaluates its own residual row at offset 0 anyway),
    turning this pass into a fused one-pass loss+gradient evaluation that
    makes the forward kernel redundant for training steps."""
    T = fields[0].shape[0]
    nf, np_, nd = len(fields), len(params), len(data)
    span = 2 * hist + 1  # Offsets -hist..hist relative to the program row.
    gmat = jnp.reshape(g, (1, nterms))

    def kernel(*refs):
        pos = 0
        field_refs = refs[pos : pos + nf * span]
        pos += nf * span
        data_refs = refs[pos : pos + nd * (hist + 1)]
        pos += nd * (hist + 1)
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        pos += np_
        g_ref = refs[pos]
        out_field_refs = refs[pos + 1 : pos + 1 + nf]
        out_param_refs = refs[pos + 1 + nf : pos + 1 + nf + np_]
        out_sums_ref = refs[pos + 1 + nf + np_] if with_sums else None

        i = pl.program_id(0)
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)
        gvec = g_ref[0]

        def field_plane(f, d):
            return field_refs[f * span + (d + hist)][0]

        accs = [jnp.zeros(fields[f].shape[1:], fields[f].dtype) for f in range(nf)]
        param_accs = [jnp.zeros(p.shape, p.dtype) for p in params]
        for o in range(hist + 1):
            j = (i + o) % T
            data_rows = tuple(data_refs[d * (hist + 1) + o][0] for d in range(nd))

            def residuals_of(*args, _j=j, _data=data_rows):
                flat_rows = args[: nf * (hist + 1)]
                pv = args[nf * (hist + 1) :]
                rows = tuple(
                    tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1)) for f in range(nf)
                )
                return tuple(row_fn(_j, T, rows, _data, pv, consts_v))

            flat_rows = tuple(field_plane(f, o - m) for f in range(nf) for m in range(hist + 1))
            res, vjp_fn = jax.vjp(residuals_of, *(flat_rows + tuple(params_v)))
            w = _weights_of(gvec, res, nterms)
            cots = vjp_fn(w)
            # Only the offset-o sample of residual row j is our row i.
            for f in range(nf):
                accs[f] = accs[f] + cots[f * (hist + 1) + o]
            if o == 0:
                # Each residual row contributes its param cotangent exactly
                # once: at the program that owns it.
                for p in range(np_):
                    param_accs[p] = param_accs[p] + cots[nf * (hist + 1) + p]
                if with_sums:
                    # Residual row i is ours: accumulate its loss sums.
                    @pl.when(i == 0)
                    def _():
                        out_sums_ref[0, :] = jnp.zeros((nterms,), out_sums_ref.dtype)

                    out_sums_ref[0, :] += _sumsq_vec(res)
        for f in range(nf):
            out_field_refs[f][0] = accs[f]
        for p in range(np_):

            @pl.when(i == 0)
            def _(p=p):
                out_param_refs[p][...] = jnp.zeros(params[p].shape, params[p].dtype)

            out_param_refs[p][...] += param_accs[p]

    in_specs = (
        [_row_spec(f.shape, T, d) for f in fields for d in range(-hist, hist + 1)]
        + [_row_spec(d.shape, T, o) for d in data for o in range(hist + 1)]
        + [_whole_spec(c.shape) for c in consts]
        + [_whole_spec(p.shape) for p in params]
        + [_whole_spec((1, nterms))]
    )
    inputs = (
        [f for f in fields for _ in range(span)]
        + [d for d in data for _ in range(hist + 1)]
        + list(consts)
        + list(params)
        + [gmat]
    )
    out_specs = (
        [_row_spec(f.shape, T, 0) for f in fields]
        + [_whole_spec(p.shape) for p in params]
        + ([_whole_spec((1, nterms))] if with_sums else [])
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in fields]
        + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params]
        + ([jax.ShapeDtypeStruct((1, nterms), fields[0].dtype)] if with_sums else [])
    )
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)
    if with_sums:
        return tuple(outs[:nf]), tuple(outs[nf : nf + np_]), outs[-1][0]
    return tuple(outs[:nf]), tuple(outs[nf:])


# -- Multi-row blocked variant ---------------------------------------------
# B rows per program: fewer grid steps and larger DMAs, which matters when
# planes are small (2D problems, coarse 3D grids).  Needs B >= hist, B | T.
# The row function stays un-blocked: it runs under jax.vmap over the block.


def _block_spec(shape, B, offset_blocks, nb):
    """BlockSpec of B aligned rows at block offset `offset_blocks` (mod nb)."""
    ndim = len(shape)
    zeros = (0,) * (ndim - 1)

    def index_map(p):
        return ((p + offset_blocks) % nb,) + zeros

    return pl.BlockSpec((B,) + tuple(shape[1:]), index_map)


def _forward_blocked(row_fn, nterms, hist, interpret, B, fields, params, data, consts):
    T = fields[0].shape[0]
    nb = T // B
    nf, np_, nd = len(fields), len(params), len(data)

    def kernel(*refs):
        pos = 0
        field_refs = refs[pos : pos + nf * 2]
        pos += nf * 2
        data_refs = refs[pos : pos + nd]
        pos += nd
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        out_ref = refs[-1]

        p = pl.program_id(0)
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)

        # Sequential lax loop over the B rows (a vmap here would be unrolled
        # by Mosaic, inflating compile time to minutes at B ~ 13).  Mosaic
        # only supports dynamic indexing through refs, not values, so the
        # first `hist` rows -- whose stencils reach into the previous block
        # (field_refs[2f]) -- run as a statically-unrolled prologue, and the
        # loop body indexes only the own block (field_refs[2f+1]).
        def eval_row(s, read):
            rows_s = tuple(
                tuple(read(f, s - o) for o in range(hist + 1)) for f in range(nf)
            )
            data_s = tuple(data_refs[d][s] for d in range(nd))
            res = row_fn(p * B + s, T, rows_s, data_s, params_v, consts_v)
            return _sumsq_vec(res)

        sums = jnp.zeros((nterms,), out_ref.dtype)
        for s in range(min(hist, B)):
            read = lambda f, j: field_refs[2 * f + 1][j] if j >= 0 else field_refs[2 * f][B + j]
            sums = sums + eval_row(s, read)

        def body(s, acc):
            return acc + eval_row(s, lambda f, j: field_refs[2 * f + 1][j])

        sums = jax.lax.fori_loop(hist, B, body, sums)

        @pl.when(p == 0)
        def _():
            out_ref[0, :] = jnp.zeros((nterms,), out_ref.dtype)

        out_ref[0, :] += sums

    in_specs = []
    inputs = []
    for f in fields:
        in_specs += [_block_spec(f.shape, B, -1, nb), _block_spec(f.shape, B, 0, nb)]
        inputs += [f, f]
    for d in data:
        in_specs.append(_block_spec(d.shape, B, 0, nb))
        inputs.append(d)
    in_specs += [_whole_spec(c.shape) for c in consts]
    inputs += list(consts)
    in_specs += [_whole_spec(p.shape) for p in params]
    inputs += list(params)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nterms), lambda p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, nterms), fields[0].dtype),
        interpret=interpret,
    )(*inputs)
    return out[0]


def _backward_blocked(row_fn, nterms, hist, interpret, B, fields, params, data, consts, g,
                      with_sums=False):
    """Program p owns output rows pB..pB+B-1, accumulating cotangents from
    its own residual block plus the first `hist` residual rows of block p+1
    (the rows whose stencils reach back into this block).

    with_sums=True also accumulates the per-term sums of squares from each
    block's own residual rows (spill rows belong to the next block), making
    this a fused one-pass loss+gradient evaluation."""
    T = fields[0].shape[0]
    nb = T // B
    nf, np_, nd = len(fields), len(params), len(data)
    gmat = jnp.reshape(g, (1, nterms))

    def kernel(*refs):
        pos = 0
        field_refs = refs[pos : pos + nf * 3]
        pos += nf * 3
        data_refs = refs[pos : pos + nd * 2]
        pos += nd * 2
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        pos += np_
        g_ref = refs[pos]
        out_field_refs = refs[pos + 1 : pos + 1 + nf]
        out_param_refs = refs[pos + 1 + nf : pos + 1 + nf + np_]
        out_sums_ref = refs[pos + 1 + nf + np_] if with_sums else None

        p = pl.program_id(0)
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)
        gvec = g_ref[0]

        def residuals_of(it_i, flat_and_params, data_i):
            flat_rows = flat_and_params[: nf * (hist + 1)]
            pv = flat_and_params[nf * (hist + 1) :]
            rows = tuple(
                tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1)) for f in range(nf)
            )
            return tuple(row_fn(it_i, T, rows, data_i, pv, consts_v))

        def row_cotangents(it_i, flat_in, data_i):
            res, vjp_fn = jax.vjp(lambda *a: residuals_of(it_i, a, data_i), *flat_in)
            w = _weights_of(gvec, res, nterms)
            return res, vjp_fn(w)

        # Residual row s of this block reads input rows s - m: index s - m of
        # the own block (field_refs[3f+1]), or B + s - m of the previous
        # block (field_refs[3f]) when negative.  Sequential lax loop (a
        # vmapped vjp here would be unrolled by Mosaic, inflating compile
        # time to minutes at B ~ 13); Mosaic supports dynamic indexing only
        # through refs, so cotangents accumulate straight into the resident
        # output blocks and the first `hist` rows run as a static prologue.
        for f in range(nf):
            out_field_refs[f][...] = jnp.zeros((B,) + fields[f].shape[1:], fields[f].dtype)

        def accumulate_row(s, read, carry, static_s=None):
            """Processes residual row `s`; returns updated (param, sums)
            carries.  Stores go to target rows s - o >= 0 (earlier rows
            belong to the previous block and arrive via its spill pass)."""
            paccs, sacc = carry
            flat_in = tuple(
                read(f, s - m) for f in range(nf) for m in range(hist + 1)
            ) + tuple(params_v)
            data_i = tuple(data_refs[2 * d][s] for d in range(nd))
            res, c = row_cotangents(p * B + s, flat_in, data_i)
            for f in range(nf):
                omax = hist + 1 if static_s is None else min(static_s, hist) + 1
                for o in range(omax):
                    t = s - o
                    out_field_refs[f][t] = out_field_refs[f][t] + c[f * (hist + 1) + o]
            paccs = tuple(pa + c[nf * (hist + 1) + q] for q, pa in enumerate(paccs))
            if with_sums:
                sacc = sacc + _sumsq_vec(res)
            return paccs, sacc

        carry = (
            tuple(jnp.zeros(q.shape, q.dtype) for q in params),
            jnp.zeros((nterms,), fields[0].dtype),
        )
        for s in range(min(hist, B)):
            read = lambda f, j: field_refs[3 * f + 1][j] if j >= 0 else field_refs[3 * f][B + j]
            carry = accumulate_row(s, read, carry, static_s=s)

        def body(s, carry):
            return accumulate_row(s, lambda f, j: field_refs[3 * f + 1][j], carry)

        paccs_out, sums_acc = jax.lax.fori_loop(hist, B, body, carry)
        param_accs = list(paccs_out)

        # Spill: the first `hist` residual rows of block p+1 (their stencils
        # reach back into this block's output rows).
        for s2 in range(hist):
            flat_in = tuple(
                field_refs[3 * f + 2][s2 - m] if s2 - m >= 0 else field_refs[3 * f + 1][B + s2 - m]
                for f in range(nf)
                for m in range(hist + 1)
            ) + tuple(params_v)
            data_i = tuple(data_refs[2 * d + 1][s2] for d in range(nd))
            # Global index of the spilled row (block p+1 wraps mod nb).
            it2 = ((p + 1) % nb) * B + s2
            _res2, c = row_cotangents(it2, flat_in, data_i)
            for f in range(nf):
                for o in range(s2 + 1, hist + 1):
                    k = B + s2 - o  # Static target row in this block.
                    out_field_refs[f][k] = out_field_refs[f][k] + c[f * (hist + 1) + o]

        for q in range(np_):

            @pl.when(p == 0)
            def _(q=q):
                out_param_refs[q][...] = jnp.zeros(params[q].shape, params[q].dtype)

            out_param_refs[q][...] += param_accs[q]

        if with_sums:

            @pl.when(p == 0)
            def _():
                out_sums_ref[0, :] = jnp.zeros((nterms,), out_sums_ref.dtype)

            out_sums_ref[0, :] += sums_acc

    in_specs = []
    inputs = []
    for f in fields:
        in_specs += [
            _block_spec(f.shape, B, -1, nb),
            _block_spec(f.shape, B, 0, nb),
            _block_spec(f.shape, B, 1, nb),
        ]
        inputs += [f, f, f]
    for d in data:
        in_specs += [_block_spec(d.shape, B, 0, nb), _block_spec(d.shape, B, 1, nb)]
        inputs += [d, d]
    in_specs += [_whole_spec(c.shape) for c in consts]
    inputs += list(consts)
    in_specs += [_whole_spec(p.shape) for p in params]
    inputs += list(params)
    in_specs.append(_whole_spec((1, nterms)))
    inputs.append(gmat)

    out_specs = (
        [_block_spec(f.shape, B, 0, nb) for f in fields]
        + [_whole_spec(p.shape) for p in params]
        + ([_whole_spec((1, nterms))] if with_sums else [])
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in fields]
        + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params]
        + ([jax.ShapeDtypeStruct((1, nterms), fields[0].dtype)] if with_sums else [])
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)
    if with_sums:
        return tuple(outs[:nf]), tuple(outs[nf : nf + np_]), outs[-1][0]
    return tuple(outs[:nf]), tuple(outs[nf:])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def rowwise_sumsq_blocked(row_fn, nterms, hist, interpret, B, fields, params, data, consts):
    return _forward_blocked(row_fn, nterms, hist, interpret, B, fields, params, data, consts)


def _fwd_rule_blocked(row_fn, nterms, hist, interpret, B, fields, params, data, consts):
    out = _forward_blocked(row_fn, nterms, hist, interpret, B, fields, params, data, consts)
    return out, (fields, params, data, consts)


def _bwd_rule_blocked(row_fn, nterms, hist, interpret, B, saved, g):
    fields, params, data, consts = saved
    dfields, dparams = _backward_blocked(
        row_fn, nterms, hist, interpret, B, fields, params, data, consts, g
    )
    return (
        dfields,
        dparams,
        tuple(jnp.zeros_like(d) for d in data),
        tuple(jnp.zeros_like(c) for c in consts),
    )


rowwise_sumsq_blocked.defvjp(_fwd_rule_blocked, _bwd_rule_blocked)




# -- Streaming (ring-buffer) variant ----------------------------------------
# Each field is read from HBM exactly once per pass: the current row arrives
# through the pipelined BlockSpec and the previous `hist` rows are carried in
# a VMEM ring scratch across the sequential TPU grid.  The wrap rows
# (periodic time axis) enter as one small resident block per field.


def _mod_row_spec(shape, T, extra=0):
    """BlockSpec for row (i % T) of a (T, *plane) array (grid may exceed T
    by `extra` epilogue programs)."""
    ndim = len(shape)
    zeros = (0,) * (ndim - 1)

    def index_map(i):
        return (i % T,) + zeros

    return pl.BlockSpec((1,) + tuple(shape[1:]), index_map)


def _resident_spec(shape):
    """Whole-array block with a constant index map: fetched once and kept
    resident across the sequential grid (revisiting semantics)."""
    ndim = len(shape)
    return pl.BlockSpec(tuple(shape), lambda i: (0,) * ndim)


def _forward_stream(row_fn, nterms, hist, interpret, fields, params, data, consts):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    T = fields[0].shape[0]
    nf, np_, nd = len(fields), len(params), len(data)
    wraps = [f[T - hist :] for f in fields]  # rows T-hist..T-1, stacked.

    def kernel(*refs):
        pos = 0
        cur_refs = refs[pos : pos + nf]
        pos += nf
        wrap_refs = refs[pos : pos + nf]
        pos += nf
        data_refs = refs[pos : pos + nd]
        pos += nd
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        pos += np_
        out_ref = refs[pos]
        ring_refs = refs[pos + 1 :]

        i = pl.program_id(0)
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)

        rows = []
        for f in range(nf):
            cur = cur_refs[f][0]
            frows = [cur]
            for o in range(1, hist + 1):
                ring_row = ring_refs[f][(i - o) % hist]
                wrap_row = wrap_refs[f][jnp.clip(hist + i - o, 0, hist - 1)]
                frows.append(jnp.where(i - o >= 0, ring_row, wrap_row))
            rows.append(tuple(frows))
        rows = tuple(rows)
        data_rows = tuple(r[0] for r in data_refs)

        res = row_fn(i, T, rows, data_rows, params_v, consts_v)
        sums = _sumsq_vec(res)

        @pl.when(i == 0)
        def _():
            out_ref[0, :] = jnp.zeros((nterms,), out_ref.dtype)

        out_ref[0, :] += sums

        # Carry the current row for the next `hist` programs.
        for f in range(nf):
            ring_refs[f][i % hist] = cur_refs[f][0]

    in_specs = (
        [_mod_row_spec(f.shape, T) for f in fields]
        + [_resident_spec(w.shape) for w in wraps]
        + [_mod_row_spec(d.shape, T) for d in data]
        + [_whole_spec(c.shape) for c in consts]
        + [_whole_spec(p.shape) for p in params]
    )
    inputs = list(fields) + wraps + list(data) + list(consts) + list(params)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nterms), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, nterms), fields[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((hist,) + tuple(f.shape[1:]), f.dtype) for f in fields
        ],
        interpret=interpret,
    )(*inputs)
    return out[0]


def _backward_stream(row_fn, nterms, hist, interpret, fields, params, data, consts, g):
    """Streaming backward: grid of T + hist programs; program i processes
    residual row (i % T), accumulates its vjp cotangents into a VMEM
    out-ring, and flushes output row (i - hist) % T once complete.  The
    first `hist` residual rows are processed twice (once for their forward
    targets, once at the epilogue for the wrapped targets); masks keep each
    contribution exactly once."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    T = fields[0].shape[0]
    nf, np_, nd = len(fields), len(params), len(data)
    gmat = jnp.reshape(g, (1, nterms))
    wraps = [f[T - hist :] for f in fields]
    nprog = T + hist

    def kernel(*refs):
        pos = 0
        cur_refs = refs[pos : pos + nf]
        pos += nf
        wrap_refs = refs[pos : pos + nf]
        pos += nf
        data_refs = refs[pos : pos + nd]
        pos += nd
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        pos += np_
        g_ref = refs[pos]
        pos += 1
        out_field_refs = refs[pos : pos + nf]
        out_param_refs = refs[pos + nf : pos + nf + np_]
        scratch = refs[pos + nf + np_ :]
        ring_refs = scratch[:nf]
        oring_refs = scratch[nf : 2 * nf]

        i = pl.program_id(0)
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)
        gvec = g_ref[0]

        # Input rows for residual row (i % T): current + ring + wraps.
        flat_rows = []
        for f in range(nf):
            cur = cur_refs[f][0]
            flat_rows.append(cur)
            for o in range(1, hist + 1):
                ring_row = ring_refs[f][(i - o) % hist]
                wrap_row = wrap_refs[f][jnp.clip(hist + i - o, 0, hist - 1)]
                flat_rows.append(jnp.where(i - o >= 0, ring_row, wrap_row))
        # Note: flat order per field is offsets 0..hist.
        data_rows = tuple(r[0] for r in data_refs)

        def residuals_of(*args):
            rows_flat = args[: nf * (hist + 1)]
            pv = args[nf * (hist + 1) :]
            rows = tuple(
                tuple(rows_flat[f * (hist + 1) + m] for m in range(hist + 1)) for f in range(nf)
            )
            return tuple(row_fn(i % T, T, rows, data_rows, pv, consts_v))

        res, vjp_fn = jax.vjp(residuals_of, *(tuple(flat_rows) + params_v))
        w = _weights_of(gvec, res, nterms)
        cots = vjp_fn(w)

        # Zero the out-ring slots on first use.
        @pl.when(i == 0)
        def _():
            for f in range(nf):
                oring_refs[f][...] = jnp.zeros_like(oring_refs[f])

        # Accumulate cotangents: offset o targets program-row i - o.
        for f in range(nf):
            for o in range(hist + 1):
                target = i - o
                contrib = cots[f * (hist + 1) + o]
                slot = target % (hist + 1)
                valid = target >= 0

                current = oring_refs[f][slot]
                oring_refs[f][slot] = jnp.where(valid, current + contrib, current)

        # Flush the completed row (program-row i - hist) and reset its slot.
        for f in range(nf):
            slot = (i - hist) % (hist + 1)
            out_field_refs[f][0] = oring_refs[f][slot]
            oring_refs[f][slot] = jnp.zeros_like(oring_refs[f][slot])

        # Parameter cotangents: each residual row contributes once.
        for q in range(np_):

            @pl.when(i == 0)
            def _(q=q):
                out_param_refs[q][...] = jnp.zeros(params[q].shape, params[q].dtype)

            @pl.when(i < T)
            def _(q=q):
                out_param_refs[q][...] += cots[nf * (hist + 1) + q]

        # Carry current rows.
        for f in range(nf):
            ring_refs[f][i % hist] = cur_refs[f][0]

    def out_row_spec(shape):
        ndim = len(shape)
        zeros = (0,) * (ndim - 1)
        return pl.BlockSpec((1,) + tuple(shape[1:]), lambda i: ((i - hist) % T,) + zeros)

    in_specs = (
        [_mod_row_spec(f.shape, T) for f in fields]
        + [_resident_spec(w.shape) for w in wraps]
        + [_mod_row_spec(d.shape, T) for d in data]
        + [_whole_spec(c.shape) for c in consts]
        + [_whole_spec(p.shape) for p in params]
        + [_whole_spec((1, nterms))]
    )
    inputs = list(fields) + wraps + list(data) + list(consts) + list(params) + [gmat]
    out_specs = [out_row_spec(f.shape) for f in fields] + [_whole_spec(p.shape) for p in params]
    out_shapes = [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in fields] + [
        jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((hist,) + tuple(f.shape[1:]), f.dtype) for f in fields]
            + [pltpu.VMEM((hist + 1,) + tuple(f.shape[1:]), f.dtype) for f in fields]
        ),
        interpret=interpret,
    )(*inputs)
    return tuple(outs[:nf]), tuple(outs[nf:])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def rowwise_sumsq_stream(row_fn, nterms, hist, interpret, fields, params, data, consts):
    return _forward_stream(row_fn, nterms, hist, interpret, fields, params, data, consts)


def _fwd_rule_stream(row_fn, nterms, hist, interpret, fields, params, data, consts):
    out = _forward_stream(row_fn, nterms, hist, interpret, fields, params, data, consts)
    return out, (fields, params, data, consts)


def _bwd_rule_stream(row_fn, nterms, hist, interpret, saved, g):
    fields, params, data, consts = saved
    dfields, dparams = _backward_stream(
        row_fn, nterms, hist, interpret, fields, params, data, consts, g
    )
    return (
        dfields,
        dparams,
        tuple(jnp.zeros_like(d) for d in data),
        tuple(jnp.zeros_like(c) for c in consts),
    )


rowwise_sumsq_stream.defvjp(_fwd_rule_stream, _bwd_rule_stream)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def rowwise_sumsq(row_fn, nterms, hist, interpret, fields, params, data, consts):
    return _forward(row_fn, nterms, hist, interpret, fields, params, data, consts)


def _fwd_rule(row_fn, nterms, hist, interpret, fields, params, data, consts):
    out = _forward(row_fn, nterms, hist, interpret, fields, params, data, consts)
    return out, (fields, params, data, consts)


def _bwd_rule(row_fn, nterms, hist, interpret, saved, g):
    fields, params, data, consts = saved
    dfields, dparams = _backward(row_fn, nterms, hist, interpret, fields, params, data, consts, g)
    ddata = tuple(jnp.zeros_like(d) for d in data)
    dconsts = tuple(jnp.zeros_like(c) for c in consts)
    return dfields, dparams, ddata, dconsts


rowwise_sumsq.defvjp(_fwd_rule, _bwd_rule)


def _vmap_rowwise_terms(row_fn, fields, params, data, consts, nterms, hist, sums=False):
    """Pure-XLA evaluation of the same row-wise semantics: whole-array rolls
    along the time axis, then vmap of the row function over rows.  Used off
    TPU and when the backward kernel would not fit VMEM."""
    T = fields[0].shape[0]
    rows = tuple(
        tuple(jnp.roll(f, o, axis=0) for o in range(hist + 1)) for f in fields
    )
    it = jnp.arange(T, dtype=jnp.int32)

    def per_row(it_i, row_planes, data_planes):
        return tuple(row_fn(it_i, T, row_planes, data_planes, params, consts))

    res = jax.vmap(per_row, in_axes=(0, 0, 0))(it, rows, tuple(data))
    if sums:
        return [jnp.sum(jnp.square(r)) for r in res]
    return [jnp.mean(jnp.square(r)) for r in res]


def _backward_vmem_estimate(fields, params, data, consts, nterms, hist):
    """Rough bytes of live VMEM for one backward program."""
    plane_bytes = int(np.prod(fields[0].shape[1:])) * fields[0].dtype.itemsize
    span = 2 * hist + 1
    nplanes = (
        len(fields) * span          # input rows
        + len(fields)               # output rows
        + len(data) * (hist + 1)    # data rows
        + 3 * nterms                # residuals + cotangents + temps
        + 6                         # working margin
    )
    const_bytes = sum(int(np.prod(c.shape)) * c.dtype.itemsize for c in consts)
    param_bytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in params)
    return plane_bytes * nplanes + 2 * (const_bytes + param_bytes)


def _auto_block_rows(T, plane_bytes, hist):
    """Rows per program: bundle rows until the per-program block reaches
    ~256 KB (good DMA granularity), bounded by divisibility and hist."""
    target = max(1, (256 * 1024) // max(plane_bytes, 1))
    best = 1
    for B in range(2, min(T, 32) + 1):
        if T % B == 0 and B >= hist and B <= target:
            best = B
    return best


def rowwise_loss_terms(
    row_fn,
    fields,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    interpret=None,
    block_rows=None,
    stream=False,
    halox=None,
    _sums=False,
    xpad_masked=False,
):
    """Per-term mean-squared losses through the fused kernel.

    halox: the row function's stencil reach along the leading plane (x)
    axis, declared by the caller.  Routing to the x-tiled kernel for
    beyond-VMEM planes needs it (the tiles overlap by halox rows); when
    left None the reach is unknown, so oversized planes take the exact
    XLA fallback instead of risking a too-narrow tile halo.

    xpad_masked (with _sums, i.e. halo per-shard evaluation): declares
    that every residual within halox of either x end is masked to zero
    by the row function (a halo-extended local block), so a non-tileable
    x extent may be edge-padded up to a tileable one for the x-tiled
    route (rowwise_tiled.pick_tile_pad).

    Equivalent to ``[mean(residual_k**2)]`` with residuals over the full
    (T, *plane) grid.  1-D planes are padded to 2-D internally to satisfy
    TPU tiling; (1, 1) consts pass scalars.  `interpret=True` forces the
    Pallas interpreter; off TPU, or when the backward working set would not
    fit VMEM (~large planes), an equivalent vmap-over-rows XLA path runs
    instead.  For small planes, several rows run per program
    (`block_rows`, chosen automatically)."""
    fields = tuple(fields)
    params = tuple(params)
    data = tuple(data)
    consts = tuple(consts)
    T = fields[0].shape[0]
    plane = int(np.prod(fields[0].shape[1:]))
    plane_bytes = plane * fields[0].dtype.itemsize
    denom = 1.0 if _sums else T * plane
    if interpret is None:
        vmem = _backward_vmem_estimate(fields, params, data, consts, nterms, hist)
        # Mosaic cannot lower 64-bit reductions/scalars (remote-compile
        # crashes on every staged-reduction formulation tried); fp64 runs
        # the equivalent XLA path -- the kernel is the fp32/bf16 perf path.
        oversized = not _on_tpu() or vmem > 14 * 1024 * 1024
        if oversized or fields[0].dtype.itemsize > 4 or _FORCE_TILE:
            # Planes too large for whole-plane VMEM residency (512^2+):
            # x-tiled kernel with halo streams (rowwise_tiled.py) instead
            # of the far slower XLA fallback.  Non-tileable halo-extended
            # blocks (B + lo + hi x-rows) ride the edge-padded route under
            # the masked-edge contract (_sums + xpad_masked).  _FORCE_TILE
            # is a test hook forcing this route at small shapes (interpret
            # mode off-TPU).
            route = _pick_tiled_route(
                fields, data, consts, hist, halox, allow_pad=_sums and xpad_masked
            )
            if route is not None:
                from .rowwise_tiled import rowwise_loss_terms_tiled

                return rowwise_loss_terms_tiled(
                    row_fn, fields, params=params, data=data, consts=consts,
                    nterms=nterms, hist=hist, halox=halox, tile=route[0],
                    xpad=route[1], _sums=_sums,
                )
            return _vmap_rowwise_terms(
                row_fn, fields, params, data, consts, nterms, hist, sums=_sums
            )
        interpret = False
    if stream and hist >= 1:
        # Streaming ring-buffer kernels: each field read from HBM once.
        if fields[0].ndim == 2:
            fields2 = tuple(f[:, None, :] for f in fields)
            data2 = tuple(d[:, None, :] if d.ndim == 2 else d for d in data)
            consts2 = tuple(c[None, :] if c.ndim == 1 else c for c in consts)

            def row_fn_s(it, T_, rows, data_rows, pv, cons):
                rows1 = tuple(tuple(p[0] for p in f_rows) for f_rows in rows)
                data1 = tuple(p[0] if d.ndim == 2 else p for p, d in zip(data_rows, data))
                cons1 = tuple(c[0] if o.ndim == 1 else c for c, o in zip(cons, consts))
                return tuple(r[None, :] for r in row_fn(it, T_, rows1, data1, pv, cons1))

            sums = rowwise_sumsq_stream(row_fn_s, nterms, hist, interpret, fields2, params, data2, consts2)
        else:
            sums = rowwise_sumsq_stream(row_fn, nterms, hist, interpret, fields, params, data, consts)
        return [sums[k] / denom for k in range(nterms)]
    if block_rows is None:
        # Small planes: several rows per program amortize the per-program
        # overhead (measured 2x on a 65x65 wave-type grid).  The in-kernel
        # row iteration is a sequential lax loop, so Mosaic compile time
        # stays at seconds regardless of B (the earlier vmap-unrolled form
        # took minutes at B ~ 13).  Large planes keep B = 1.
        block_rows = _auto_block_rows(T, plane_bytes, hist)
    if block_rows > 1 and T % block_rows == 0 and block_rows >= hist:
        if fields[0].ndim == 2:
            fields2 = tuple(f[:, None, :] for f in fields)
            data2 = tuple(d[:, None, :] if d.ndim == 2 else d for d in data)
            consts2 = tuple(c[None, :] if c.ndim == 1 else c for c in consts)

            def row_fn2(it, T_, rows, data_rows, pv, cons):
                rows1 = tuple(tuple(p[0] for p in f_rows) for f_rows in rows)
                data1 = tuple(p[0] if d.ndim == 2 else p for p, d in zip(data_rows, data))
                cons1 = tuple(c[0] if (o.ndim == 1) else c for c, o in zip(cons, consts))
                return tuple(r[None, :] for r in row_fn(it, T_, rows1, data1, pv, cons1))

            sums = rowwise_sumsq_blocked(
                row_fn2, nterms, hist, interpret, block_rows, fields2, params, data2, consts2
            )
        else:
            sums = rowwise_sumsq_blocked(
                row_fn, nterms, hist, interpret, block_rows, fields, params, data, consts
            )
        return [sums[k] / denom for k in range(nterms)]

    if fields[0].ndim == 2:
        # (T, N) -> (T, 1, N): TPU block shapes need a unit sublane axis.
        fields2 = tuple(f[:, None, :] for f in fields)
        data2 = tuple(d[:, None, :] if d.ndim == 2 else d for d in data)
        consts2 = tuple(c[None, :] if c.ndim == 1 else c for c in consts)

        def unpad_c(c, orig):
            return c[0] if orig.ndim == 1 else c

        def row_fn2(it, T_, rows, data_rows, pv, cons):
            rows1 = tuple(tuple(p[0] for p in f_rows) for f_rows in rows)
            data1 = tuple(p[0] if d.ndim == 2 else p for p, d in zip(data_rows, data))
            cons1 = tuple(unpad_c(c, o) for c, o in zip(cons, consts))
            return tuple(r[None, :] for r in row_fn(it, T_, rows1, data1, pv, cons1))

        sums = rowwise_sumsq(row_fn2, nterms, hist, interpret, fields2, params, data2, consts2)
    else:
        sums = rowwise_sumsq(row_fn, nterms, hist, interpret, fields, params, data, consts)
    return [sums[k] / denom for k in range(nterms)]


def rowwise_loss_sums(
    row_fn,
    fields,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    interpret=None,
    block_rows=None,
    stream=False,
    halox=None,
    xpad_masked=False,
):
    """``rowwise_loss_terms`` returning per-term SUMS of squares instead of
    means.  Used by sharded evaluation (halo.py): each device computes the
    masked local sum through the kernel, a ``psum`` makes it global, and the
    caller divides by the *global* residual count.  ``halox``/``xpad_masked``
    route beyond-VMEM local blocks to the x-tiled kernel (see
    ``rowwise_loss_terms``)."""
    return rowwise_loss_terms(
        row_fn,
        fields,
        params=params,
        data=data,
        consts=consts,
        nterms=nterms,
        hist=hist,
        interpret=interpret,
        block_rows=block_rows,
        stream=stream,
        halox=halox,
        _sums=True,
        xpad_masked=xpad_masked,
    )


def onepass_supported(
    fields, params, data, consts, nterms, hist, halox=None, xpad_masked=False
):
    """Whether ``rowwise_loss_and_grads(interpret=None)`` would run for
    these inputs -- the whole-plane kernel (fits VMEM, <= 32-bit, on TPU)
    or the x-tiled route.  Build-time gate for the one-pass fused
    loss+grad builders (Problem._make_onepass_loss_grad_fn,
    halo._make_halo_onepass_loss_grad_fn)."""
    fields = tuple(fields)
    vmem = _backward_vmem_estimate(fields, params, data, consts, nterms, hist)
    if (
        _on_tpu()
        and vmem <= 14 * 1024 * 1024
        and np.dtype(fields[0].dtype).itemsize <= 4
        and not _FORCE_TILE
    ):
        return True
    return (
        _pick_tiled_route(fields, data, consts, hist, halox, allow_pad=xpad_masked)
        is not None
    )


def rowwise_loss_and_grads(
    row_fn,
    fields,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    interpret=None,
    block_rows=None,
    gscale=None,
    halox=None,
    xpad_masked=False,
):
    """One-pass fused loss sums AND gradients: the backward kernel
    accumulates the per-term sums of squares while emitting cotangents of
    (fields, params) for the fixed loss composition ``sum_k gscale * S_k``
    -- so training steps skip the forward kernel entirely (the generic
    analogue of ops/rowwise_mg's fused path, for operators without
    multigrid partials; Problem.make_loss_grad_fn builds on it).

    gscale: the per-term loss weight (1/cells for the mean composition
    every Problem loss uses); defaults to 1/(T*plane).

    Returns (sums, dfields, dparams) with dfields in the ORIGINAL field
    shapes, or None when the fused kernel path would not run -- off-TPU
    (pass interpret=True to force the interpreter), 64-bit dtypes, or a
    backward working set beyond VMEM -- in which case callers fall back to
    ``jax.value_and_grad`` of the usual loss (which routes to the XLA or
    x-tiled forms).  data/consts are non-differentiable, exactly as in the
    custom-vjp path.  Not itself differentiable (it IS the gradient)."""
    fields = tuple(jnp.asarray(f) for f in fields)
    params = tuple(jnp.asarray(p) for p in params)
    data = tuple(jnp.asarray(d) for d in data)
    consts = tuple(jnp.asarray(c) for c in consts)
    T = fields[0].shape[0]
    plane = int(np.prod(fields[0].shape[1:]))
    plane_bytes = plane * fields[0].dtype.itemsize
    if gscale is None:
        gscale = 1.0 / (T * plane)
    if interpret is None:
        vmem = _backward_vmem_estimate(fields, params, data, consts, nterms, hist)
        oversized = not _on_tpu() or vmem > 14 * 1024 * 1024
        if oversized or fields[0].dtype.itemsize > 4 or _FORCE_TILE:
            # Beyond-VMEM planes: the x-tiled one-pass (backward-with-sums)
            # keeps training steps at the fused rate; non-tileable
            # halo-extended blocks ride the edge-padded route (see
            # rowwise_loss_terms / rowwise_tiled.py).
            route = _pick_tiled_route(
                fields, data, consts, hist, halox, allow_pad=xpad_masked
            )
            if route is None:
                return None
            from .rowwise_tiled import rowwise_loss_and_grads_tiled

            return rowwise_loss_and_grads_tiled(
                row_fn, fields, params=params, data=data, consts=consts,
                nterms=nterms, hist=hist, halox=halox, tile=route[0],
                xpad=route[1], gscale=gscale,
            )
        interpret = False
    g = jnp.full((nterms,), gscale, fields[0].dtype)
    orig_ndim = fields[0].ndim
    if orig_ndim == 2:
        # (T, N) -> (T, 1, N): TPU block shapes need a unit sublane axis.
        fields2 = tuple(f[:, None, :] for f in fields)
        data2 = tuple(d[:, None, :] if d.ndim == 2 else d for d in data)
        consts2 = tuple(c[None, :] if c.ndim == 1 else c for c in consts)

        def row_fn2(it, T_, rows, data_rows, pv, cons):
            rows1 = tuple(tuple(p[0] for p in f_rows) for f_rows in rows)
            data1 = tuple(p[0] if d.ndim == 2 else p for p, d in zip(data_rows, data))
            cons1 = tuple(c[0] if o.ndim == 1 else c for c, o in zip(cons, consts))
            return tuple(r[None, :] for r in row_fn(it, T_, rows1, data1, pv, cons1))

        rf, flds, dat, cns = row_fn2, fields2, data2, consts2
    else:
        rf, flds, dat, cns = row_fn, fields, data, consts
    if block_rows is None:
        block_rows = _auto_block_rows(T, plane_bytes, hist)
    if block_rows > 1 and T % block_rows == 0 and block_rows >= hist:
        dfields, dparams, sums = _backward_blocked(
            rf, nterms, hist, interpret, block_rows, flds, params, dat, cns, g,
            with_sums=True,
        )
    else:
        dfields, dparams, sums = _backward(
            rf, nterms, hist, interpret, flds, params, dat, cns, g, with_sums=True
        )
    if orig_ndim == 2:
        dfields = tuple(d[:, 0, :] for d in dfields)
    return sums, dfields, dparams
