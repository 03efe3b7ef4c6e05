"""x-tiled row-wise residual kernel for planes too large for VMEM.

The default row-wise kernels (``rowwise.py``) keep whole (X, Y) planes in
VMEM, which caps them at ~512^2 fp32 planes; beyond that the wrapper used
to fall back to the XLA path, measured ~4.6x below the fused kernel's
per-cell rate (BENCH_NOTES.md).  This variant adds the x axis as a second
(outer) grid dimension: program (p, i) evaluates residual rows i..i+hist
restricted to x-tile p.

Stencil x-shifts (periodic ``mod.roll`` semantics, reference
``src/odil/core.py:956-969``) are handled by *widening* each tile with
``halox`` halo x-rows per side, streamed as tiny (1, halox, Y) blocks via
sub-block index maps -- the halo of tile p is the last/first ``halox``
x-rows of tiles (p-1) % nxt / (p+1) % nxt, so the periodic wrap is exact
by construction (and nxt == 1 degenerates to the full-plane roll).  The
row function runs on the widened rows; residual values at the halo rows
see a truncated neighborhood and are DISCARDED: the forward slices them
off before the sum-of-squares reduction, the backward zeroes their
upstream cotangent.

Backward: per program, one vjp per residual row i+o (o = 0..hist), taking
the cotangent slice of its own (tile p, row i) sample -- the same
local-accumulation scheme as ``rowwise._backward``.  Cotangents w.r.t.
the widened input's halo x-rows belong to the neighbor tiles; they are
emitted as small (nxt, T, halox, Y) edge outputs and folded into the
final gradient by XLA afterwards.

Contract additions over ``rowwise.py``: fields are 3D (T, X, Y); X is
divisible by the tile width; ``halox`` bounds the row function's x-shift
reach; row functions must not branch on the global x index (none of the
bundled models do -- x/y boundary handling rides on data/consts arrays,
which are tiled alongside the fields).  Consts whose shape is exactly
(X, Y) are tiled and halo-widened like the fields; any other 2D const
(scalars as (1, 1), per-device metadata rows) streams WHOLE to every
program.

Sharded evaluation (halo.py) composes through two extras: ``_sums=True``
returns per-term sums of squares instead of means (each device's masked
local sum, psum'd by the caller), and ``xpad=<Xpad>`` edge-pads a
non-tileable x extent (a halo-extended local block is B + lo + hi rows,
never a power of two) up to a tileable width -- valid ONLY under the halo
contract that every residual within ``halox`` of either x end is already
masked to zero by the row function, so the padded rows (masked here by an
appended 0/1 const) and the now-wrong periodic wrap contribute nothing to
sums or cotangents.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .rowwise import _sumsq_vec, _weights_of


def _whole_spec(shape):
    ndim = len(shape)
    return pl.BlockSpec(tuple(shape), lambda p, i: (0,) * ndim)

__all__ = [
    "rowwise_loss_terms_tiled",
    "rowwise_loss_and_grads_tiled",
    "tiled_vmem_estimate",
    "pick_tile",
    "pick_tile_pad",
]


def _tile_spec(shape, T, toff, W, nxt, has_t=True):
    """Own-tile block: (1, W, Y) at t-row (i + toff) % T, x-tile p."""
    Y = shape[-1]
    if has_t:
        return pl.BlockSpec((1, W, Y), lambda p, i: ((i + toff) % T, p, 0))
    return pl.BlockSpec((W, Y), lambda p, i: (p, 0))


_HB = 8  # Halo block sublane size: Mosaic requires multiples of 8.


def _halo_spec(shape, T, toff, W, nxt, side, has_t=True):
    """Halo block: (1, _HB, Y) covering the last (side=-1) / first
    (side=+1) _HB x-rows of the left / right neighbor tile (periodic);
    the kernel slices the h rows it needs.  Alignment holds because
    W % _HB == 0."""
    X, Y = shape[-2], shape[-1]
    if side < 0:
        xblock = lambda p: ((p * W - _HB) % X) // _HB  # noqa: E731
    else:
        xblock = lambda p: (((p + 1) % nxt) * W) // _HB  # noqa: E731
    if has_t:
        return pl.BlockSpec((1, _HB, Y), lambda p, i: ((i + toff) % T, xblock(p), 0))
    return pl.BlockSpec((_HB, Y), lambda p, i: (xblock(p), 0))


def _widen(own, left, right, h):
    """left/right are _HB-row halo blocks; keep the h rows nearest the
    tile."""
    return jnp.concatenate([left[_HB - h :], own, right[:h]], axis=0)


def tiled_vmem_estimate(W, Y, itemsize, nf, nd, nc, hist):
    """Per-program VMEM footprint of the (larger) backward pass: own-tile
    input blocks (double-buffered) across the t-offset span, the own
    output block, and tiled data/const blocks."""
    span = 2 * hist + 1
    wplane = W * Y * itemsize
    return (nf * (2 * span + 2) + nd * 2 * (hist + 1) + nc) * wplane


def pick_tile(X, Y, itemsize, nf, nd, nc, hist, budget=10 * 1024 * 1024):
    """Largest power-of-two-divisor tile width (multiple of 8) whose
    backward fits the budget; None if X cannot be tiled that way."""
    W = X
    while W % 2 == 0 and W > 8 and tiled_vmem_estimate(W, Y, itemsize, nf, nd, nc, hist) > budget:
        W //= 2
    if W % 8 or tiled_vmem_estimate(W, Y, itemsize, nf, nd, nc, hist) > budget:
        return None
    return W


def pick_tile_pad(X, Y, itemsize, nf, nd, nc, hist, budget=10 * 1024 * 1024):
    """Tile width and padded extent (W, Xpad) for a NON-tileable X (a
    halo-extended local block): among the multiples of 8 in the TOP HALF
    of the widths fitting the VMEM budget (a deliberate large-tile bias
    -- smaller tiles always pad less, W=8 minimizes waste outright, but
    per-program overhead dominates below ~half the budget width), the W
    minimizing the padded extent ceil(X/W)*W, ties to the larger W; None
    if even W=8 busts the budget."""
    w0 = 8
    while tiled_vmem_estimate(w0 + 8, Y, itemsize, nf, nd, nc, hist) <= budget:
        w0 += 8
    if tiled_vmem_estimate(w0, Y, itemsize, nf, nd, nc, hist) > budget:
        return None
    best = None
    for W in range(max(8, (w0 // 2) // 8 * 8), w0 + 1, 8):
        xpad = -(-X // W) * W
        if best is None or xpad < best[1] or (xpad == best[1] and W > best[0]):
            best = (W, xpad)
    return best


def _pad_x_edge(a, Xpad):
    """Edge-pads the x (second-to-last) axis up to Xpad: pad values are
    finite copies of the last real row (never fed to an unmasked residual
    under the halo contract), and the pad transpose adds only the zero
    cotangents of masked residuals back to that row."""
    padn = Xpad - a.shape[-2]
    if padn == 0:
        return a
    cfg = [(0, 0)] * a.ndim
    cfg[-2] = (0, padn)
    return jnp.pad(a, cfg, mode="edge")


def _apply_xpad(row_fn, fields, data, consts, X, Y, xpad):
    """Edge-pads a non-tileable x extent up to ``xpad`` under the halo
    masked-edge contract: fields/data and (X, Y)-shaped consts are padded,
    an appended 0/1 const masks residuals at the padded rows, and the row
    function is rewrapped to apply it.  Returns the rewrapped
    (row_fn, fields, data, consts)."""
    dtype = fields[0].dtype
    xmask = (jnp.arange(xpad) < X).astype(dtype)[:, None] * jnp.ones((1, Y), dtype)
    fields = tuple(_pad_x_edge(f, xpad) for f in fields)
    data = tuple(_pad_x_edge(d, xpad) for d in data)
    consts = tuple(
        _pad_x_edge(c, xpad) if (c.ndim == 2 and c.shape[0] == X) else c
        for c in consts
    ) + (xmask,)

    def masked_row_fn(it, T_, rows, data_rows, pv, cons):
        res = row_fn(it, T_, rows, data_rows, pv, cons[:-1])
        return tuple(r * cons[-1] for r in res)

    return masked_row_fn, fields, data, consts


def _const_split(consts, X):
    """Static split: consts shaped exactly (X, Y-ish) tile with the fields;
    everything else ((1, 1) scalars, metadata rows) streams whole."""
    ct = [i for i, c in enumerate(consts) if c.ndim == 2 and c.shape[0] == X]
    cw = [i for i, c in enumerate(consts) if i not in ct]
    return ct, cw


def _forward_tiled(row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts):
    T, X, Y = fields[0].shape
    nxt = X // W
    h = halox
    nf, np_, nd = len(fields), len(params), len(data)
    cti, cwi = _const_split(consts, X)

    def kernel(*refs):
        pos = 0
        f_refs = refs[pos : pos + nf * (hist + 1) * 3]
        pos += nf * (hist + 1) * 3
        d_refs = refs[pos : pos + nd * 3]
        pos += nd * 3
        c_refs = refs[pos : pos + len(cti) * 3]
        pos += len(cti) * 3
        w_refs = refs[pos : pos + len(cwi)]
        pos += len(cwi)
        p_refs = refs[pos : pos + np_]
        out_ref = refs[-1]

        p, i = pl.program_id(0), pl.program_id(1)
        params_v = tuple(r[...] for r in p_refs)
        consts_l = [None] * len(consts)
        for k, ci in enumerate(cti):
            consts_l[ci] = _widen(
                c_refs[3 * k][...], c_refs[3 * k + 1][...], c_refs[3 * k + 2][...], h
            )
        for k, ci in enumerate(cwi):
            consts_l[ci] = w_refs[k][...]
        consts_v = tuple(consts_l)
        rows = tuple(
            tuple(
                _widen(
                    f_refs[(f * (hist + 1) + m) * 3][0],
                    f_refs[(f * (hist + 1) + m) * 3 + 1][0],
                    f_refs[(f * (hist + 1) + m) * 3 + 2][0],
                    h,
                )
                for m in range(hist + 1)
            )
            for f in range(nf)
        )
        data_rows = tuple(
            _widen(d_refs[3 * d][0], d_refs[3 * d + 1][0], d_refs[3 * d + 2][0], h)
            for d in range(nd)
        )
        res = row_fn(i, T, rows, data_rows, params_v, consts_v)
        sums = _sumsq_vec(tuple(r[h : h + W] for r in res))

        @pl.when((p == 0) & (i == 0))
        def _():
            out_ref[0, :] = jnp.zeros((nterms,), out_ref.dtype)

        out_ref[0, :] += sums

    in_specs = []
    inputs = []
    for f in fields:
        for m in range(hist + 1):
            in_specs += [
                _tile_spec(f.shape, T, -m, W, nxt),
                _halo_spec(f.shape, T, -m, W, nxt, -1),
                _halo_spec(f.shape, T, -m, W, nxt, +1),
            ]
            inputs += [f, f, f]
    for d in data:
        in_specs += [
            _tile_spec(d.shape, T, 0, W, nxt),
            _halo_spec(d.shape, T, 0, W, nxt, -1),
            _halo_spec(d.shape, T, 0, W, nxt, +1),
        ]
        inputs += [d, d, d]
    for ci in cti:
        c = consts[ci]
        in_specs += [
            _tile_spec(c.shape, T, 0, W, nxt, has_t=False),
            _halo_spec(c.shape, T, 0, W, nxt, -1, has_t=False),
            _halo_spec(c.shape, T, 0, W, nxt, +1, has_t=False),
        ]
        inputs += [c, c, c]
    for ci in cwi:
        in_specs += [_whole_spec(consts[ci].shape)]
        inputs += [consts[ci]]
    in_specs += [_whole_spec(p.shape) for p in params]
    inputs += list(params)
    out = pl.pallas_call(
        kernel,
        grid=(nxt, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nterms), lambda p, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, nterms), fields[0].dtype),
        interpret=interpret,
    )(*inputs)
    return out[0]


def _backward_tiled(row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts, g,
                    with_sums=False):
    T, X, Y = fields[0].shape
    nxt = X // W
    h = halox
    nf, np_, nd = len(fields), len(params), len(data)
    span = 2 * hist + 1
    gmat = jnp.reshape(g, (1, nterms))
    dtype = fields[0].dtype
    cti, cwi = _const_split(consts, X)

    def kernel(*refs):
        pos = 0
        f_refs = refs[pos : pos + nf * span * 3]
        pos += nf * span * 3
        d_refs = refs[pos : pos + nd * (hist + 1) * 3]
        pos += nd * (hist + 1) * 3
        c_refs = refs[pos : pos + len(cti) * 3]
        pos += len(cti) * 3
        w_refs = refs[pos : pos + len(cwi)]
        pos += len(cwi)
        p_refs = refs[pos : pos + np_]
        pos += np_
        g_ref = refs[pos]
        pos += 1
        out_f_refs = refs[pos : pos + nf]
        pos += nf
        out_el_refs = refs[pos : pos + nf]
        pos += nf
        out_er_refs = refs[pos : pos + nf]
        pos += nf
        out_p_refs = refs[pos : pos + np_]
        pos += np_
        out_s_ref = refs[pos] if with_sums else None

        p, i = pl.program_id(0), pl.program_id(1)
        params_v = tuple(r[...] for r in p_refs)
        consts_l = [None] * len(consts)
        for k, ci in enumerate(cti):
            consts_l[ci] = _widen(
                c_refs[3 * k][...], c_refs[3 * k + 1][...], c_refs[3 * k + 2][...], h
            )
        for k, ci in enumerate(cwi):
            consts_l[ci] = w_refs[k][...]
        consts_v = tuple(consts_l)
        gvec = g_ref[0]
        # Upstream cotangent is zero on the discarded halo residual rows.
        xw = jax.lax.broadcasted_iota(jnp.int32, (W + 2 * h, Y), 0)
        interior = (xw >= h) & (xw < W + h)

        def widened(f, d):
            base = (f * span + (d + hist)) * 3
            return _widen(f_refs[base][0], f_refs[base + 1][0], f_refs[base + 2][0], h)

        accs = [jnp.zeros((W, Y), dtype) for _ in range(nf)]
        eaccs_l = [jnp.zeros((h, Y), dtype) for _ in range(nf)]
        eaccs_r = [jnp.zeros((h, Y), dtype) for _ in range(nf)]
        param_accs = [jnp.zeros(q.shape, q.dtype) for q in params]
        for o in range(hist + 1):
            j = (i + o) % T
            data_rows = tuple(
                _widen(
                    d_refs[(d * (hist + 1) + o) * 3][0],
                    d_refs[(d * (hist + 1) + o) * 3 + 1][0],
                    d_refs[(d * (hist + 1) + o) * 3 + 2][0],
                    h,
                )
                for d in range(nd)
            )

            def residuals_of(*args, _j=j, _data=data_rows):
                flat_rows = args[: nf * (hist + 1)]
                pv = args[nf * (hist + 1) :]
                rows = tuple(
                    tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1))
                    for f in range(nf)
                )
                return tuple(row_fn(_j, T, rows, _data, pv, consts_v))

            flat_rows = tuple(widened(f, o - m) for f in range(nf) for m in range(hist + 1))
            res, vjp_fn = jax.vjp(residuals_of, *(flat_rows + tuple(params_v)))
            w = tuple(jnp.where(interior, wk, 0) for wk in _weights_of(gvec, res, nterms))
            cots = vjp_fn(w)
            # Own (tile p, row i) sample of residual row j is offset m = o.
            for f in range(nf):
                cw = cots[f * (hist + 1) + o]  # Widened (W + 2h, Y).
                accs[f] = accs[f] + cw[h : h + W]
                eaccs_l[f] = eaccs_l[f] + cw[:h]
                eaccs_r[f] = eaccs_r[f] + cw[W + h :]
            if o == 0:
                for q in range(np_):
                    param_accs[q] = param_accs[q] + cots[nf * (hist + 1) + q]
                if with_sums:
                    # Residual row i restricted to tile p is ours exactly
                    # once across the grid: accumulate its loss sums.
                    ssum = _sumsq_vec(tuple(r[h : h + W] for r in res))
        if with_sums:

            @pl.when((p == 0) & (i == 0))
            def _():
                out_s_ref[0, :] = jnp.zeros((nterms,), out_s_ref.dtype)

            out_s_ref[0, :] += ssum
        for f in range(nf):
            out_f_refs[f][0] = accs[f]
            out_el_refs[f][0, 0] = eaccs_l[f]
            out_er_refs[f][0, 0] = eaccs_r[f]
        for q in range(np_):

            @pl.when((p == 0) & (i == 0))
            def _(q=q):
                out_p_refs[q][...] = jnp.zeros(params[q].shape, params[q].dtype)

            out_p_refs[q][...] += param_accs[q]

    in_specs = []
    inputs = []
    for f in fields:
        for d in range(-hist, hist + 1):
            in_specs += [
                _tile_spec(f.shape, T, d, W, nxt),
                _halo_spec(f.shape, T, d, W, nxt, -1),
                _halo_spec(f.shape, T, d, W, nxt, +1),
            ]
            inputs += [f, f, f]
    for d in data:
        for o in range(hist + 1):
            in_specs += [
                _tile_spec(d.shape, T, o, W, nxt),
                _halo_spec(d.shape, T, o, W, nxt, -1),
                _halo_spec(d.shape, T, o, W, nxt, +1),
            ]
            inputs += [d, d, d]
    for ci in cti:
        c = consts[ci]
        in_specs += [
            _tile_spec(c.shape, T, 0, W, nxt, has_t=False),
            _halo_spec(c.shape, T, 0, W, nxt, -1, has_t=False),
            _halo_spec(c.shape, T, 0, W, nxt, +1, has_t=False),
        ]
        inputs += [c, c, c]
    for ci in cwi:
        in_specs += [_whole_spec(consts[ci].shape)]
        inputs += [consts[ci]]
    in_specs += [_whole_spec(q.shape) for q in params]
    inputs += list(params)
    in_specs += [_whole_spec((1, nterms))]
    inputs += [gmat]

    edge_shape = (nxt, T, h, Y)
    edge_spec = pl.BlockSpec((1, 1, h, Y), lambda p, i: (p, i, 0, 0))
    out_specs = (
        [pl.BlockSpec((1, W, Y), lambda p, i: (i, p, 0)) for _ in fields]
        + [edge_spec] * nf
        + [edge_spec] * nf
        + [_whole_spec(q.shape) for q in params]
        + ([_whole_spec((1, nterms))] if with_sums else [])
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(f.shape, f.dtype) for f in fields]
        + [jax.ShapeDtypeStruct(edge_shape, dtype)] * (2 * nf)
        + [jax.ShapeDtypeStruct(q.shape, q.dtype) for q in params]
        + ([jax.ShapeDtypeStruct((1, nterms), dtype)] if with_sums else [])
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nxt, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)
    dfields = list(outs[:nf])
    els = outs[nf : 2 * nf]
    ers = outs[2 * nf : 3 * nf]
    dparams = tuple(outs[3 * nf : 3 * nf + np_])

    # Fold the edge cotangents into the neighbor tiles' x-rows (XLA; tiny).
    for f in range(nf):
        df = dfields[f]
        for pt in range(nxt):
            lo = (pt * W - h) % X  # Left halo of tile pt: x-rows [lo, lo+h).
            df = df.at[:, lo : lo + h].add(els[f][pt])
            ro = ((pt + 1) % nxt) * W  # Right halo: x-rows [ro, ro+h).
            df = df.at[:, ro : ro + h].add(ers[f][pt])
        dfields[f] = df
    if with_sums:
        return tuple(dfields), dparams, outs[-1][0]
    return tuple(dfields), dparams


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def rowwise_sumsq_tiled(row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts):
    return _forward_tiled(
        row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts
    )


def _fwd_rule(row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts):
    out = _forward_tiled(
        row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts
    )
    return out, (fields, params, data, consts)


def _bwd_rule(row_fn, nterms, hist, halox, W, interpret, saved, g):
    fields, params, data, consts = saved
    dfields, dparams = _backward_tiled(
        row_fn, nterms, hist, halox, W, interpret, fields, params, data, consts, g
    )
    return (
        dfields,
        dparams,
        tuple(jnp.zeros_like(d) for d in data),
        tuple(jnp.zeros_like(c) for c in consts),
    )


rowwise_sumsq_tiled.defvjp(_fwd_rule, _bwd_rule)


def rowwise_loss_terms_tiled(
    row_fn,
    fields,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    halox=1,
    tile=None,
    interpret=None,
    _sums=False,
    xpad=None,
):
    """Mean-squared loss terms via the x-tiled kernel.

    Same contract as ``rowwise.rowwise_loss_terms`` plus: fields must be
    3D (T, X, Y); ``halox`` bounds the row function's x-stencil reach;
    ``tile`` overrides the auto-chosen tile width (must divide X).

    ``_sums=True`` returns per-term SUMS of squares (the halo per-shard
    convention).  ``xpad`` (requires ``_sums``) edge-pads X up to a
    tileable extent, masking the padded rows through an appended 0/1
    const -- valid only when residuals within ``halox`` of either x end
    are already masked by the row function (the halo-extended-block
    contract; see module docstring)."""
    from .rowwise import _on_tpu

    fields = tuple(jnp.asarray(f) for f in fields)
    params = tuple(jnp.asarray(p) for p in params)
    data = tuple(jnp.asarray(d) for d in data)
    consts = tuple(jnp.asarray(c) for c in consts)
    T, X, Y = fields[0].shape
    cells = T * X * Y
    if xpad is not None and xpad != X:
        assert _sums, "xpad is only exact under the halo masked-edge contract"
        row_fn, fields, data, consts = _apply_xpad(
            row_fn, fields, data, consts, X, Y, xpad
        )
        X = xpad
    if tile is None:
        tile = pick_tile(
            X, Y, fields[0].dtype.itemsize, len(fields), len(data), len(consts), hist
        )
    assert tile is not None and X % tile == 0, (X, tile)
    assert tile >= 8 and tile % 8 == 0, tile  # _HB halo-block alignment.
    assert halox <= 8, halox
    if interpret is None:
        interpret = not _on_tpu()
    sums = rowwise_sumsq_tiled(
        row_fn,
        nterms,
        hist,
        halox,
        tile,
        interpret,
        fields,
        params,
        data,
        consts,
    )
    denom = 1.0 if _sums else cells
    return tuple(sums[k] / denom for k in range(nterms))


def rowwise_loss_and_grads_tiled(
    row_fn,
    fields,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    halox=1,
    tile=None,
    interpret=None,
    gscale=None,
    xpad=None,
):
    """One-pass fused loss sums AND gradients through the x-tiled kernel:
    the backward sweep accumulates per-term sums of squares while emitting
    cotangents, so training steps at beyond-VMEM plane sizes skip the
    forward kernel (the tiled mirror of ``rowwise.rowwise_loss_and_grads``).

    Returns (sums, dfields, dparams) with dfields in the ORIGINAL
    (un-padded) shapes.  ``xpad`` follows the masked-edge contract of
    ``rowwise_loss_terms_tiled``; the pad-region cotangents it discards are
    exact zeros (only masked residuals read padded rows)."""
    from .rowwise import _on_tpu

    fields = tuple(jnp.asarray(f) for f in fields)
    params = tuple(jnp.asarray(p) for p in params)
    data = tuple(jnp.asarray(d) for d in data)
    consts = tuple(jnp.asarray(c) for c in consts)
    T, X, Y = fields[0].shape
    X_real = X
    if gscale is None:
        gscale = 1.0 / (T * X * Y)
    if xpad is not None and xpad != X:
        row_fn, fields, data, consts = _apply_xpad(
            row_fn, fields, data, consts, X, Y, xpad
        )
        X = xpad
    if tile is None:
        tile = pick_tile(
            X, Y, fields[0].dtype.itemsize, len(fields), len(data), len(consts), hist
        )
    assert tile is not None and X % tile == 0, (X, tile)
    assert tile >= 8 and tile % 8 == 0, tile  # _HB halo-block alignment.
    assert halox <= 8, halox
    if interpret is None:
        interpret = not _on_tpu()
    g = jnp.full((nterms,), gscale, fields[0].dtype)
    dfields, dparams, sums = _backward_tiled(
        row_fn, nterms, hist, halox, tile, interpret,
        fields, params, data, consts, g, with_sums=True,
    )
    if X != X_real:
        dfields = tuple(d[:, :X_real] for d in dfields)
    return sums, dfields, dparams
