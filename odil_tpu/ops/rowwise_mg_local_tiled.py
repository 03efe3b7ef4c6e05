"""x-tiled MG-fused one-pass loss+grad on ONE device's local block (--halo).

Closes the last cell of the halo x kernel composition matrix: beyond-VMEM
local blocks (512^2+ planes per device shard -- the regime multi-chip
exists for) previously lost the MG-fused kernel and fell back to the
generic tiled one-pass plus the XLA ladder.  This kernel combines

- ``rowwise_mg_tiled.py``: x as a second grid dimension, per-tile
  prolongation sub-matrices, raw windowed coarse-cotangent outputs reduced
  by an XLA epilogue;
- ``rowwise_mg.rowwise_mg_local_loss_and_grads``'s local-block contract:
  non-periodic time rows, ``heads`` residents for the rows preceding the
  block (ppermuted from the ring predecessor) with their cotangents
  emitted as ``dheads`` for the caller's exact exchange transpose, a
  rectangular per-device prolongation ``Wx`` (rows of the global matrix
  gathered at the block's global x indices), and per-term loss SUMS for
  the psum convention;
- ``rowwise_tiled.py``'s edge padding: a halo-extended local extent
  Xe = XB + 2*hx is never a power of two, so it is edge-padded to a
  tileable Xpad under the masked-edge contract (every residual within
  ``halox`` of either x end is already masked by the wrapped row
  function, so pad rows contribute nothing to sums or cotangents).

The per-device geometry is runtime (the device's global offset x0 is an
``axis_index``), so the per-tile sub-matrices cannot be host-precomposed
as in the single-device kernel.  Instead everything routes through ONE
gather: with the traced shift s = x0//2 - S0 (S0 a static margin), the
"virtual" coarse axis  idx[v] = (v - hc + s) mod CX  aligns the
prolongation support of tile p's widened fine rows with the static
virtual window [p*Wc, p*Wc + Wcv).  XLA gathers, per step (coarse-scale
arrays, tiny next to the savings):

  windows  = take(P, idx)[:, static per-tile slices]   (nxt, Tcw, Wcv, CY)
  Wsub     = take(Wx_padded, idx)[static slices]       (nxt, W + 2h, Wcv)

and the kernel then works exactly like the single-device tiled kernel on
static windows.  The epilogue transposes the gather with one
``zeros.at[:, idx].add`` scatter -- the exact adjoint of ``take``
(duplicated columns sum).  ``verify_support`` proves on the host, for
EVERY static device index, that no dropped column carries weight -- the
same guarantee the single-device builder's assert gives.

Reference for the semantics being fused: ``src/odil/core.py:245-263``
(multigrid_to_regular) and ``core.py:606-755`` (the multigrid
decomposition the reference spends its conditioning budget on).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rowwise_mg as _mg
from .rowwise import _sumsq_vec, _weights_of
from .rowwise_tiled import _pad_x_edge

__all__ = [
    "rowwise_mg_local_tiled_loss_and_grads",
    "mg_local_tiled_supported",
    "verify_support",
]

_HB = 8  # Halo-block sublane granularity (Mosaic alignment).


def _whole(shape):
    ndim = len(shape)
    return pl.BlockSpec(tuple(shape), lambda p, i: (0,) * ndim)


def _margins(halox, hx):
    """(S0, hc, Wcv_extra): virtual-axis shift margin and coarse window
    halo.  Fine local row r (global g = x0 - hx + r) has prolongation
    support at original columns ~ x0//2 + (r - hx - 1)//2 +- 1 (interior;
    boundary extrapolation rows stay within the bound).  The virtual axis
    subtracts s = x0//2 - S0, so the support of tile p's widened rows
    [p*W - h, p*W + W + h) sits inside virtual [p*Wc, p*Wc + Wc + 2*hc)
    once rebased by +hc.  ``verify_support`` checks the exact geometry per
    device, so these only need to be safe upper bounds."""
    S0 = (hx + 3) // 2 + 1
    hc = S0 + (halox + 3) // 2 + 1
    return S0, hc


def _window_width(W, hc):
    """Coarse window width, rounded up to lane-block alignment."""
    Wcv = W // 2 + 2 * hc
    return -(-Wcv // _HB) * _HB


def mg_local_tiled_supported(Xe, Y, dtype, nf, nconsts, hist, halox, hx,
                             budget=11 * 1024 * 1024):
    """Tile configuration (W, Xpad, h, hc, S0) for the local MG tiled
    backward, or None when no power-of-two tile >= 16 fits the budget."""
    if halox < 1 or halox > _HB:
        return None
    S0, hc = _margins(halox, hx)
    itemsize = np.dtype(dtype).itemsize
    h = halox
    CY = Y // 2

    def vmem(W):
        wide = (W + 2 * h) * Y * itemsize
        wplane = W * Y * itemsize
        Wcv = _window_width(W, hc)
        per_field = (
            2 * wplane                    # t0 own blocks (double-buffered)
            + 4 * _HB * Y * itemsize      # t0 halo streams
            + hist * wide                 # fine ring scratch
            + (hist + 1) * wplane         # cotangent accumulation ring
            + 2 * wplane                  # dt0 out
            + 2 * 2 * Wcv * CY * itemsize  # coarse windows in (k = 0, 1)
            + 2 * Wcv * CY * itemsize     # dc out
            + hist * wide                 # heads resident
            + hist * wide                 # dwraps out
            + 2 * 2 * hist * h * Y * itemsize  # edge outs
        )
        wsub = 2 * (W + 2 * h) * Wcv * itemsize
        # Resident Wy ((Y, Y/2): 2 MiB at Y=1024) and the split-dot stack
        # temporaries -- omitting these let the sibling global-tiled model
        # pick a width whose real Mosaic scoped allocation overflowed at
        # (65,1024,1024) (see mg_tiled_supported's calibration note).
        resident = Y * CY * itemsize
        split_tmp = 3 * Wcv * (CY + Y) * itemsize + (W + 2 * h) * Y * itemsize
        return nf * per_field + nconsts * 2 * wplane + wsub + resident + split_tmp

    W = 1 << int(np.floor(np.log2(max(Xe, 16))))
    fitting = []
    while W >= 16:
        if vmem(W) <= budget:
            fitting.append(W)
        W //= 2
    # Among fitting widths with at least two tiles (a single tile means the
    # untiled kernel applies and this kernel's halo streams would alias
    # their own tile), prefer the smallest padded extent, ties to the
    # larger tile (per-program overhead bias, as in pick_tile_pad).
    best = None
    for W in fitting:
        xpad = -(-Xe // W) * W
        if xpad // W < 2:
            continue
        if best is None or xpad < best[1] or (xpad == best[1] and W > best[0]):
            best = (W, xpad)
    if best is None:
        return None
    W, Xpad = best
    return (W, Xpad, h, hc, S0)


def verify_support(Wx_global, X, CX, XB, hx, k_x, cfg):
    """Host-side proof that the virtual-window geometry drops no weight on
    any row an UNMASKED residual can read: for EVERY device index, gather
    the device's prolongation rows exactly as the traced path will and
    check each tile's windowed sub-matrix carries the full row weight --
    the tiled reconstruction then equals the full-width one up to added
    exact zeros wherever it matters.

    Rows read only by masked residuals are exempt: with an x partition
    (hx = halox > 0) the wrapped row function masks every residual within
    halox of either extent end, so the last tile's periodic-wrap halo rows
    (which land on pad or opposite-end rows) feed nothing.  Without an x
    partition (hx == 0) the extent is the full X, Xpad == X, and the
    periodic wrap is the true one -- every row must check out.

    Also rejects a window wider than CX (it could alias itself through the
    modulo and double-count a column)."""
    W, Xpad, h, hc, S0 = cfg
    Wc = W // 2
    Wcv = _window_width(W, hc)
    nxt = Xpad // W
    CXv = (nxt - 1) * Wc + Wcv
    if Wcv > CX:
        return False
    Wxg = np.asarray(Wx_global, np.float64)
    for d in range(k_x):
        x0 = d * XB
        Xe = XB + 2 * hx if k_x > 1 else XB
        if hx > 0:
            unmasked = np.zeros(Xpad, bool)
            unmasked[hx : Xe - hx] = True  # pmask interior.
        else:
            if Xpad != Xe:
                return False  # True periodicity needs an exact extent.
            unmasked = np.ones(Xpad, bool)
        rows = (x0 - hx + np.arange(Xe)) % X
        Wxl_pad = np.concatenate(
            [Wxg[rows], np.zeros((Xpad - Xe, CX))], axis=0
        )
        s = x0 // 2 - S0
        idx = (np.arange(CXv) - hc + s) % CX
        Wvirt = Wxl_pad[:, idx]
        for p in range(nxt):
            rsel = np.arange(p * W - h, p * W + W + h) % Xpad
            # Widened position q is meaningfully read iff some residual at
            # an unmasked row within reach |q - r| <= h (residual positions
            # r in [h, W + h)) exists -- judged per COPY, not per row
            # identity: the last tile's wrap-halo copy of row 0 feeds only
            # masked pad residuals even though row 0 itself is live.
            keep = np.zeros(rsel.size, bool)
            for q in range(rsel.size):
                r0 = max(h, q - h)
                r1 = min(W + h - 1, q + h)
                for r in range(r0, r1 + 1):
                    if unmasked[(p * W - h + r) % Xpad]:
                        keep[q] = True
                        break
            sub = Wvirt[np.ix_(rsel, np.arange(p * Wc, p * Wc + Wcv))]
            full = np.abs(Wxl_pad[rsel]).sum(1)
            err = np.abs(np.abs(sub).sum(1) - full)
            if err[keep].max(initial=0.0) > 1e-12:
                return False
    return True


def _pad_zero_rows(a, Xpad):
    padn = Xpad - a.shape[0]
    if padn == 0:
        return a
    return jnp.concatenate([a, jnp.zeros((padn,) + a.shape[1:], a.dtype)], axis=0)


def _tile_rows(a, Xpad, W, h, axis):
    """Gathers per-tile widened row slabs along ``axis`` (periodic over the
    padded extent), stacking a leading tile dimension.  Static slices only."""
    nxt = Xpad // W
    tiles = []
    for p in range(nxt):
        rsel = np.arange(p * W - h, p * W + W + h) % Xpad
        spans = np.split(np.arange(rsel.size), np.where(np.diff(rsel) != 1)[0] + 1)
        parts = [
            jax.lax.slice_in_dim(a, int(rsel[sp[0]]), int(rsel[sp[-1]]) + 1, axis=axis)
            for sp in spans
        ]
        tiles.append(jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0])
    return jnp.stack(tiles)


def _untile_rows_add(acc, tiled, Xpad, W, h, axis):
    """Adjoint of ``_tile_rows``: folds per-tile widened slabs back into the
    padded extent (overlaps add).  ``axis`` indexes ACC's row axis; TILED
    has the leading tile dimension."""
    nxt = Xpad // W
    for p in range(nxt):
        rsel = np.arange(p * W - h, p * W + W + h) % Xpad
        spans = np.split(np.arange(rsel.size), np.where(np.diff(rsel) != 1)[0] + 1)
        o = 0
        for sp in spans:
            r0, r1 = int(rsel[sp[0]]), int(rsel[sp[-1]]) + 1
            sl_acc = [slice(None)] * acc.ndim
            sl_acc[axis] = slice(r0, r1)
            sl_t = [slice(None)] * acc.ndim
            sl_t[axis] = slice(o, o + (r1 - r0))
            acc = acc.at[tuple(sl_acc)].add(tiled[p][tuple(sl_t)])
            o += r1 - r0
    return acc


def _loss_and_grads_local_tiled(
    row_fn, nterms, hist, f0s, cfg, interpret,
    t0s, coarse, Wxl, Wy, heads, s_shift, params, consts, g, Xe_real,
):
    """Kernel + epilogue.  t0s/heads/plane-consts arrive PADDED to Xpad with
    the pad mask folded into row_fn; ``coarse`` is the device's
    (Tcw, CX, CY) time-window; ``Wxl`` the (Xe, CX) device rows of the
    global prolongation; ``s_shift`` the traced virtual shift x0//2 - S0.
    Returns (sums, dt0(Xe), dPw, dheads(Xe), dparams)."""
    W, Xpad, h, hc, S0 = cfg
    Tl, _, Y = t0s[0].shape
    Tcw, CX, CY = coarse[0].shape
    assert Tl % 2 == 1 and Tcw == (Tl - 1) // 2 + 1, (Tl, Tcw)
    assert h >= 1
    nxt = Xpad // W
    Wc = W // 2
    Wcv = _window_width(W, hc)
    CXv = (nxt - 1) * Wc + Wcv
    nf, np_ = len(t0s), len(params)
    adepth = hist + 1
    dtype = t0s[0].dtype
    gmat = jnp.reshape(g, (1, nterms))

    # --- The one gather that defines the virtual coarse axis ---
    idx = (jnp.arange(CXv) - hc + s_shift) % CX
    Wvirt = jnp.take(_pad_zero_rows(Wxl, Xpad), idx, axis=1)  # (Xpad, CXv)
    Wsub = _tile_rows(Wvirt, Xpad, W, h, axis=0)  # (nxt, W + 2h, CXv)
    Wsub = jnp.stack([Wsub[p, :, p * Wc : p * Wc + Wcv] for p in range(nxt)])
    coarse_v = [jnp.take(c, idx, axis=1) for c in coarse]  # (Tcw, CXv, CY)
    cwin = [
        jnp.stack([c[:, p * Wc : p * Wc + Wcv] for p in range(nxt)])
        for c in coarse_v
    ]  # (nxt, Tcw, Wcv, CY)
    heads_t = [_tile_rows(hd, Xpad, W, h, axis=1) for hd in heads] if hist else []

    # Plane-shaped consts tile + halo-stream; anything else streams whole.
    cti = [k for k, c in enumerate(consts) if c.ndim == 2 and c.shape == (Xpad, Y)]
    cwi = [k for k in range(len(consts)) if k not in cti]

    def t0_spec(shape):
        return pl.BlockSpec(
            (1, W, Y), lambda p, i: (jnp.clip(i, 0, Tl - 1), p, 0)
        )

    def t0_halo_spec(side):
        if side < 0:
            xb = lambda p: ((p * W - _HB) % Xpad) // _HB  # noqa: E731
        else:
            xb = lambda p: (((p + 1) % nxt) * W) // _HB  # noqa: E731
        return pl.BlockSpec(
            (1, _HB, Y), lambda p, i: (jnp.clip(i, 0, Tl - 1), xb(p), 0)
        )

    def c_spec(k):
        return pl.BlockSpec(
            (1, 1, Wcv, CY),
            lambda p, i: (
                p,
                jnp.minimum(jnp.clip(i, 0, Tl - 1) // 2 + k, Tcw - 1),
                0,
                0,
            ),
        )

    def const_spec():
        return pl.BlockSpec((W, Y), lambda p, i: (p, 0))

    def const_halo_spec(side):
        if side < 0:
            xb = lambda p: ((p * W - _HB) % Xpad) // _HB  # noqa: E731
        else:
            xb = lambda p: (((p + 1) % nxt) * W) // _HB  # noqa: E731
        return pl.BlockSpec((_HB, Y), lambda p, i: (xb(p), 0))

    def kernel(*refs):
        pos = 0
        t0_refs = refs[pos : pos + nf * 3]
        pos += nf * 3
        c_refs = refs[pos : pos + nf * 2]  # per f: window rows k = 0, 1
        pos += nf * 2
        head_refs = refs[pos : pos + len(heads_t)]
        pos += len(heads_t)
        wsub_ref = refs[pos]
        pos += 1
        wy_ref = refs[pos]
        pos += 1
        ct_refs = refs[pos : pos + len(cti) * 3]
        pos += len(cti) * 3
        cw_refs = refs[pos : pos + len(cwi)]
        pos += len(cwi)
        p_refs = refs[pos : pos + np_]
        pos += np_
        g_ref = refs[pos]
        pos += 1
        out_t0_refs = refs[pos : pos + nf]
        pos += nf
        out_dc_refs = refs[pos : pos + nf]
        pos += nf
        out_el_refs = refs[pos : pos + nf * adepth]
        pos += nf * adepth
        out_er_refs = refs[pos : pos + nf * adepth]
        pos += nf * adepth
        out_dw_refs = refs[pos : pos + (nf if hist else 0)]
        pos += nf if hist else 0
        out_p_refs = refs[pos : pos + np_]
        pos += np_
        out_sums_ref = refs[pos]
        pos += 1
        ring_refs = refs[pos : pos + (nf if hist else 0)]
        pos += nf if hist else 0
        acc_refs = refs[pos:]

        p, i = pl.program_id(0), pl.program_id(1)
        Wsub_v = wsub_ref[0]  # (W + 2h, Wcv)
        Wy_v = wy_ref[...]
        gvec = g_ref[0]
        params_v = tuple(r[...] for r in p_refs)
        consts_l = [None] * len(consts)
        for k, ci in enumerate(cti):
            consts_l[ci] = jnp.concatenate(
                [
                    ct_refs[3 * k + 1][_HB - h :],
                    ct_refs[3 * k][...],
                    ct_refs[3 * k + 2][:h],
                ],
                axis=0,
            )
        for k, ci in enumerate(cwi):
            consts_l[ci] = cw_refs[k][...]
        consts_v = tuple(consts_l)

        if hist:
            @pl.when(i == 0)
            def _():
                for f in range(nf):
                    out_dw_refs[f][0] = jnp.zeros((hist, W + 2 * h, Y), dtype)

        @pl.when(i < Tl)
        def _():
            wt = 0.5 * (i % 2).astype(dtype)
            t0_ws = []
            cblends = []
            for f in range(nf):
                t0_ws.append(
                    jnp.concatenate(
                        [
                            t0_refs[3 * f + 1][0][_HB - h :],
                            t0_refs[3 * f][0],
                            t0_refs[3 * f + 2][0][:h],
                        ],
                        axis=0,
                    )
                )  # (W + 2h, Y)
                c0w = c_refs[2 * f][0, 0]
                c1w = c_refs[2 * f + 1][0, 0]
                cblends.append((1.0 - wt) * c0w + wt * c1w)  # (Wcv, CY)
            # Split-operand exact dots (3 raw passes, fp32-grade; see
            # transfer.dot_xw), with the fields' inner dots batched into
            # one (M-independent below 128 rows: rowwise_mg._up2d_fields).
            ups = _mg._up2d_fields(cblends, Wsub_v, Wy_v)
            fresh_rows = []
            rows = []
            for f in range(nf):
                fresh = f0s[f] * t0_ws[f] + ups[f]
                fresh_rows.append(fresh)
                frows = [fresh]
                for m in range(1, hist + 1):
                    ring_row = ring_refs[f][(i - m) % hist]
                    head_row = head_refs[f][0, jnp.clip(hist + i - m, 0, hist - 1)]
                    frows.append(jnp.where(i - m >= 0, ring_row, head_row))
                rows.append(tuple(frows))

            def residuals_of(*args):
                flat_rows = args[: nf * (hist + 1)]
                pv = args[nf * (hist + 1) :]
                rws = tuple(
                    tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1))
                    for f in range(nf)
                )
                return tuple(row_fn(i, Tl, rws, (), pv, consts_v))

            flat_rows = tuple(rows[f][m] for f in range(nf) for m in range(hist + 1))
            res, vjp_fn = jax.vjp(residuals_of, *(flat_rows + tuple(params_v)))
            xw = jax.lax.broadcasted_iota(jnp.int32, (W + 2 * h, Y), 0)
            interior = (xw >= h) & (xw < W + h)
            w = tuple(
                jnp.where(interior, wk, 0) for wk in _weights_of(gvec, res, nterms)
            )
            cots = vjp_fn(w)
            first = (p == 0) & (i == 0)

            sums = _sumsq_vec(tuple(r[h : h + W] for r in res))
            out_sums_ref[0, :] = jnp.where(first, sums, out_sums_ref[0, :] + sums)
            for q in range(np_):
                cq = cots[nf * (hist + 1) + q]
                out_p_refs[q][...] = jnp.where(first, cq, out_p_refs[q][...] + cq)

            for f in range(nf):
                for m in range(1, hist + 1):
                    cw_ = cots[f * (hist + 1) + m]
                    acc_refs[f][(i - m) % adepth] += jnp.where(
                        i >= m, cw_[h : h + W], 0
                    )
                    # Head-row targets (i - m < 0) accumulate into the
                    # per-tile widened dwraps output (incl. halo columns).
                    out_dw_refs[f][0, jnp.clip(hist + i - m, 0, hist - 1)] += (
                        jnp.where(i < m, cw_, 0)
                    )
                    out_el_refs[f * adepth + m][0, 0] = cw_[:h]
                    out_er_refs[f * adepth + m][0, 0] = cw_[W + h :]
                c0_ = cots[f * (hist + 1)]
                acc_refs[f][i % adepth] = c0_[h : h + W]
                out_el_refs[f * adepth][0, 0] = c0_[:h]
                out_er_refs[f * adepth][0, 0] = c0_[W + h :]

            for f in range(nf):
                if hist:
                    ring_refs[f][i % hist] = fresh_rows[f]

        # Finalize interior cotangent of local row t = i - hist: split the
        # fine cotangent into t0 and raw-coarse parts by linearity of the
        # reconstruction (the t-blend runs in the epilogue).
        @pl.when(i >= hist)
        def _():
            completes = []
            for f in range(nf):
                complete = acc_refs[f][(i - hist) % adepth]
                out_t0_refs[f][0] = f0s[f] * complete
                completes.append(complete)
            # Field-batched cotangent down-projection (raw by default;
            # ODIL_MG_BWD_DOT=split opts back -- rowwise_mg._down2d).
            dcs = _mg._down2d_fields(completes, Wsub_v[h : h + W], Wy_v)
            for f in range(nf):
                out_dc_refs[f][0, 0] = dcs[f]

    in_specs = []
    inputs = []
    for f in range(nf):
        in_specs += [t0_spec(t0s[f].shape), t0_halo_spec(-1), t0_halo_spec(+1)]
        inputs += [t0s[f]] * 3
    for f in range(nf):
        for k in range(2):
            in_specs.append(c_spec(k))
            inputs.append(cwin[f])
    for ht in heads_t:
        in_specs.append(pl.BlockSpec((1,) + ht.shape[1:], lambda p, i: (p, 0, 0, 0)))
        inputs.append(ht)
    in_specs.append(pl.BlockSpec((1,) + Wsub.shape[1:], lambda p, i: (p, 0, 0)))
    inputs.append(Wsub)
    in_specs.append(_whole(Wy.shape))
    inputs.append(Wy)
    for ci in cti:
        in_specs += [const_spec(), const_halo_spec(-1), const_halo_spec(+1)]
        inputs += [consts[ci]] * 3
    for ci in cwi:
        in_specs.append(_whole(consts[ci].shape))
        inputs.append(consts[ci])
    in_specs += [_whole(q.shape) for q in params]
    inputs += list(params)
    in_specs.append(_whole((1, nterms)))
    inputs.append(gmat)

    edge_shape = (nxt, Tl, h, Y)
    edge_spec = pl.BlockSpec(
        (1, 1, h, Y), lambda p, i: (p, jnp.clip(i, 0, Tl - 1), 0, 0)
    )
    dc_shape = (nxt, Tl, Wcv, CY)
    dw_shape = (nxt, hist, W + 2 * h, Y)
    out_specs = (
        [
            pl.BlockSpec((1, W, Y), lambda p, i: (jnp.clip(i - hist, 0, Tl - 1), p, 0))
            for _ in range(nf)
        ]
        + [
            pl.BlockSpec(
                (1, 1, Wcv, CY),
                lambda p, i: (p, jnp.clip(i - hist, 0, Tl - 1), 0, 0),
            )
            for _ in range(nf)
        ]
        + [edge_spec] * (nf * adepth)
        + [edge_spec] * (nf * adepth)
        + (
            [
                pl.BlockSpec((1, hist, W + 2 * h, Y), lambda p, i: (p, 0, 0, 0))
                for _ in range(nf)
            ]
            if hist
            else []
        )
        + [_whole(q.shape) for q in params]
        + [_whole((1, nterms))]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((Tl, Xpad, Y), dtype) for _ in t0s]
        + [jax.ShapeDtypeStruct(dc_shape, dtype)] * nf
        + [jax.ShapeDtypeStruct(edge_shape, dtype)] * (nf * adepth)
        + [jax.ShapeDtypeStruct(edge_shape, dtype)] * (nf * adepth)
        + ([jax.ShapeDtypeStruct(dw_shape, dtype)] * nf if hist else [])
        + [jax.ShapeDtypeStruct(q.shape, q.dtype) for q in params]
        + [jax.ShapeDtypeStruct((1, nterms), dtype)]
    )
    scratch = (
        [pltpu.VMEM((hist, W + 2 * h, Y), dtype) for _ in (t0s if hist else ())]
        + [pltpu.VMEM((adepth, W, Y), dtype) for _ in t0s]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nxt, Tl + hist),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)

    pos = 0
    dt0 = list(outs[pos : pos + nf])
    pos += nf
    dcs = outs[pos : pos + nf]
    pos += nf
    els = outs[pos : pos + nf * adepth]
    pos += nf * adepth
    ers = outs[pos : pos + nf * adepth]
    pos += nf * adepth
    dws = outs[pos : pos + nf] if hist else []
    pos += nf if hist else 0
    dparams = tuple(outs[pos : pos + np_])
    pos += np_
    sums = outs[pos][0]

    # ---- XLA epilogue (small arrays) ----
    # 1. Edge cotangents of fine rows: residual row j's offset-m cotangent
    #    targets fine row j - m; head targets (j - m < 0) already left via
    #    the dwraps outputs, so shift-and-drop rather than roll.
    edge_rows = np.concatenate(
        [
            np.concatenate(
                [np.arange(p * W - h, p * W), np.arange(p * W + W, p * W + W + h)]
            )
            for p in range(nxt)
        ]
    ) % Xpad
    efine = []
    for f in range(nf):
        acc = jnp.zeros((Tl, nxt, 2 * h, Y), dtype)
        for m in range(adepth):
            el = els[f * adepth + m]  # (nxt, Tl, h, Y), indexed by row j.
            er = ers[f * adepth + m]
            contrib = jnp.transpose(
                jnp.concatenate([el, er], axis=2), (1, 0, 2, 3)
            )  # (Tl, nxt, 2h, Y)
            if m:
                acc = acc.at[: Tl - m].add(contrib[m:])
            else:
                acc = acc + contrib
        efine.append(acc.reshape(Tl, nxt * 2 * h, Y))

    # 2. Fold the edge cotangents into dt0 (pad-region targets are exact
    #    zeros under the masked-edge contract; sliced off below).
    for f in range(nf):
        dt0[f] = dt0[f].at[:, edge_rows].add(f0s[f] * efine[f])

    # 3. Coarse cotangent: fold the per-tile raw windows into the virtual
    #    axis (overlaps add), add the edge rows' coarse part, t-blend the
    #    local fine rows into the window rows (row t feeds coarse rows t//2
    #    and t//2 + 1), then transpose the virtual gather with one
    #    scatter-add back to the original columns.
    W_edge = Wvirt[edge_rows]  # (nxt * 2h, CXv)
    dPw = []
    for f in range(nf):
        full = jnp.zeros((Tl, CXv, CY), dtype)
        for p in range(nxt):
            full = full.at[:, p * Wc : p * Wc + Wcv].add(dcs[f][p])
        full = full + jnp.einsum("ev,tey,yc->tvc", W_edge, efine[f], Wy)
        ev_rows = full[0::2]  # (Tcw, CXv, CY)
        odd = full[1::2]  # (Tcw - 1, ...)
        zeros = jnp.zeros((1, CXv, CY), dtype)
        blended = (
            ev_rows
            + 0.5 * jnp.concatenate([zeros, odd], axis=0)
            + 0.5 * jnp.concatenate([odd, zeros], axis=0)
        )
        dPw.append(jnp.zeros((Tcw, CX, CY), dtype).at[:, idx].add(blended))

    # 4. Head cotangents: fold the per-tile widened slabs (tile-overlap
    #    adds) into the padded extent, slice to the real one.
    dheads = []
    for f in range(nf):
        if not hist:
            dheads.append(jnp.zeros((0, Xe_real, Y), dtype))
            continue
        acc = jnp.zeros((hist, Xpad, Y), dtype)
        acc = _untile_rows_add(acc, dws[f], Xpad, W, h, axis=1)
        dheads.append(acc[:, :Xe_real])

    dt0 = tuple(d[:, :Xe_real] for d in dt0)
    return sums, dt0, tuple(dPw), tuple(dheads), dparams


def rowwise_mg_local_tiled_loss_and_grads(
    row_fn,
    t0s,
    coarse,
    Wx,
    Wy,
    factors0,
    heads,
    s_shift,
    cfg,
    params=(),
    consts=(),
    nterms=1,
    hist=1,
    gscale=1.0,
    interpret=None,
):
    """x-tiled form of ``rowwise_mg.rowwise_mg_local_loss_and_grads`` for
    beyond-VMEM local blocks.  Same contract -- returns
    ``(sums, (dt0, dcoarse, dheads, dparams))`` with cotangents in the
    ORIGINAL (Xe-extent) shapes -- plus:

    s_shift: traced virtual-axis shift ``x0 // 2 - S0`` (x0 the device's
    global x offset, S0 from the cfg).
    cfg: (W, Xpad, h, hc, S0) from ``mg_local_tiled_supported``; the
    caller must have host-verified the window geometry with
    ``verify_support`` for its mesh.

    The wrapped row function must already mask residuals within ``halox``
    of either x end (the halo-extended-block contract); the edge padding
    to Xpad rides on exactly that masking via an appended 0/1 pad-mask
    const.  Consts must be (Xe, Y) planes or whole-streamed small arrays."""
    from .rowwise import _on_tpu

    t0s = tuple(jnp.asarray(t) for t in t0s)
    coarse = tuple(jnp.asarray(c) for c in coarse)
    heads = tuple(jnp.asarray(hd) for hd in heads)
    consts = tuple(jnp.asarray(c) for c in consts)
    W, Xpad, h, hc, S0 = cfg
    Tl, Xe, Y = t0s[0].shape
    assert Tl > 2 * hist, (Tl, hist)
    assert Wx.shape == (Xe, coarse[0].shape[1]), (Wx.shape,)
    if interpret is None:
        interpret = not _on_tpu()
    dtype = t0s[0].dtype
    f0s = tuple(float(f) for f in factors0)
    g = jnp.full((nterms,), gscale, dtype)

    if Xpad != Xe:
        # Edge-pad the extent under the masked-edge contract; the appended
        # 0/1 const masks residuals at the padded rows.
        xmask = (jnp.arange(Xpad) < Xe).astype(dtype)[:, None] * jnp.ones(
            (1, Y), dtype
        )
        t0s = tuple(_pad_x_edge(t, Xpad) for t in t0s)
        heads = tuple(_pad_x_edge(hd, Xpad) for hd in heads)
        consts = tuple(
            _pad_x_edge(c, Xpad) if (c.ndim == 2 and c.shape == (Xe, Y)) else c
            for c in consts
        ) + (xmask,)
        inner_fn = row_fn

        def row_fn(it, T_, rows, data_rows, pv, cons):  # noqa: F811
            res = inner_fn(it, T_, rows, data_rows, pv, cons[:-1])
            return tuple(r * cons[-1] for r in res)

    sums, dt0, dPw, dheads, dparams = _loss_and_grads_local_tiled(
        row_fn, nterms, hist, f0s, cfg, interpret,
        t0s, coarse, jnp.asarray(Wx, dtype), jnp.asarray(Wy, dtype),
        heads, s_shift,
        tuple(jnp.asarray(q) for q in params),
        consts, g, Xe,
    )
    return sums, (dt0, dPw, dheads, dparams)
