"""x-tiled MG-fused one-pass loss+gradient kernel (training path, 512^2+).

Combines ``rowwise_mg.py`` (finest multigrid Horner step fused into the
kernel; one-pass loss AND gradients) with ``rowwise_tiled.py`` (x axis as
a second grid dimension for planes whose whole-plane working set exceeds
VMEM).  Training-only: the eval path at these sizes keeps the plain
x-tiled kernel + XLA ladder.

Per program (p, i) of a (nxt, T + hist) grid:

- reconstructs the *widened* fine row i of x-tile p in VMEM:
  ``fine = f0 * t0_w + Wsub[p] @ blend_t(c0_w, c1_w) @ Wy^T`` where
  ``Wsub[p]`` is the host-precomposed sub-matrix of the global per-axis
  prolongation mapping the tile's widened coarse window (``Wc + 2*hc``
  columns, periodic gather) to its widened fine rows (``W + 2*h``);
  a host-side assert verifies no dropped column carries weight.
- carries the widened row in a per-tile VMEM ring (depth ``hist``; rows
  with no producer in this tile's sweep -- the periodic t-wrap -- enter
  as XLA-reconstructed residents),
- runs ONE ``jax.vjp`` of residual row i (single-linearization scatter
  scheme of ``rowwise_mg._backward_mg``), accumulating per-term sums of
  squares (the loss comes free) and scattering interior fine cotangents
  into a depth-(hist+1) accumulation ring; cotangents of the halo x-rows
  are emitted raw as small (nxt, T, h, Y) per-offset edge outputs,
- finalizes row t = i - hist: writes the interior t0 cotangent
  (``f0 * dfine``) and accumulates the t-BLENDED fine cotangent in a
  depth-2 ring (coarse row c collects rows 2c-1, 2c, 2c+1 with weights
  .5, 1, .5); when row c closes (t = 2c+1, or T-1 for the last), ONE
  widened coarse cotangent row ``Wsub[p][h:h+W]^T @ dacc[c] @ Wy`` is
  written -- one down-projection and one dc output row per COARSE row
  (half the matmul volume and dc traffic of the per-fine-row form);
  the tile-overlap fold happens in a cheap XLA epilogue (same linear
  algebra, reassociated).  The forward keeps one up-projection per FINE
  row: a mirrored ring of prolonged coarse planes was built and measured
  a wash-to-loss (the forward matmuls overlap with the block DMAs), and
  stacking both rings overflows the 16 MiB scoped-vmem cap at W=128 --
  W=64 both-rings: 5.05 ms/iter; W=128 forward-ring-only: 4.68; W=128
  this form: 4.33; shipped round-3 form: 4.61 (all at (64,512,512)).

The epilogue also pushes the edge cotangents through the *global*
prolongation rows (t0 part and coarse part) -- tiny dense ops over
``nxt * 2h`` x-rows -- and t-blends the edge term to the coarse rows.
"""



import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..transfer import _interp_matrix
from .rowwise import _sumsq_vec, _weights_of
from . import rowwise_mg as _mg
from .rowwise_mg import _recon_rows_xla

__all__ = ["rowwise_mg_tiled_loss_and_grads", "mg_tiled_supported"]

_HB = 8  # Halo block sublane granularity (Mosaic alignment).


def _whole(shape):
    ndim = len(shape)
    return pl.BlockSpec(tuple(shape), lambda p, i: (0,) * ndim)


def _build_tile_matrices(X, W, h, hc, dtype):
    """(nxt, W + 2h, Wc + 2hc) per-tile sub-matrices of the global fine<-
    coarse prolongation along x (cell-located), rows/cols gathered with
    periodic wrap.  Asserts that the dropped columns carry no weight."""
    CX = X // 2
    Wc = W // 2
    nxt = X // W
    Wx = _interp_matrix(CX, "c", np.float64)  # (X, CX)
    subs = np.zeros((nxt, W + 2 * h, Wc + 2 * hc), np.float64)
    for p in range(nxt):
        rows = (np.arange(p * W - h, p * W + W + h)) % X
        cols = (np.arange(p * Wc - hc, p * Wc + Wc + hc)) % CX
        sub = Wx[np.ix_(rows, cols)]
        # Every selected row's full support must lie inside the window.
        full = np.abs(Wx[rows])
        assert abs(full.sum(1) - np.abs(sub).sum(1)).max() < 1e-12, (
            "coarse halo window too narrow for the prolongation support"
        )
        subs[p] = sub
    return subs.astype(dtype), Wx.astype(dtype)


def mg_tiled_supported(t0_shapes, dtype, hist=1, budget=12 * 1024 * 1024):
    """True when the tiled mg backward fits VMEM for some power-of-two
    tile width; returns the chosen (W, h, hc) or None.

    Calibration (v5e, round 5): the model must also count the RESIDENT
    prolongation matrices (Wy is (Y, Y/2) -- 2 MiB of VMEM at Y=1024)
    and the split-dot stack temporaries, or it picks W=64 at
    (65,1024,1024) where Mosaic's real scoped allocation is 19.69 MiB
    (compile-time VMEM OOM).  Measured anchors: (65,512,512) W=128
    (model 11.91 MiB) compiles and runs 4.15 ms/iter; (65,1024,1024)
    W=64 (model 13.50 MiB) OOMs; W=32 (7.85 MiB) compiles and runs
    24.3 ms/iter at full shipped precision.  The 12 MiB budget
    separates the anchors."""
    T, X, Y = t0_shapes[0]
    nf = len(t0_shapes)
    if X % 2 or Y % 2 or X < 64:
        return None
    itemsize = np.dtype(dtype).itemsize
    h, hc = 1, 2

    def vmem(W):
        wide = (W + 2 * h) * Y * itemsize
        wplane = W * Y * itemsize
        cplane = (W // 2) * (Y // 2) * itemsize
        per_field = (
            2 * wplane              # t0 in (double-buffered)
            + hist * wide           # fine ring
            + (hist + 1) * wplane   # accumulation ring
            + hist * wplane         # wrap-cotangent scratch
            + 2 * wplane            # blended coarse-cotangent ring (dacc)
            + 2 * wplane            # dt0 out
            + 4 * cplane + 2 * (W // 2 + 2 * hc) * (Y // 2) * itemsize
            + hist * wide           # wrap residents
        )
        resident = (
            Y * (Y // 2) * itemsize                          # Wy
            + (X // max(W, 1)) * (W + 2 * h) * (W // 2 + 2 * hc) * itemsize
        )
        # Split-dot stack temporaries of the in-kernel up/down projections
        # (3 bf16-exact terms of the coarse window and the intermediate).
        split_tmp = (
            3 * (W // 2 + 2 * hc) * (Y // 2 + Y) * itemsize
            + (W + 2 * h) * Y * itemsize
        )
        return nf * per_field + 2 * 2 * wplane + resident + split_tmp

    W = X
    while W % 2 == 0 and W > 16 and vmem(W) > budget:
        W //= 2
    if W % 16 or W // 2 < _HB or vmem(W) > budget or W >= X:
        # W >= X means the untiled kernel applies; this one is for tiles.
        return None
    return (W, h, hc)


def _loss_and_grads_tiled(
    row_fn, nterms, hist, f0s, W, h, hc, interpret, t0s, coarse, params, consts, g
):
    T, X, Y = t0s[0].shape
    Tc, CX, CY = coarse[0].shape
    assert T % 2 == 1 and T == 2 * (Tc - 1) + 1, (T, Tc)
    assert (CX, CY) == (X // 2, Y // 2)
    nxt = X // W
    Wc = W // 2
    nf, np_ = len(t0s), len(params)
    adepth = hist + 1
    dtype = t0s[0].dtype
    gmat = jnp.reshape(g, (1, nterms))
    subs_np, Wx_np = _build_tile_matrices(X, W, h, hc, np.float64)
    Wsub = jnp.asarray(subs_np.astype(dtype))
    Wy_np = _interp_matrix(CY, "c", dtype)
    Wy = jnp.asarray(Wy_np)  # (Y, CY)
    # y-banded projections past the threshold (rowwise_mg.bands_for): the
    # dense inner dot is O(Y) MACs per cell, the at-scale decay driver.
    bands = _mg.bands_for(Wy_np, Y)

    # Periodic t-wrap rows T-hist..T-1, reconstructed by XLA at full X with
    # the identical operation order, then gathered into widened tiles.
    def wrap_resident(f):
        full = _recon_rows_xla(
            t0s[f], coarse[f], range(T - hist, T),
            jnp.asarray(Wx_np.astype(dtype)), Wy, f0s[f], bands=bands,
        )  # (hist, X, Y)
        tiles = []
        for p in range(nxt):
            rows = (np.arange(p * W - h, p * W + W + h)) % X
            tiles.append(full[:, rows])
        return jnp.stack(tiles)  # (nxt, hist, W + 2h, Y)

    wraps = [wrap_resident(f) for f in range(nf)] if hist else []

    # (Deeper multi-buffering of the fine streams via
    # pl.Buffered(buffer_count>2) is a measured dead end: Mosaic rejects
    # buffer counts beyond double buffering, and lookahead is
    # unsupported by the pipeline emitter -- BENCH_NOTES round 5.)
    def t0_spec(toff):
        return pl.BlockSpec((1, W, Y), lambda p, i: ((i + toff) % T, p, 0))

    def t0_halo_spec(side):
        if side < 0:
            xb = lambda p: ((p * W - _HB) % X) // _HB  # noqa: E731
        else:
            xb = lambda p: (((p + 1) % nxt) * W) // _HB  # noqa: E731
        return pl.BlockSpec((1, _HB, Y), lambda p, i: (i % T, xb(p), 0))

    def c_spec(k):
        return pl.BlockSpec(
            (1, Wc, CY), lambda p, i: (jnp.minimum((i % T) // 2 + k, Tc - 1), p, 0)
        )

    def c_halo_spec(k, side):
        if side < 0:
            xb = lambda p: ((p * Wc - _HB) % CX) // _HB  # noqa: E731
        else:
            xb = lambda p: (((p + 1) % nxt) * Wc) // _HB  # noqa: E731
        return pl.BlockSpec(
            (1, _HB, CY), lambda p, i: (jnp.minimum((i % T) // 2 + k, Tc - 1), xb(p), 0)
        )

    def const_spec():
        return pl.BlockSpec((W, Y), lambda p, i: (p, 0))

    def const_halo_spec(side):
        if side < 0:
            xb = lambda p: ((p * W - _HB) % X) // _HB  # noqa: E731
        else:
            xb = lambda p: (((p + 1) % nxt) * W) // _HB  # noqa: E731
        return pl.BlockSpec((_HB, Y), lambda p, i: (xb(p), 0))

    def kernel(*refs):
        pos = 0
        t0_refs = refs[pos : pos + nf * 3]
        pos += nf * 3
        c_refs = refs[pos : pos + nf * 6]  # per f: (k0 own,L,R), (k1 own,L,R)
        pos += nf * 6
        wrap_refs = refs[pos : pos + len(wraps)]
        pos += len(wraps)
        wsub_ref = refs[pos]
        pos += 1
        wy_ref = refs[pos]
        pos += 1
        const_refs = refs[pos : pos + len(consts) * 3]
        pos += len(consts) * 3
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
        out_p_refs = refs[pos : pos + np_]
        pos += np_
        out_sums_ref = refs[pos]
        pos += 1
        ring_refs = refs[pos : pos + (nf if hist else 0)]
        pos += nf if hist else 0
        acc_refs = refs[pos : pos + nf]
        pos += nf
        wcot_refs = refs[pos : pos + (nf if hist else 0)]
        pos += nf if hist else 0
        dacc_refs = refs[pos:]

        p, i = pl.program_id(0), pl.program_id(1)
        Wsub_v = wsub_ref[0]  # (W + 2h, Wc + 2hc)
        Wy_v = wy_ref[...]
        gvec = g_ref[0]
        params_v = tuple(r[...] for r in p_refs)
        consts_v = tuple(
            jnp.concatenate(
                [
                    const_refs[3 * c + 1][_HB - h :],
                    const_refs[3 * c][...],
                    const_refs[3 * c + 2][:h],
                ],
                axis=0,
            )
            for c in range(len(consts))
        )

        @pl.when(i < T)
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
                cw = []
                for k in range(2):
                    base = 6 * f + 3 * k
                    cw.append(
                        jnp.concatenate(
                            [
                                c_refs[base + 1][0][_HB - hc :],
                                c_refs[base][0],
                                c_refs[base + 2][0][:hc],
                            ],
                            axis=0,
                        )
                    )  # (Wc + 2hc, CY)
                cblends.append((1.0 - wt) * cw[0] + wt * cw[1])
            # Split-operand exact dots (W matrices are bf16-exact); see
            # rowwise_mg._dot_xw for the precision contract.  All fields'
            # inner dots batch into one (the dot is M-independent below
            # 128 rows: _up2d_fields); y-banded per field past the
            # opt-in threshold.
            if bands:
                ups = [
                    _mg._up2d_banded(c, Wsub_v, Wy_v, bands) for c in cblends
                ]
            else:
                ups = _mg._up2d_fields(cblends, Wsub_v, Wy_v)
            fresh_rows = []
            rows = []
            for f in range(nf):
                fresh = f0s[f] * t0_ws[f] + ups[f]
                fresh_rows.append(fresh)
                frows = [fresh]
                for m in range(1, hist + 1):
                    ring_row = ring_refs[f][(i - m) % hist]
                    wrap_row = wrap_refs[f][0, jnp.clip(hist + i - m, 0, hist - 1)]
                    frows.append(jnp.where(i - m >= 0, ring_row, wrap_row))
                rows.append(tuple(frows))

            def residuals_of(*args):
                flat_rows = args[: nf * (hist + 1)]
                pv = args[nf * (hist + 1) :]
                rws = tuple(
                    tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1))
                    for f in range(nf)
                )
                return tuple(row_fn(i, T, rws, (), pv, consts_v))

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

            if hist:
                @pl.when(i == 0)
                def _():
                    for f in range(nf):
                        wcot_refs[f][...] = jnp.zeros((hist, W, Y), dtype)

            for f in range(nf):
                for m in range(1, hist + 1):
                    cw_ = cots[f * (hist + 1) + m]
                    acc_refs[f][(i - m) % adepth] += jnp.where(
                        i >= m, cw_[h : h + W], 0
                    )
                    wcot_refs[f][jnp.clip(hist + i - m, 0, hist - 1)] += jnp.where(
                        i < m, cw_[h : h + W], 0
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

        # Finalize interior cotangent of row t = i - hist.  The coarse
        # part accumulates the t-BLENDED fine cotangent per coarse row
        # (row c collects fine rows 2c-1, 2c, 2c+1 with weights .5, 1,
        # .5; the t-blend moved ahead of the linear transposed
        # prolongation) and down-projects ONCE per coarse row when it
        # closes (t = 2c+1, or T-1 for the last row): one down2d per
        # COARSE row and one dc output row per COARSE row; the tile fold
        # stays in the XLA epilogue.
        @pl.when(i >= hist)
        def _():
            t = i - hist
            todd = t % 2 == 1
            for f in range(nf):
                complete = acc_refs[f][t % adepth]
                if hist:
                    wrapc = wcot_refs[f][jnp.clip(i - T, 0, hist - 1)]
                    complete = jnp.where(i >= T, complete + wrapc, complete)
                out_t0_refs[f][0] = f0s[f] * complete

                # Even t: weight-1 contribution to coarse row t//2 (t == 0
                # initializes; the where discards the uninit read).
                @pl.when(~todd)
                def _(f=f, complete=complete):
                    slot = (t // 2) % 2
                    prev = jnp.where(
                        t == 0, jnp.zeros_like(complete), dacc_refs[f][slot]
                    )
                    dacc_refs[f][slot] = prev + complete

                # Odd t: .5 to coarse row (t-1)//2 (its last contribution)
                # and .5 OPENS row (t+1)//2 (assignment initializes).
                @pl.when(todd)
                def _(f=f, complete=complete):
                    dacc_refs[f][((t - 1) // 2) % 2] += 0.5 * complete
                    dacc_refs[f][((t + 1) // 2) % 2] = 0.5 * complete

            closing = todd | (t == T - 1)

            @pl.when(closing)
            def _():
                c = jnp.where(todd, (t - 1) // 2, t // 2)
                daccs = [dacc_refs[f][c % 2] for f in range(nf)]
                # Cotangent down-projection (raw by default, see
                # rowwise_mg._down2d): one field-batched inner dot per
                # closing coarse row; y-banded past the opt-in threshold.
                if bands:
                    dcs = [
                        _mg._down2d_banded(d, Wsub_v[h : h + W], Wy_v, bands)
                        for d in daccs
                    ]
                else:
                    dcs = _mg._down2d_fields(daccs, Wsub_v[h : h + W], Wy_v)
                for f in range(nf):
                    out_dc_refs[f][0, 0] = dcs[f]

    in_specs = []
    inputs = []
    for f in range(nf):
        in_specs += [t0_spec(0), t0_halo_spec(-1), t0_halo_spec(+1)]
        inputs += [t0s[f]] * 3
    for f in range(nf):
        for k in range(2):
            in_specs += [c_spec(k), c_halo_spec(k, -1), c_halo_spec(k, +1)]
            inputs += [coarse[f]] * 3
    for wr in wraps:
        in_specs.append(pl.BlockSpec((1,) + wr.shape[1:], lambda p, i: (p, 0, 0, 0)))
        inputs.append(wr)
    in_specs.append(pl.BlockSpec((1,) + Wsub.shape[1:], lambda p, i: (p, 0, 0)))
    inputs.append(Wsub)
    in_specs.append(_whole(Wy.shape))
    inputs.append(Wy)
    for c in consts:
        in_specs += [const_spec(), const_halo_spec(-1), const_halo_spec(+1)]
        inputs += [c] * 3
    in_specs += [_whole(q.shape) for q in params]
    inputs += list(params)
    in_specs.append(_whole((1, nterms)))
    inputs.append(gmat)

    edge_shape = (nxt, T, h, Y)
    edge_spec = pl.BlockSpec(
        (1, 1, h, Y), lambda p, i: (p, jnp.minimum(i, T - 1), 0, 0)
    )
    dc_shape = (nxt, Tc, Wc + 2 * hc, CY)
    out_specs = (
        [pl.BlockSpec((1, W, Y), lambda p, i: ((i - hist) % T, p, 0)) for _ in range(nf)]
        + [
            pl.BlockSpec(
                (1, 1, Wc + 2 * hc, CY),
                lambda p, i: (p, jnp.clip((i - hist) // 2, 0, Tc - 1), 0, 0),
            )
            for _ in range(nf)
        ]
        + [edge_spec] * (nf * adepth)
        + [edge_spec] * (nf * adepth)
        + [_whole(q.shape) for q in params]
        + [_whole((1, nterms))]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(t.shape, dtype) for t in t0s]
        + [jax.ShapeDtypeStruct(dc_shape, dtype)] * nf
        + [jax.ShapeDtypeStruct(edge_shape, dtype)] * (nf * adepth)
        + [jax.ShapeDtypeStruct(edge_shape, dtype)] * (nf * adepth)
        + [jax.ShapeDtypeStruct(q.shape, q.dtype) for q in params]
        + [jax.ShapeDtypeStruct((1, nterms), dtype)]
    )
    scratch = (
        [pltpu.VMEM((hist, W + 2 * h, Y), dtype) for _ in (t0s if hist else ())]
        + [pltpu.VMEM((adepth, W, Y), dtype) for _ in t0s]
        + [pltpu.VMEM((hist, W, Y), dtype) for _ in (t0s if hist else ())]
        + [pltpu.VMEM((2, W, Y), dtype) for _ in t0s]  # dacc
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nxt, T + hist),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)

    dt0 = list(outs[:nf])
    dcs = outs[nf : 2 * nf]
    els = outs[2 * nf : 2 * nf + nf * adepth]
    ers = outs[2 * nf + nf * adepth : 2 * nf + 2 * nf * adepth]
    dparams = tuple(outs[2 * nf + 2 * nf * adepth : -1])
    sums = outs[-1][0]

    # ---- XLA epilogue (small arrays) ----
    # 1. Gather per-field edge cotangents of fine rows: contributions from
    #    residual row j at offset m target fine row (j - m) % T.
    #    efine[f]: (T, nxt, 2h, Y) cotangent of global fine x-rows
    #    edge_rows[p] = [pW-h .. pW) ++ [pW+W .. pW+W+h).
    edge_rows = np.concatenate(
        [
            np.concatenate(
                [np.arange(p * W - h, p * W), np.arange(p * W + W, p * W + W + h)]
            )
            for p in range(nxt)
        ]
    ) % X  # (nxt * 2h,)
    efine = []
    for f in range(nf):
        acc = jnp.zeros((T, nxt, 2 * h, Y), dtype)
        for m in range(adepth):
            el = jnp.roll(els[f * adepth + m], -m, axis=1)  # (nxt, T, h, Y)
            er = jnp.roll(ers[f * adepth + m], -m, axis=1)
            contrib = jnp.concatenate([el, er], axis=2)  # (nxt, T, 2h, Y)
            acc = acc + jnp.transpose(contrib, (1, 0, 2, 3))
        efine.append(acc)

    # 2. Fold edge cotangents into dt0 (f0 * e at the edge x-rows).  Each
    #    boundary-adjacent fine row receives EXACTLY ONE contribution (the
    #    [pW-h, pW) sets are pairwise disjoint, as are [pW+W, pW+W+h), and
    #    the two families never meet), so the fold is a static roll +
    #    concat + add over the (T, nxt, W, Y) tile view -- NOT a scatter.
    #    ``.at[:, edge_rows].add`` here made XLA lay out the whole
    #    full-size operand chain in a transposed {2,0,1} layout, costing
    #    ~1 ms/iter of layout-flip copies at 512^2 (round-4 profile).
    #    Bitwise-identical: one contribution per row, adds commute.
    assert 2 * h <= W
    for f in range(nf):
        to_last = jnp.roll(efine[f][:, :, :h], -1, axis=1)  # left edge of p+1
        to_first = jnp.roll(efine[f][:, :, h:], 1, axis=1)  # right edge of p-1
        upd = jnp.concatenate(
            [to_first, jnp.zeros((T, nxt, W - 2 * h, Y), dtype), to_last],
            axis=2,
        )
        dt0[f] = (dt0[f].reshape(T, nxt, W, Y) + f0s[f] * upd).reshape(T, X, Y)

    # 3. Coarse cotangent: the kernel already t-blended the interior rows
    #    (dc holds one row per COARSE row); fold the widened tile windows
    #    (periodic) into the full coarse plane, then add the edge rows
    #    pushed through the global matrix (t-blended here).
    Wx_t = jnp.asarray(Wx_np.astype(dtype))
    W_edge = Wx_t[edge_rows]  # (nxt*2h, CX)
    dcoarse = []
    assert 2 * hc <= Wc
    zeros_row = jnp.zeros((1, CX, CY), dtype)
    for f in range(nf):
        dc = dcs[f]  # (nxt, Tc, Wc + 2hc, CY)
        # Edge-row coarse contribution at full width, per fine row t.
        dc_edge = jnp.einsum(
            "re,tey,yc->trc", W_edge.T, efine[f].reshape(T, nxt * 2 * h, Y), Wy
        )
        # (T, CX, CY): W_edge.T is (CX, nxt*2h); Wy restricts Y -> CY.
        # t-blend the edge term: edge_b[c] = e[2c] + .5*(e[2c-1] + e[2c+1]).
        ev = dc_edge[0::2]  # (Tc, CX, CY)
        odd = dc_edge[1::2]  # (Tc - 1, ...)
        edge_b = (
            ev
            + 0.5 * jnp.concatenate([zeros_row, odd], axis=0)
            + 0.5 * jnp.concatenate([odd, zeros_row], axis=0)
        )
        # Fold the widened tile windows into the (Tc, nxt, Wc, CY) tile
        # view with static rolls + one concat + add (see the dt0 fold
        # above): window p's core [hc, hc+Wc) lands on its own tile, its
        # left hc columns on the last hc of tile p-1, its right hc on the
        # first hc of tile p+1.  Each column sums core + at most one edge
        # -- commutative, so identical to the old sequential span adds.
        core = jnp.transpose(dc[:, :, hc : hc + Wc], (1, 0, 2, 3))
        to_last = jnp.roll(jnp.transpose(dc[:, :, :hc], (1, 0, 2, 3)), -1, axis=1)
        to_first = jnp.roll(
            jnp.transpose(dc[:, :, hc + Wc :], (1, 0, 2, 3)), 1, axis=1
        )
        upd = jnp.concatenate(
            [to_first, jnp.zeros((Tc, nxt, Wc - 2 * hc, CY), dtype), to_last],
            axis=2,
        )
        dcoarse.append((core + upd).reshape(Tc, CX, CY) + edge_b)
    return sums, tuple(dt0), tuple(dcoarse), dparams


def rowwise_mg_tiled_loss_and_grads(
    row_fn,
    t0s,
    coarse,
    factors0,
    params=(),
    consts=(),
    nterms=1,
    hist=1,
    tile_cfg=None,
    interpret=None,
):
    """One-pass fused loss AND gradients through the x-tiled mg kernel.

    Same contract as ``rowwise_mg.rowwise_mg_loss_and_grads`` (returns
    (terms, (dt0, dcoarse, dparams)); not differentiable -- it IS the
    gradient), restricted to data-free problems.  ``tile_cfg`` is the
    (W, h, hc) triple from ``mg_tiled_supported``."""
    from .rowwise import _on_tpu

    t0s = tuple(jnp.asarray(t) for t in t0s)
    coarse = tuple(jnp.asarray(c) for c in coarse)
    if tile_cfg is None:
        tile_cfg = mg_tiled_supported(tuple(t.shape for t in t0s), t0s[0].dtype, hist)
    assert tile_cfg is not None
    W, h, hc = tile_cfg
    if interpret is None:
        interpret = not _on_tpu()
    T, X, Y = t0s[0].shape
    cells = T * X * Y
    g = jnp.full((nterms,), 1.0 / cells, t0s[0].dtype)
    f0s = tuple(float(f) for f in factors0)
    sums, dt0, dcoarse, dparams = _loss_and_grads_tiled(
        row_fn, nterms, hist, f0s, W, h, hc, interpret,
        t0s, coarse,
        tuple(jnp.asarray(q) for q in params),
        tuple(jnp.asarray(c) for c in consts),
        g,
    )
    terms = tuple(sums[k] / cells for k in range(nterms))
    return terms, (dt0, dcoarse, dparams)
