"""Row-wise residual kernel with the finest multigrid Horner step fused in.

The multigrid reconstruction u = sum_l interp^l(term_l * factor_l) costs two
full-size HBM sweeps per epoch (forward reconstruct + transposed backward),
which the epoch-cost breakdown (BENCH_NOTES.md) shows is ~40% of the
flagship epoch.  This kernel removes the finest -- and only expensive --
Horner step from XLA: the caller supplies

  t0:     the level-0 term array, (T, X, Y) per field;
  coarse: the level-1 Horner partial P = sum_{l>=1} interp^{l-1}(term_l *
          factor_l), (Tc, CX, CY) per field (computed by XLA at <= 1/8 of
          the fine size);

and every program reconstructs the fine rows it needs in VMEM:

  fine[r] = factor0 * t0[r] + Wx @ blend_t(P[r>>1], P[r>>1 + 1]) @ Wy^T

where blend_t is the exact node-located linear interpolation along the time
axis (fine[2j] = c[j], fine[2j+1] = (c[j]+c[j+1])/2) and Wx/Wy are the same
dense per-axis prolongation matrices the XLA path multiplies with
(`transfer._interp_matrix`), so the reconstruction is bit-for-bit the same
operator, reassociated.  The 2D upsample runs on the MXU.

Each program reconstructs ONE fresh fine row and carries it in a VMEM ring
scratch across the sequential TPU grid, so the neighbor rows a stencil
needs are read from the ring instead of being re-upsampled per offset
(forward: 1 upsample per field per program instead of hist+1; backward: 1
instead of 2*hist+1).  The few rows no predecessor program computed -- the
periodic wrap rows T-hist..T-1 and, in the backward sweep, the head rows
0..hist-1 -- are reconstructed once by XLA outside the kernel with the
identical operation order and enter as small resident inputs.

Backward follows from linearity without differentiating the reconstruction:
the existing recompute-based row cotangent dfine[i] (jax.vjp of the row
function inside the kernel) splits into

  d t0[i]  = factor0 * dfine[i]
  d P[c]   = Wx^T @ (dfine[2c] + .5 dfine[2c-1] + .5 dfine[2c+1]) @ Wy

with the blended fine cotangent accumulated in a depth-2 VMEM ring and
down-projected once per coarse row when it closes (at fine row 2c+1, or
T-1 for the last row).

Restrictions (asserted): 3D fields, time axis node-located (odd T,
T = 2*(Tc-1)+1), x/y cell-located with exact halving (CX = X//2).
Grid-shaped `data` and broadcast `params`/`consts` groups behave as in
``rowwise.py``.  Reference baseline for the semantics:
``src/odil/core.py:245-263`` (multigrid_to_regular).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..transfer import dot_wx as _dot_wx
from ..transfer import dot_xw as _dot_xw
from .rowwise import _resident_spec, _row_spec, _sumsq_vec, _weights_of, _whole_spec

__all__ = [
    "rowwise_loss_terms_mg",
    "rowwise_mg_loss_and_grads",
    "rowwise_mg_local_loss_and_grads",
]


def _coarse_spec(shape, T, Tc, offset, k):
    """BlockSpec selecting coarse row clamp(((i + offset) % T) // 2 + k)."""
    zeros = (0,) * (len(shape) - 1)

    def index_map(i):
        r = (i + offset) % T
        return (jnp.minimum(r // 2 + k, Tc - 1),) + zeros

    return pl.BlockSpec((1,) + tuple(shape[1:]), index_map)


def _up2d(c, Wx, Wy):
    return _dot_wx(Wx, _dot_xw(c, Wy.T))


# Backward-dot precision: the cotangent down-projection (_down2d) touches
# only GRADIENTS, so its rounding never biases the residuals -- and the
# XLA epilogue's cotangent projection (the autodiff transpose of
# transfer.dot_xw) is ALREADY one raw pass, because the bitmask split
# carries gradient only through its exact x3 remainder term.  "raw"
# (default) therefore runs one bf16 MXU pass per dot (W is bf16-exact,
# so only the cotangent operand rounds, ~2^-9 relative); "split" opts
# back into the 3-pass split-operand exact dot.  Gated on the flagship:
# 400-epoch trajectory vs the reference archive worst row 4.11% (split:
# 4.04%) and the 2000-epoch converged plateau lands in the same
# oscillation band (BENCH_NOTES.md round 5 "backward-dot precision").
_BWD_DOT = os.environ.get("ODIL_MG_BWD_DOT", "raw")


def _down2d(d, Wx, Wy):
    """Transposed 2D prolongation Wx^T @ (d @ Wy) (cotangent projection)."""
    if _BWD_DOT == "raw":
        p = jax.lax.Precision.DEFAULT
        return jnp.dot(Wx.T, jnp.dot(d, Wy, precision=p), precision=p)
    return _dot_wx(Wx.T, _dot_xw(d, Wy))


# y-banded projections: the one-level y prolongation matrix is 2-banded,
# so the dense (.., CY) @ (CY, Y) inner dot costs O(Y) MACs per cell --
# the dominant per-cell growth term at 1024^2 (kernel_ablation:
# in-kernel matmul bound 6.7 ms of the 28.1 ms full route).  Banding
# restricts each fine y block's contraction to its ~B/2-column coarse
# support; dropped terms are exact zeros of Wy.  MEASURED SLOWER on the
# v5e (1024^2 full route: dense 28.1, B=512 29.5, B=256 30.5 ms/iter --
# the unaligned lane slices of the resident Wy relayout per band per
# row and eat the FLOP saving), so banding is OFF by default
# (_BAND_MIN_Y env knob opts in); kept because the structure is right
# if band submatrices are ever passed as aligned resident inputs.  The
# shipped at-scale matmul fix is _up2d_fields/_down2d_fields below.
_BAND_MIN_Y = int(os.environ.get("ODIL_MG_BAND_MIN_Y", str(10**9)))
_BAND_B = int(os.environ.get("ODIL_MG_BAND_B", "512"))


def band_ranges(Wy_np, B):
    """Static (row0, nrows, col_lo, col_hi) bands of the fine-row blocks
    of a (Y, CY) prolongation matrix, from its actual nonzero support."""
    Y, _ = Wy_np.shape
    bands = []
    for r0 in range(0, Y, B):
        b = min(B, Y - r0)
        nz = np.nonzero(np.abs(Wy_np[r0 : r0 + b]).sum(axis=0) > 0)[0]
        bands.append((r0, b, int(nz[0]), int(nz[-1]) + 1))
    return tuple(bands)


def bands_for(Wy_np, Y):
    """Band list for the tiled kernels' y prolongation, or None when the
    plane is below the banding threshold."""
    if _BAND_B > 0 and Y >= _BAND_MIN_Y and Y > _BAND_B:
        return band_ranges(Wy_np, _BAND_B)
    return None


def _up2d_banded(c, Wx, Wy, bands):
    """``_up2d`` with the y contraction restricted per fine-row band to
    its coarse support window (each band is itself an ``_up2d`` call, so
    precision knobs and ablation stubs apply per band)."""
    return jnp.concatenate(
        [_up2d(c[:, lo:hi], Wx, Wy[r0 : r0 + b, lo:hi]) for r0, b, lo, hi in bands],
        axis=1,
    )


def _down2d_banded(d, Wx, Wy, bands):
    """Banded transposed projection: per-band ``_down2d`` over the fine
    band's rows, accumulated into the full coarse width (adjacent bands'
    support windows overlap by <= 2 columns)."""
    CY = Wy.shape[1]
    out = None
    for r0, b, lo, hi in bands:
        part = _down2d(d[:, r0 : r0 + b], Wx, Wy[r0 : r0 + b, lo:hi])
        part = jnp.pad(part, ((0, 0), (lo, CY - hi)))
        out = part if out is None else out + part
    return out


def _pad_rows8(xs):
    """Stack 2D operands along rows, each zero-padded to a multiple of 8
    rows so the per-field slices of the result are sublane-aligned."""
    m = xs[0].shape[0]
    mp = -(-m // 8) * 8
    stack = jnp.concatenate(
        [x if mp == m else jnp.pad(x, ((0, mp - m), (0, 0))) for x in xs], axis=0
    )
    return stack, m, mp


def _up2d_fields(cs, Wx, Wy):
    """Field-batched 2D prolongation: ONE inner dot for all fields.

    The inner dot's M (the coarse x window, ~W/2 + 4 rows) sits far
    below the MXU's 128-row tile, so its cost is M-independent on the
    v5e (measured 9.7 us/dot for (M,512)@(512,1024) at M = 20, 60 and
    120) -- stacking the fields along M makes the dominant inner
    contraction ~nf x cheaper at zero numerical cost: each row is
    contracted independently, so the per-field results are bitwise the
    per-field ``_up2d`` results."""
    stack, m, mp = _pad_rows8(cs)
    inner = _dot_xw(stack, Wy.T)
    return [_dot_wx(Wx, inner[i * mp : i * mp + m]) for i in range(len(cs))]


def _down2d_fields(ds, Wx, Wy):
    """Field-batched transposed projection; see ``_up2d_fields`` (and
    ``_down2d`` for the raw-by-default backward precision)."""
    stack, m, mp = _pad_rows8(ds)
    if _BWD_DOT == "raw":
        p = jax.lax.Precision.DEFAULT
        inner = jnp.dot(stack, Wy, precision=p)
        return [
            jnp.dot(Wx.T, inner[i * mp : i * mp + m], precision=p)
            for i in range(len(ds))
        ]
    inner = _dot_xw(stack, Wy)
    return [_dot_wx(Wx.T, inner[i * mp : i * mp + m]) for i in range(len(ds))]


def _recon(r, t0_plane, c0, c1, Wx, Wy, f0):
    w = 0.5 * (r % 2).astype(c0.dtype)
    c = (1.0 - w) * c0 + w * c1
    return f0 * t0_plane + _up2d(c, Wx, Wy)


def _recon_rows_xla(t0, P, rows, Wx, Wy, f0, bands=None):
    """Reconstructs the listed fine rows outside the kernel, with the exact
    operation order of ``_recon`` so ring-cached and resident copies of a
    row are bit-identical.  ``bands`` must match the consuming kernel's
    banding (same structure -> same accumulation shape)."""
    Tc = P.shape[0]
    out = []
    for r in rows:
        w = 0.5 * jnp.asarray(r % 2, P.dtype)
        c0 = P[r // 2]
        c1 = P[min(r // 2 + 1, Tc - 1)]
        c = (1.0 - w) * c0 + w * c1
        up = _up2d_banded(c, Wx, Wy, bands) if bands else _up2d(c, Wx, Wy)
        out.append(f0 * t0[r] + up)
    return jnp.stack(out)


def _recon_p1_xla(t1, P2, rows, W1x, W1y, f1):
    """Level-1 rows P1[r] = f1 * t1[r] + up2d(blend_t2(P2), W1x, W1y) with
    the exact operation order of the in-kernel level-1 reconstruction."""
    Tc2 = P2.shape[0]
    out = []
    for r in rows:
        w = 0.5 * jnp.asarray(r % 2, P2.dtype)
        c = (1.0 - w) * P2[r // 2] + w * P2[min(r // 2 + 1, Tc2 - 1)]
        out.append(f1 * t1[r] + _up2d(c, W1x, W1y))
    return jnp.stack(out)


def _recon_rows_xla_2(t0, t1, P2, rows, Wx, Wy, W1x, W1y, f0, f1):
    """Two-level fine-row reconstruction (levels 2 -> 1 -> 0) mirroring the
    in-kernel order, for the periodic-wrap residents."""
    Tc1 = t1.shape[0]
    out = []
    for r in rows:
        r1a, r1b = r // 2, min(r // 2 + 1, Tc1 - 1)
        p1 = _recon_p1_xla(t1, P2, [r1a, r1b], W1x, W1y, f1)
        w = 0.5 * jnp.asarray(r % 2, P2.dtype)
        c = (1.0 - w) * p1[0] + w * p1[1]
        out.append(f0 * t0[r] + _up2d(c, Wx, Wy))
    return jnp.stack(out)


def _forward_mg(row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts):
    T = t0s[0].shape[0]
    Tc = coarse[0].shape[0]
    nf, np_, nd = len(t0s), len(params), len(data)
    # Periodic wrap rows T-hist..T-1, reconstructed once by XLA (tiny).
    wraps = [
        _recon_rows_xla(t0s[f], coarse[f], range(T - hist, T), Wx, Wy, f0s[f])
        for f in range(nf)
    ] if hist else []

    def kernel(*refs):
        pos = 0
        t0_refs = refs[pos : pos + nf]
        pos += nf
        c_refs = refs[pos : pos + nf * 2]
        pos += nf * 2
        wrap_refs = refs[pos : pos + len(wraps)]
        pos += len(wraps)
        data_refs = refs[pos : pos + nd]
        pos += nd
        w_refs = refs[pos : pos + 2]
        pos += 2
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        pos += np_
        out_ref = refs[pos]
        ring_refs = refs[pos + 1 :]

        i = pl.program_id(0)
        Wx_v, Wy_v = w_refs[0][...], w_refs[1][...]
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)

        rows = []
        fresh_rows = []
        for f in range(nf):
            fresh = _recon(i, t0_refs[f][0], c_refs[2 * f][0], c_refs[2 * f + 1][0], Wx_v, Wy_v, f0s[f])
            fresh_rows.append(fresh)
            frows = [fresh]
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

        # Carry the fresh row for the next `hist` programs (after all reads).
        for f in range(nf):
            if hist:
                ring_refs[f][i % hist] = fresh_rows[f]

    in_specs = (
        [_row_spec(t.shape, T, 0) for t in t0s]
        + [_coarse_spec(c.shape, T, Tc, 0, k) for c in coarse for k in (0, 1)]
        + [_resident_spec(w.shape) for w in wraps]
        + [_row_spec(d.shape, T, 0) for d in data]
        + [_whole_spec(Wx.shape), _whole_spec(Wy.shape)]
        + [_whole_spec(c.shape) for c in consts]
        + [_whole_spec(p.shape) for p in params]
    )
    inputs = (
        list(t0s)
        + [c for c in coarse for _ in range(2)]
        + wraps
        + list(data)
        + [Wx, Wy]
        + list(consts)
        + list(params)
    )
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nterms), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, nterms), t0s[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((hist,) + tuple(t.shape[1:]), t.dtype) for t in (t0s if hist else ())
        ],
        interpret=interpret,
    )(*inputs)
    return out[0]


def _backward_mg(
    row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts, g,
    with_sums=False, lvl2=None, wraps_in=None, emit_dwraps=False,
):
    """Gradients w.r.t. (t0s, coarse, params) of sum_k g[k] * S[k].

    wraps_in/emit_dwraps are the LOCAL-BLOCK (--halo) form: ``wraps_in``
    supplies the `hist` fine rows preceding row 0 as external residents
    (under halo these are the ppermuted head rows of the ring-predecessor
    device, not this block's own periodic wrap), and ``emit_dwraps=True``
    emits their cotangents as an extra output instead of folding them into
    the last rows (they belong to the predecessor; the caller transposes
    the exchange).  The kernel itself is then oblivious to sharding: the
    grid covers the local rows, ``coarse`` is the device's time-window of
    the replicated level-1 partial, and ``Wx`` may be rectangular
    (x-halo-extended rows of the global prolongation matrix).

    lvl2 = (t1s, f1s, W1x, W1y) switches on TWO-level fusion: ``coarse``
    is then the level-2 Horner partial P2, and level-1 rows
    P1[r] = f1 * t1[r] + up2d(blend_t2(P2), W1x, W1y) are reconstructed
    in VMEM on even fine rows and carried in a depth-2 ring (row 0 enters
    as a tiny XLA-computed resident).  The dc output then holds the
    LEVEL-1 cotangent dP1; its split into (dt1, dP2) happens in the
    caller's XLA epilogue by the same linearity argument.

    with_sums=True additionally accumulates the per-term sums of squares
    S[k] (each residual row is evaluated here anyway), turning this pass
    into a fused loss+gradient evaluation that makes the forward kernel
    redundant for training steps.

    Single-vjp scatter: each residual row is linearized exactly ONCE (the
    naive formulation runs hist+1 vjps per program, keeping accumulation
    local to the program's own output row; at hist=1 that is 2x the
    linearization compute).  Program i of a (T + hist)-program grid:

      - reconstructs fine row i fresh (ring-carried for the next `hist`
        programs; rows j < 0 wrap to XLA-reconstructed residents),
      - runs ONE jax.vjp of residual row i, whose cotangents c[m] target
        input rows i-m for m = 0..hist,
      - scatters: c[0] initializes accumulation-ring slot i % (hist+1);
        c[m>=1] adds to slot (i-m) % (hist+1), or -- for i < m, where the
        target wraps to row T+i-m -- to a resident wrap-cotangent scratch
        consumed by the tail programs,
      - finalizes output row t = i - hist (complete once program i's
        m=hist contribution lands): splits the fine cotangent into t0 and
        coarse parts by linearity of the reconstruction.

    Programs i >= T skip the compute (writes are masked) and only finalize
    the last `hist` rows, folding in the wrap-cotangent scratch."""
    T = t0s[0].shape[0]
    nf, np_, nd = len(t0s), len(params), len(data)
    adepth = hist + 1  # Accumulation-ring depth (rows t in flight).
    gmat = jnp.reshape(g, (1, nterms))
    if lvl2 is None:
        Tc = coarse[0].shape[0]  # P1 rows (the dc output target count).
        if wraps_in is not None:
            wraps = list(wraps_in) if hist else []
        else:
            wraps = [
                _recon_rows_xla(t0s[f], coarse[f], range(T - hist, T), Wx, Wy, f0s[f])
                for f in range(nf)
            ] if hist else []
        p1heads = []
        t1s = f1s = W1x = W1y = None
        p1_shape = coarse[0].shape
    else:
        t1s, f1s, W1x, W1y = lvl2
        Tc = t1s[0].shape[0]
        Tc2 = coarse[0].shape[0]
        assert Tc == 2 * (Tc2 - 1) + 1, (Tc, Tc2)
        p1_shape = (Tc, t0s[0].shape[1] // 2, t0s[0].shape[2] // 2)
        wraps = [
            _recon_rows_xla_2(
                t0s[f], t1s[f], coarse[f], range(T - hist, T), Wx, Wy, W1x, W1y,
                f0s[f], f1s[f],
            )
            for f in range(nf)
        ] if hist else []
        p1heads = [
            _recon_p1_xla(t1s[f], coarse[f], [0], W1x, W1y, f1s[f]) for f in range(nf)
        ]

    def kernel(*refs):
        pos = 0
        t0_refs = refs[pos : pos + nf]
        pos += nf
        c_refs = refs[pos : pos + nf * 2]
        pos += nf * 2
        if lvl2 is not None:
            t1_refs = refs[pos : pos + nf]
            pos += nf
            p1head_refs = refs[pos : pos + nf]
            pos += nf
        wrap_refs = refs[pos : pos + len(wraps)]
        pos += len(wraps)
        data_refs = refs[pos : pos + nd]
        pos += nd
        w_refs = refs[pos : pos + 2]
        pos += 2
        if lvl2 is not None:
            w1_refs = refs[pos : pos + 2]
            pos += 2
        const_refs = refs[pos : pos + len(consts)]
        pos += len(consts)
        param_refs = refs[pos : pos + np_]
        pos += np_
        g_ref = refs[pos]
        pos += 1
        out_t0_refs = refs[pos : pos + nf]
        out_c_refs = refs[pos + nf : pos + 2 * nf]
        out_param_refs = refs[pos + 2 * nf : pos + 2 * nf + np_]
        pos += 2 * nf + np_
        out_sums_ref = refs[pos] if with_sums else None
        pos += 1 if with_sums else 0
        if emit_dwraps:
            # Head-row cotangents leave the kernel as accumulated outputs
            # (they target the predecessor device's rows, not this block's).
            wcot_refs = refs[pos : pos + nf]
            pos += nf
        ring_refs = refs[pos : pos + (nf if hist else 0)]
        pos += nf if hist else 0
        acc_refs = refs[pos : pos + nf]
        pos += nf
        if not emit_dwraps:
            wcot_refs = refs[pos : pos + (nf if hist else 0)]
            pos += nf if hist else 0
        p1ring_refs = refs[pos : pos + (nf if lvl2 is not None else 0)]
        pos += nf if lvl2 is not None else 0
        dacc_refs = refs[pos:]

        i = pl.program_id(0)
        live = i < T  # Tail programs (i >= T) only finalize.
        Wx_v, Wy_v = w_refs[0][...], w_refs[1][...]
        consts_v = tuple(r[...] for r in const_refs)
        params_v = tuple(r[...] for r in param_refs)
        gvec = g_ref[0]

        # Reconstruct fine row i (tail programs compute garbage row i % T;
        # all their writes are masked).  rows[f][m] = fine row i - m.
        it = i % T
        if lvl2 is not None:
            W1x_v, W1y_v = w1_refs[0][...], w1_refs[1][...]
            r1 = jnp.minimum(it // 2 + 1, Tc - 1)

            @pl.when(i == 0)
            def _():
                for f in range(nf):
                    p1ring_refs[f][0] = p1head_refs[f][0]

            @pl.when(it % 2 == 0)
            def _():
                w2 = 0.5 * (r1 % 2).astype(t0s[0].dtype)
                c2s = [
                    (1.0 - w2) * c_refs[2 * f][0] + w2 * c_refs[2 * f + 1][0]
                    for f in range(nf)
                ]
                up1s = _up2d_fields(c2s, W1x_v, W1y_v)
                for f in range(nf):
                    p1ring_refs[f][r1 % 2] = f1s[f] * t1_refs[f][0] + up1s[f]

        fresh_rows = []
        rows = []
        if lvl2 is None:
            # Same blend + projection order as _recon, with the fields'
            # inner dots batched into one (_up2d_fields: per-field
            # results are bitwise the per-field _up2d results, so ring,
            # wrap-resident, and XLA-reconstructed copies still agree).
            wb = 0.5 * (it % 2).astype(t0s[0].dtype)
            cbs = [
                (1.0 - wb) * c_refs[2 * f][0] + wb * c_refs[2 * f + 1][0]
                for f in range(nf)
            ]
            ups = _up2d_fields(cbs, Wx_v, Wy_v)
        for f in range(nf):
            if lvl2 is None:
                fresh = f0s[f] * t0_refs[f][0] + ups[f]
            else:
                fresh = _recon(
                    it,
                    t0_refs[f][0],
                    p1ring_refs[f][(it // 2) % 2],
                    p1ring_refs[f][jnp.minimum(it // 2 + 1, Tc - 1) % 2],
                    Wx_v, Wy_v, f0s[f],
                )
            fresh_rows.append(fresh)
            frows = [fresh]
            for m in range(1, hist + 1):
                ring_row = ring_refs[f][(i - m) % hist]
                wrap_row = wrap_refs[f][jnp.clip(hist + i - m, 0, hist - 1)]
                frows.append(jnp.where(i - m >= 0, ring_row, wrap_row))
            rows.append(tuple(frows))
        data_rows = tuple(r[0] for r in data_refs)

        def residuals_of(*args):
            flat_rows = args[: nf * (hist + 1)]
            pv = args[nf * (hist + 1) :]
            rws = tuple(
                tuple(flat_rows[f * (hist + 1) + m] for m in range(hist + 1))
                for f in range(nf)
            )
            return tuple(row_fn(i % T, T, rws, data_rows, pv, consts_v))

        flat_rows = tuple(rows[f][m] for f in range(nf) for m in range(hist + 1))
        hand_vjp = getattr(row_fn, "vjp", None)
        if hand_vjp is not None:
            # Operator-supplied closed-form adjoint (e.g. veltracer's
            # _make_row_vjp): same flat (field-major, m-minor) cotangent
            # order as the autodiff path; verified against jax.vjp in
            # tests and trajectory-gated before becoming a default.
            res = residuals_of(*(flat_rows + tuple(params_v)))
            w = _weights_of(gvec, res, nterms)
            dflat, dpar = hand_vjp(
                i % T, T, rows, data_rows, params_v, consts_v, w
            )
            cots = tuple(dflat) + tuple(dpar)
        else:
            res, vjp_fn = jax.vjp(residuals_of, *(flat_rows + tuple(params_v)))
            w = _weights_of(gvec, res, nterms)
            cots = vjp_fn(w)

        if with_sums:
            @pl.when(i == 0)
            def _():
                out_sums_ref[0, :] = jnp.zeros((nterms,), out_sums_ref.dtype)

            @pl.when(live)
            def _():
                out_sums_ref[0, :] += _sumsq_vec(res)

        for p in range(np_):
            @pl.when(i == 0)
            def _(p=p):
                out_param_refs[p][...] = jnp.zeros(params[p].shape, params[p].dtype)

            @pl.when(live)
            def _(p=p):
                out_param_refs[p][...] += cots[nf * (hist + 1) + p]

        if hist:
            @pl.when(i == 0)
            def _():
                for f in range(nf):
                    wcot_refs[f][...] = jnp.zeros(
                        (hist,) + t0s[f].shape[1:], t0s[f].dtype
                    )

        # Scatter: c[m] targets row i - m.
        for f in range(nf):
            for m in range(1, hist + 1):
                c_fm = cots[f * (hist + 1) + m]

                @pl.when(live & (i >= m))
                def _(f=f, m=m, c_fm=c_fm):
                    acc_refs[f][(i - m) % adepth] += c_fm

                @pl.when(live & (i < m))
                def _(f=f, m=m, c_fm=c_fm):
                    # Wrapped target row T + i - m (one of the last hist).
                    wcot_refs[f][hist + i - m] += c_fm

            @pl.when(live)
            def _(f=f):
                acc_refs[f][i % adepth] = cots[f * (hist + 1)]

        # Finalize output row t = i - hist: complete after this program's
        # m=hist contribution.  Split dfine into t0 and coarse cotangents
        # by linearity of the reconstruction.  The coarse part accumulates
        # the t-BLENDED fine cotangent per coarse row (dacc ring: coarse
        # row c collects rows 2c-1, 2c, 2c+1 with weights .5, 1, .5) and
        # down-projects ONCE per coarse row when it closes (at t = 2c+1,
        # or t = T-1 for the last row): one down2d per coarse row instead
        # of one per fine row -- the t-blend moved ahead of the (linear)
        # transposed prolongation.  (The forward mirror -- a ring of
        # prolonged planes, one up2d per coarse row -- was built and
        # measured a wash: the forward matmuls overlap with the block
        # DMAs, so halving them saved nothing at 256^2 or 512^2 while
        # costing 2 wide planes of VMEM per field; see docs/KERNELS.md
        # "coarse-row cotangent ring".)
        @pl.when(i >= hist)
        def _():
            t = i - hist
            todd = t % 2 == 1
            for f in range(nf):
                complete = acc_refs[f][t % adepth]
                if hist and not emit_dwraps:
                    wrapc = wcot_refs[f][jnp.clip(i - T, 0, hist - 1)]
                    complete = jnp.where(i >= T, complete + wrapc, complete)
                out_t0_refs[f][0] = f0s[f] * complete

                # Even t: weight-1 contribution to coarse row t//2 (t == 0
                # initializes its slot; the where discards the uninit read).
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
                dcs = _down2d_fields(
                    [dacc_refs[f][c % 2] for f in range(nf)], Wx_v, Wy_v
                )
                for f in range(nf):
                    out_c_refs[f][0] = dcs[f]

        # Carry the fresh row for the next `hist` programs (after all reads).
        for f in range(nf):
            if hist:
                ring_refs[f][i % hist] = fresh_rows[f]

    if lvl2 is not None:
        def _t1_spec(shape):
            zeros = (0,) * (len(shape) - 1)
            return pl.BlockSpec(
                (1,) + tuple(shape[1:]),
                lambda i: (jnp.minimum((i % T) // 2 + 1, Tc - 1),) + zeros,
            )

        def _p2_spec(shape, k):
            zeros = (0,) * (len(shape) - 1)

            def index_map(i):
                r1 = jnp.minimum((i % T) // 2 + 1, Tc - 1)
                return (jnp.minimum(r1 // 2 + k, Tc2 - 1),) + zeros

            return pl.BlockSpec((1,) + tuple(shape[1:]), index_map)

        c_in_specs = [_p2_spec(c.shape, k) for c in coarse for k in (0, 1)]
        lvl2_specs = (
            [_t1_spec(t.shape) for t in t1s]
            + [_resident_spec(h.shape) for h in p1heads]
        )
        lvl2_inputs = list(t1s) + p1heads
        w1_specs = [_whole_spec(W1x.shape), _whole_spec(W1y.shape)]
        w1_inputs = [W1x, W1y]
    else:
        c_in_specs = [_coarse_spec(c.shape, T, Tc, 0, k) for c in coarse for k in (0, 1)]
        lvl2_specs = []
        lvl2_inputs = []
        w1_specs = []
        w1_inputs = []
    in_specs = (
        [_row_spec(t.shape, T, 0) for t in t0s]
        + c_in_specs
        + lvl2_specs
        + [_resident_spec(w.shape) for w in wraps]
        + [_row_spec(d.shape, T, 0) for d in data]
        + [_whole_spec(Wx.shape), _whole_spec(Wy.shape)]
        + w1_specs
        + [_whole_spec(c.shape) for c in consts]
        + [_whole_spec(p.shape) for p in params]
        + [_whole_spec((1, nterms))]
    )
    inputs = (
        list(t0s)
        + [c for c in coarse for _ in range(2)]
        + lvl2_inputs
        + wraps
        + list(data)
        + [Wx, Wy]
        + w1_inputs
        + list(consts)
        + list(params)
        + [gmat]
    )
    def _dc_close_spec(shape):
        # Coarse-cotangent row c = t//2 closes at fine row t = 2c+1 (or
        # t = T-1 for the last row); programs t = 2c, 2c+1 share block c,
        # the closing program writes it, the index change flushes it.
        zeros = (0,) * (len(shape) - 1)

        def index_map(i):
            return (jnp.clip((i - hist) // 2, 0, Tc - 1),) + zeros

        return pl.BlockSpec((1,) + tuple(shape[1:]), index_map)

    out_specs = (
        [_row_spec(t.shape, T, -hist) for t in t0s]
        + [_dc_close_spec(p1_shape) for _ in range(nf)]
        + [_whole_spec(p.shape) for p in params]
        + ([_whole_spec((1, nterms))] if with_sums else [])
        + ([_whole_spec((hist,) + tuple(t.shape[1:])) for t in t0s] if emit_dwraps else [])
    )
    out_shapes = (
        [jax.ShapeDtypeStruct(t.shape, t.dtype) for t in t0s]
        + [jax.ShapeDtypeStruct(p1_shape, t0s[0].dtype)] * nf
        + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params]
        + ([jax.ShapeDtypeStruct((1, nterms), t0s[0].dtype)] if with_sums else [])
        + ([
            jax.ShapeDtypeStruct((hist,) + tuple(t.shape[1:]), t.dtype) for t in t0s
        ] if emit_dwraps else [])
    )
    scratch = [
        pltpu.VMEM((hist,) + tuple(t.shape[1:]), t.dtype) for t in (t0s if hist else ())
    ] + [
        pltpu.VMEM((adepth,) + tuple(t.shape[1:]), t.dtype) for t in t0s
    ] + [
        pltpu.VMEM((hist,) + tuple(t.shape[1:]), t.dtype)
        for t in (t0s if hist and not emit_dwraps else ())
    ] + ([
        pltpu.VMEM((2,) + tuple(p1_shape[1:]), t0s[0].dtype) for _ in t0s
    ] if lvl2 is not None else []) + [
        pltpu.VMEM((2,) + tuple(t.shape[1:]), t.dtype) for t in t0s  # dacc
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(T + hist,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    dt0 = tuple(outs[:nf])
    dcoarse = tuple(outs[nf : 2 * nf])
    dparams = tuple(outs[2 * nf : 2 * nf + np_])
    pos = 2 * nf + np_
    sums_out = outs[pos][0] if with_sums else None
    pos += 1 if with_sums else 0
    dwraps = tuple(outs[pos : pos + nf]) if emit_dwraps else None
    rest = (() if dwraps is None else (dwraps,))
    if with_sums:
        return (dt0, dcoarse, dparams, sums_out) + rest
    return (dt0, dcoarse, dparams) + rest


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _rowwise_sumsq_mg(row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts):
    return _forward_mg(
        row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts
    )


def _fwd(row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts):
    out = _forward_mg(
        row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts
    )
    return out, (t0s, coarse, Wx, Wy, params, data, consts)

def _bwd(row_fn, nterms, hist, f0s, interpret, saved, g):
    t0s, coarse, Wx, Wy, params, data, consts = saved
    dt0, dcoarse, dparams = _backward_mg(
        row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy, params, data, consts, g
    )
    return (
        dt0,
        dcoarse,
        None,
        None,
        dparams,
        tuple(None for _ in data),
        tuple(None for _ in consts),
    )


_rowwise_sumsq_mg.defvjp(_fwd, _bwd)


# Calibration (v5e round 4): the estimate undercounts Mosaic's real
# scoped-vmem allocation (stack temporaries) by ~4.3 MiB on the tiled
# kernel; the flagship (65,256,256) nf=3 config estimates 11.375 MiB and
# compiles close to the 16 MiB cap.  12 MiB keeps that config fused and
# routes estimate>12 configs to the tiled/unfused fallbacks instead of
# letting them hard-fail in the Mosaic compiler.
MG_VMEM_LIMIT = 12 * 1024 * 1024


def mg_vmem_estimate(t0_shapes, dtype, hist=1, nconsts=0):
    """Rough VMEM footprint of the scatter backward (the larger of the two
    mg passes): double-buffered in/out row blocks, the fine-row ring, the
    cotangent accumulation ring, the wrap-cotangent scratch, the depth-2
    blended coarse-cotangent ring (dacc: one down2d per coarse row),
    resident wrap rows, and resident consts.  Callers fall back to the
    un-fused paths when this exceeds ``MG_VMEM_LIMIT`` (e.g. 512^2
    planes)."""
    itemsize = np.dtype(dtype).itemsize
    plane = int(t0_shapes[0][1]) * int(t0_shapes[0][2]) * itemsize
    quarter = plane // 4
    per_field = plane * (2 + 2 + hist + hist + (hist + 1) + hist + 2) + quarter * 8
    return len(t0_shapes) * per_field + nconsts * plane


def _prepare_mg(t0s, coarse, factors0, hist, interpret):
    """Shared validation + prolongation-matrix setup for the mg kernels."""
    from .rowwise import _on_tpu

    t0s = tuple(jnp.asarray(t) for t in t0s)
    coarse = tuple(jnp.asarray(c) for c in coarse)
    T = t0s[0].shape[0]
    Tc = coarse[0].shape[0]
    assert t0s[0].ndim == 3, "mg-fused kernel supports 3D (t, x, y) fields"
    assert T % 2 == 1 and T == 2 * (Tc - 1) + 1, (T, Tc)
    X, Y = t0s[0].shape[1:]
    CX, CY = coarse[0].shape[1:]
    assert (CX, CY) == (X // 2, Y // 2), (t0s[0].shape, coarse[0].shape)
    assert T > 2 * hist, f"time axis T={T} too short for hist={hist} ring"
    if interpret is None:
        interpret = not _on_tpu()

    from ..transfer import _interp_matrix

    dtype = t0s[0].dtype
    Wx = jnp.asarray(_interp_matrix(CX, "c", dtype))
    Wy = jnp.asarray(_interp_matrix(CY, "c", dtype))
    f0s = tuple(float(f) for f in factors0)
    return t0s, coarse, Wx, Wy, f0s, interpret, T * X * Y


def rowwise_mg_loss_and_grads(
    row_fn,
    t0s,
    coarse,
    factors0,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    interpret=None,
    t1s=None,
    factors1=None,
):
    """One-pass fused loss AND gradients for the training step.

    Returns (terms, (dt0, dcoarse, dparams)) where terms[k] =
    mean(residual_k^2) and the gradients are of ``sum_k terms[k]`` -- the
    fixed composition every ``Problem`` loss uses (problem.py
    ``loss_terms``).  The backward sweep already recomputes every residual
    row for its in-kernel vjp, so accumulating the sums of squares there
    makes the separate forward kernel redundant: one kernel per epoch
    instead of two.  Not differentiable (it IS the gradient); for a
    differentiable loss use ``rowwise_loss_terms_mg``.

    t1s/factors1 (with ``coarse`` = the level-2 partial P2) switch on
    TWO-level fusion: the level-1 Horner step also runs in VMEM, so the
    XLA prologue stops at level 2 (<= 1/64 of the fine size).  Returns
    (terms, (dt0, dt1, dP2, dparams)); the level-1 cotangent emitted by
    the kernel is split into (dt1, dP2) here by linearity (down-sample
    each row, then the exact transposed t-blend)."""
    if t1s is None:
        t0s, coarse, Wx, Wy, f0s, interpret, cells = _prepare_mg(
            t0s, coarse, factors0, hist, interpret
        )
        g = jnp.full((nterms,), 1.0 / cells, t0s[0].dtype)
        dt0, dcoarse, dparams, sums = _backward_mg(
            row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy,
            tuple(jnp.asarray(p) for p in params),
            tuple(jnp.asarray(d) for d in data),
            tuple(jnp.asarray(c) for c in consts),
            g, with_sums=True,
        )
        terms = tuple(sums[k] / cells for k in range(nterms))
        return terms, (dt0, dcoarse, dparams)

    from .rowwise import _on_tpu
    from ..transfer import _interp_matrix

    t0s = tuple(jnp.asarray(t) for t in t0s)
    t1s = tuple(jnp.asarray(t) for t in t1s)
    coarse = tuple(jnp.asarray(c) for c in coarse)  # P2.
    T, X, Y = t0s[0].shape
    Tc1, CX1, CY1 = t1s[0].shape
    Tc2, CX2, CY2 = coarse[0].shape
    assert T == 2 * (Tc1 - 1) + 1 and Tc1 == 2 * (Tc2 - 1) + 1, (T, Tc1, Tc2)
    assert (CX1, CY1) == (X // 2, Y // 2) and (CX2, CY2) == (CX1 // 2, CY1 // 2)
    assert T > 2 * hist
    if interpret is None:
        interpret = not _on_tpu()
    dtype = t0s[0].dtype
    Wx = jnp.asarray(_interp_matrix(CX1, "c", dtype))
    Wy = jnp.asarray(_interp_matrix(CY1, "c", dtype))
    W1x = jnp.asarray(_interp_matrix(CX2, "c", dtype))
    W1y = jnp.asarray(_interp_matrix(CY2, "c", dtype))
    f0s = tuple(float(f) for f in factors0)
    f1s = tuple(float(f) for f in factors1)
    cells = T * X * Y
    nf = len(t0s)
    g = jnp.full((nterms,), 1.0 / cells, dtype)
    dt0, dP1, dparams, sums = _backward_mg(
        row_fn, nterms, hist, f0s, interpret, t0s, coarse, Wx, Wy,
        tuple(jnp.asarray(p) for p in params),
        tuple(jnp.asarray(d) for d in data),
        tuple(jnp.asarray(c) for c in consts),
        g, with_sums=True, lvl2=(t1s, f1s, W1x, W1y),
    )
    # Split dP1 into (dt1, dP2) by linearity of the level-1 reconstruction:
    # dt1 = f1 * dP1; dP2[r2] = sum over r1 of blend-weights * down2d(dP1).
    dt1 = tuple(f1s[f] * dP1[f] for f in range(nf))
    dP2 = []
    for f in range(nf):
        dd = jnp.einsum("xa,txy,yb->tab", W1x, dP1[f], W1y)  # down2d per row.
        ev = dd[0::2]
        odd = dd[1::2]
        zeros = jnp.zeros((1, CX2, CY2), dtype)
        dP2.append(
            ev
            + 0.5 * jnp.concatenate([zeros, odd], axis=0)
            + 0.5 * jnp.concatenate([odd, zeros], axis=0)
        )
    terms = tuple(sums[k] / cells for k in range(nterms))
    return terms, (dt0, dt1, tuple(dP2), dparams)


def rowwise_mg_local_loss_and_grads(
    row_fn,
    t0s,
    coarse,
    Wx,
    Wy,
    factors0,
    heads,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    gscale=1.0,
    interpret=None,
):
    """One-pass fused loss sums AND gradients on ONE device's local block --
    the ``--halo`` (shard_map) form of ``rowwise_mg_loss_and_grads``
    (halo.make_halo_loss_grad_fn builds the exchanges around it).

    t0s:    per-field level-0 term blocks, (Tl, Xe, Y): the device's
            ghost-noded time rows, x-halo-extended planes.
    coarse: per-field time-windows of the replicated level-1 Horner
            partial, (Tcw, CX, CY) with window row 0 = global row g0//2.
    Wx:     (Xe, CX) rows of the global x-prolongation matrix gathered at
            the block's global x indices (periodic); Wy: (Y, CY) full.
    heads:  per-field (hist, Xe, Y) fine rows PRECEDING local row 0
            (ppermuted from the ring predecessor; ascending global order).
    gscale: the 1/cells_global loss scaling (cells of the GLOBAL grid --
            the psum of per-device sums divides by the same count).

    The row function must already be wrapped for locality (global row
    offsets, halo/duplicate masking).  Returns
    ``(sums, (dt0, dcoarse, dheads, dparams))``: per-term local sums of
    squares (psum these), cotangents of the LOCAL inputs (the caller
    transposes the localization -- ghost-noding, halo exchange, coarse
    windowing -- via ``jax.vjp``).  Requirements: 3D blocks, the local
    row count Tl odd with Tl-1 the even owned-cell block, Tcw =
    (Tl-1)//2 + 1."""
    from .rowwise import _on_tpu

    t0s = tuple(jnp.asarray(t) for t in t0s)
    coarse = tuple(jnp.asarray(c) for c in coarse)
    heads = tuple(jnp.asarray(h) for h in heads)
    Tl = t0s[0].shape[0]
    Tcw = coarse[0].shape[0]
    assert t0s[0].ndim == 3, "mg-fused kernel supports 3D (t, x, y) fields"
    assert Tl % 2 == 1 and Tcw == (Tl - 1) // 2 + 1, (Tl, Tcw)
    assert Tl > 2 * hist, f"local rows Tl={Tl} too short for hist={hist} ring"
    assert Wx.shape == (t0s[0].shape[1], coarse[0].shape[1]), (Wx.shape,)
    for h in heads:
        assert h.shape == (hist,) + tuple(t0s[0].shape[1:]), (h.shape,)
    if interpret is None:
        interpret = not _on_tpu()
    dtype = t0s[0].dtype
    f0s = tuple(float(f) for f in factors0)
    g = jnp.full((nterms,), gscale, dtype)
    args = (
        row_fn, nterms, hist, f0s, interpret, t0s, coarse,
        jnp.asarray(Wx, dtype), jnp.asarray(Wy, dtype),
        tuple(jnp.asarray(p) for p in params),
        tuple(jnp.asarray(d) for d in data),
        tuple(jnp.asarray(c) for c in consts),
        g,
    )
    if hist:
        dt0, dcoarse, dparams, sums, dheads = _backward_mg(
            *args, with_sums=True, wraps_in=heads, emit_dwraps=True
        )
    else:
        dt0, dcoarse, dparams, sums = _backward_mg(*args, with_sums=True)
        dheads = ()
    return sums, (dt0, dcoarse, dheads, dparams)


def rowwise_loss_terms_mg(
    row_fn,
    t0s,
    coarse,
    factors0,
    params=(),
    data=(),
    consts=(),
    nterms=1,
    hist=1,
    interpret=None,
):
    """Mean-squared loss terms with the finest MG Horner step fused in.

    t0s: per-field level-0 term arrays (T, X, Y), T odd (node t-axis).
    coarse: per-field level-1 Horner partials (Tc, X//2, Y//2).
    factors0: per-field level-0 multigrid factor (static floats).
    Other groups and row_fn contract as in ``rowwise_loss_terms``."""
    t0s, coarse, Wx, Wy, f0s, interpret, cells = _prepare_mg(
        t0s, coarse, factors0, hist, interpret
    )

    sums = _rowwise_sumsq_mg(
        row_fn,
        nterms,
        hist,
        f0s,
        interpret,
        t0s,
        tuple(coarse),
        Wx,
        Wy,
        tuple(jnp.asarray(p) for p in params),
        tuple(jnp.asarray(d) for d in data),
        tuple(jnp.asarray(c) for c in consts),
    )
    return tuple(sums[k] / cells for k in range(nterms))
