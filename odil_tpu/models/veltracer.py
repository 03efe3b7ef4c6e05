"""Velocity-from-tracer model: reconstruct a 2D velocity field from tracer
images at the initial and final time (the flagship ODIL case).

Discretization: first-order upwind advection on a (t, x, y) space-time grid
with frozen-velocity switching, imposed tracer endpoints, Laplacian and
time-derivative velocity regularization (parity with reference
``examples/velocity_from_tracer/veltracer.py``).

Two interchangeable operators:
- ``operator(ctx)``: plain XLA path through ``ctx.field`` stencils.
- ``operator_fused(ctx)``: same math through the fused row-wise Pallas
  kernel (odil_tpu.ops).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import Domain, Field, Problem, State
from ..context import Context

__all__ = ["tracer_blob", "operator", "operator_fused", "operator_fused_mg", "build"]


def tracer_blob(x, y, t):
    """A single blob advected and sheared by a uniform velocity field."""
    u0, v0, r0 = 0.2, 0.2, 0.2
    k = 1 + t
    dx = (x - u0 * t - 0.3) * k
    dy = (y - v0 * t - 0.3) / k
    res = np.maximum(0, 1 - (dx**2 + dy**2) / r0**2)
    return res**0.2


def operator(ctx):
    mod = ctx.mod
    extra = ctx.extra
    args = extra.args
    dt, dx, dy = ctx.step()
    it = ctx.indices("t", loc="ncc")
    nt = ctx.size("t")

    def cross(key, shift_t=0, frozen=False):
        """5-point spatial cross at time shift_t: [c, xm, xp, ym, yp]."""
        return [
            ctx.field(key, shift_t, 0, 0, frozen=frozen),
            ctx.field(key, shift_t, -1, 0, frozen=frozen),
            ctx.field(key, shift_t, 1, 0, frozen=frozen),
            ctx.field(key, shift_t, 0, -1, frozen=frozen),
            ctx.field(key, shift_t, 0, 1, frozen=frozen),
        ]

    def laplace(st):
        c, xm, xp, ym, yp = st
        return (xp - 2 * c + xm) / dx**2 + (yp - 2 * c + ym) / dy**2

    def upwind(um, u, up, v):
        """First-order upwind difference switched on the sign of v."""
        return mod.where(v > 0, u - um, mod.where(v < 0, up - u, (up - um) * 0.5))

    vx_st = cross("vx")
    vy_st = cross("vy")
    vx, vy = vx_st[0], vy_st[0]
    vxf = ctx.field("vx", 0, 0, 0, frozen=True)
    vyf = ctx.field("vy", 0, 0, 0, frozen=True)

    u_prev = cross("u", shift_t=-1)
    du_x = upwind(u_prev[1], u_prev[0], u_prev[2], vxf)
    du_y = upwind(u_prev[3], u_prev[0], u_prev[4], vyf)

    u = ctx.field("u")
    um = mod.where(it == 1, extra.u_init[None, :], u_prev[0])
    fu = (u - um) / dt + vx * du_x / dx + vy * du_y / dy
    fu = mod.where(it == 0, (u - extra.u_init[None, :]) / dx, fu)

    zero = ctx.cast(0)
    fimp = mod.where(it == nt - 1, (u - extra.u_final[None, :]) / dx, zero)
    res = [fu, fimp * args.kimp]

    if args.kxreg:
        res += [laplace(vx_st) * args.kxreg, laplace(vy_st) * args.kxreg]

    if args.ktreg:
        k = args.ktreg / dt
        for key in ("vx", "vy"):
            dv = (ctx.field(key) - ctx.field(key, -1, 0, 0)) * k
            res += [mod.where(it == 0, zero, dv)]

    return res


def _make_row_fn(mod, dt, dx, dy, kimp, kxreg, ktreg):
    """The shared per-row residual function of the fused veltracer kernels."""

    def row_fn(it, T, rows, data_rows, params, consts):
        (u_r, vx_r, vy_r) = rows
        u0, u1 = consts
        ucur, uprev = u_r
        vxc, vxp = vx_r
        vyc, vyp = vy_r

        def upwind(um, uc, up, v):
            return mod.where(v > 0, uc - um, mod.where(v < 0, up - uc, (up - um) * 0.5))

        vxf = jax.lax.stop_gradient(vxc)
        vyf = jax.lax.stop_gradient(vyc)
        du_x = upwind(mod.roll(uprev, 1, 0), uprev, mod.roll(uprev, -1, 0), vxf)
        du_y = upwind(mod.roll(uprev, 1, 1), uprev, mod.roll(uprev, -1, 1), vyf)
        um = mod.where(it == 1, u0, uprev)
        fu = (ucur - um) / dt + vxc * du_x / dx + vyc * du_y / dy
        fu = mod.where(it == 0, (ucur - u0) / dx, fu)
        # Imposed-final row: the reference masks at it == cshape_t - 1 ==
        # T - 2 (its `nt` is the CELL count while `it` runs over T nodes,
        # examples/velocity_from_tracer/veltracer.py:41,112) -- not the last
        # node.  Zero-state checks cannot distinguish the two (the term
        # value is identical wherever the row lands when u == 0), so this
        # must match positionally.
        fimp = mod.where(it == T - 2, (ucur - u1) / dx, 0.0) * kimp
        res = [fu, fimp]

        def laplace(q):
            return (mod.roll(q, -1, 0) - 2 * q + mod.roll(q, 1, 0)) / dx**2 + (
                mod.roll(q, -1, 1) - 2 * q + mod.roll(q, 1, 1)
            ) / dy**2

        if kxreg:
            res += [laplace(vxc) * kxreg, laplace(vyc) * kxreg]
        if ktreg:
            k = ktreg / dt
            res += [
                mod.where(it == 0, 0.0, (vxc - vxp) * k),
                mod.where(it == 0, 0.0, (vyc - vyp) * k),
            ]
        return tuple(res)

    return row_fn


def _make_row_vjp(mod, dt, dx, dy, kimp, kxreg, ktreg):
    """Closed-form adjoint of ``_make_row_fn``'s residual rows.

    Returns ``row_vjp(it, T, rows, data_rows, params, consts, cots) ->
    (flat_row_cotangents, param_cotangents)`` with the flat order the
    kernels use (field-major, (cur, prev)-minor) -- the hand-derived
    transposes of the upwind switches (frozen velocities: the switch
    masks carry no gradient), the self-adjoint periodic Laplacian, and
    the it-masked branches.  Verified against ``jax.vjp`` of the row
    function over every special row (tests/test_rowwise.py)."""

    def row_vjp(it, T, rows, data_rows, params, consts, cots):
        (u_r, vx_r, vy_r) = rows
        u0, u1 = consts
        ucur, uprev = u_r
        vxc, vxp = vx_r
        vyc, vyp = vy_r
        w = list(cots)
        w0, w1 = w[0], w[1]
        pos = 2
        if kxreg:
            w2, w3 = w[pos], w[pos + 1]
            pos += 2
        if ktreg:
            w4, w5 = w[pos], w[pos + 1]

        one = jnp.asarray(1.0, ucur.dtype)
        zero = jnp.asarray(0.0, ucur.dtype)
        m0 = it == 0
        not1 = mod.where(it == 1, zero, one)
        b0 = mod.where(m0, zero, w0)

        def upwind(um, uc, up, v):
            return mod.where(v > 0, uc - um, mod.where(v < 0, up - uc, (up - um) * 0.5))

        vxf = jax.lax.stop_gradient(vxc)
        vyf = jax.lax.stop_gradient(vyc)
        du_x = upwind(mod.roll(uprev, 1, 0), uprev, mod.roll(uprev, -1, 0), vxf)
        du_y = upwind(mod.roll(uprev, 1, 1), uprev, mod.roll(uprev, -1, 1), vyf)

        d_ucur = mod.where(m0, w0 / dx, w0 / dt) + mod.where(
            it == T - 2, w1 * (kimp / dx), zero
        )
        d_uprev = -(b0 / dt) * not1

        def adv_adjoint(c, vf, axis):
            # c = b0 * v / h at the RESIDUAL location; scatter the upwind
            # stencil's cotangent back onto uprev (um/up are rolls of it).
            guc = mod.where(vf > 0, one, mod.where(vf < 0, -one, zero))
            gum = mod.where(vf > 0, -one, mod.where(vf < 0, zero, -0.5 * one))
            gup = mod.where(vf > 0, zero, mod.where(vf < 0, one, 0.5 * one))
            return (
                c * guc
                + mod.roll(c * gum, -1, axis)
                + mod.roll(c * gup, 1, axis)
            )

        d_uprev = d_uprev + adv_adjoint(b0 * vxc / dx, vxf, 0)
        d_uprev = d_uprev + adv_adjoint(b0 * vyc / dy, vyf, 1)

        def laplace(q):
            return (mod.roll(q, -1, 0) - 2 * q + mod.roll(q, 1, 0)) / dx**2 + (
                mod.roll(q, -1, 1) - 2 * q + mod.roll(q, 1, 1)
            ) / dy**2

        d_vxc = b0 * du_x / dx
        d_vyc = b0 * du_y / dy
        d_vxp = jnp.zeros_like(vxp)
        d_vyp = jnp.zeros_like(vyp)
        if kxreg:
            # The periodic Laplacian is self-adjoint.
            d_vxc = d_vxc + laplace(w2) * kxreg
            d_vyc = d_vyc + laplace(w3) * kxreg
        if ktreg:
            k = ktreg / dt
            b4 = mod.where(m0, zero, w4) * k
            b5 = mod.where(m0, zero, w5) * k
            d_vxc = d_vxc + b4
            d_vxp = d_vxp - b4
            d_vyc = d_vyc + b5
            d_vyp = d_vyp - b5

        return (d_ucur, d_uprev, d_vxc, d_vxp, d_vyc, d_vyp), ()

    return row_vjp


def _attach_row_vjp(row_fn, mod, dt, dx, dy, args):
    """Opt-in closed-form adjoint (ODIL_ROW_VJP=hand): the kernels use
    ``row_fn.vjp`` instead of in-kernel ``jax.vjp`` when present."""
    if os.environ.get("ODIL_ROW_VJP", "") == "hand":
        row_fn.vjp = _make_row_vjp(
            mod, dt, dx, dy, args.kimp, args.kxreg, args.ktreg
        )
    return row_fn


def _kernel_decl(ctx):
    """The fused-kernel declaration shared by the kernel operators and the
    halo one-pass builder (halo.make_halo_loss_grad_fn): the row function,
    field keys, const arrays, and declared stencil reaches.  Evaluated
    inside shard_map under --halo, where ``ctx.extra`` already holds the
    localized const planes."""
    extra = ctx.extra
    args = extra.args
    dt, dx, dy = map(float, ctx.step())
    row_fn = _attach_row_vjp(
        _make_row_fn(ctx.mod, dt, dx, dy, args.kimp, args.kxreg, args.ktreg),
        ctx.mod, dt, dx, dy, args,
    )
    nterms = 2 + (2 if args.kxreg else 0) + (2 if args.ktreg else 0)
    return dict(
        row_fn=row_fn,
        keys=("u", "vx", "vy"),
        consts=(extra.u_init, extra.u_final),
        nterms=nterms,
        hist=1,
        halox=1,
    )


def operator_fused(ctx):
    """Same discretization through the fused row-wise Pallas kernel: one
    pass over the state in VMEM, recompute-based backward, loss terms
    returned as Context.Raw scalars."""
    d = _kernel_decl(ctx)
    # The Context service form runs the kernel globally under the default
    # evaluation and per device shard (halo-extended blocks, masked sums)
    # under --halo (see halo.py).
    return ctx.rowwise_terms(
        d["row_fn"],
        d["keys"],
        consts=d["consts"],
        nterms=d["nterms"],
        hist=d["hist"],
        halox=d["halox"],
    )


def operator_fused_mg(ctx):
    """operator_fused with the finest multigrid Horner step fused into the
    kernel (ops/rowwise_mg.py): fine rows are reconstructed in VMEM from the
    level-0 terms plus the level-1 Horner partial, removing the full-size
    reconstruct/transpose HBM sweeps of the XLA ladder.  Falls back to
    operator_fused when no multigrid partials are available (plain-Field
    states, eval paths that flatten fully)."""
    parts = getattr(ctx, "mg_partials", {})
    keys = ("u", "vx", "vy")
    if not all(k in parts for k in keys):
        return operator_fused(ctx)
    import numpy as _np

    if _np.dtype(ctx.dtype).itemsize > 4 and ctx.mod.jax.default_backend() == "tpu":
        # Mosaic cannot lower 64-bit kernels; fall back to the plain fused
        # operator, whose wrapper routes fp64 to the XLA path.
        return operator_fused(ctx)
    from ..ops.rowwise_mg import rowwise_loss_terms_mg

    if not _mg_supported(
        tuple(parts[k][0].shape for k in keys), ctx.dtype
    ):
        # Backward working set would not fit VMEM (512^2+ planes); the
        # plain fused operator's wrapper picks the XLA fallback there.
        return operator_fused(ctx)

    extra = ctx.extra
    args = extra.args
    dt, dx, dy = map(float, ctx.step())
    row_fn = _attach_row_vjp(
        _make_row_fn(ctx.mod, dt, dx, dy, args.kimp, args.kxreg, args.ktreg),
        ctx.mod, dt, dx, dy, args,
    )
    nterms = 2 + (2 if args.kxreg else 0) + (2 if args.ktreg else 0)
    terms = rowwise_loss_terms_mg(
        row_fn,
        t0s=tuple(parts[k][0] for k in keys),
        coarse=tuple(parts[k][2] for k in keys),
        factors0=tuple(parts[k][1] for k in keys),
        consts=(extra.u_init, extra.u_final),
        nterms=nterms,
        hist=1,
    )
    return [Context.Raw(t) for t in terms]


def _mg_loss_and_grads(ctx):
    """Fused one-pass loss+gradients for the training step
    (Problem.make_loss_grad_fn): the backward sweep accumulates the loss
    terms while computing cotangents, so the forward kernel is skipped.
    Routes to the whole-plane mg kernel when it fits VMEM, else to the
    x-tiled variant (512^2+).  Returns (terms, {key: (d_t0, d_coarse)})."""
    from ..ops.rowwise_mg import rowwise_mg_loss_and_grads
    from ..ops.rowwise_mg_tiled import mg_tiled_supported, rowwise_mg_tiled_loss_and_grads

    parts = ctx.mg_partials
    keys = ("u", "vx", "vy")
    extra = ctx.extra
    args = extra.args
    dt, dx, dy = map(float, ctx.step())
    row_fn = _attach_row_vjp(
        _make_row_fn(ctx.mod, dt, dx, dy, args.kimp, args.kxreg, args.ktreg),
        ctx.mod, dt, dx, dy, args,
    )
    nterms = 2 + (2 if args.kxreg else 0) + (2 if args.ktreg else 0)
    t0s = tuple(parts[k][0] for k in keys)
    factors0 = tuple(parts[k][1] for k in keys)
    consts = (extra.u_init, extra.u_final)
    if len(parts[keys[0]]) == 5:
        # Two-level fusion (partial_depth 2): parts = (t0, f0, t1, f1, P2);
        # only selected on shapes where the whole-plane kernel fits.
        t1s = tuple(parts[k][2] for k in keys)
        factors1 = tuple(parts[k][3] for k in keys)
        P2 = tuple(parts[k][4] for k in keys)
        terms, (dt0, dt1, dP2, _) = rowwise_mg_loss_and_grads(
            row_fn, t0s=t0s, coarse=P2, factors0=factors0,
            consts=consts, nterms=nterms, hist=1,
            t1s=t1s, factors1=factors1,
        )
        return list(terms), {
            k: (dt0[i], dt1[i], dP2[i]) for i, k in enumerate(keys)
        }
    coarse = tuple(parts[k][2] for k in keys)
    if _mg_supported(tuple(t.shape for t in t0s), ctx.dtype):
        terms, (dt0, dcoarse, _) = rowwise_mg_loss_and_grads(
            row_fn, t0s=t0s, coarse=coarse, factors0=factors0,
            consts=consts, nterms=nterms, hist=1,
        )
    else:
        cfg = mg_tiled_supported(tuple(t.shape for t in t0s), ctx.dtype, hist=1)
        terms, (dt0, dcoarse, _) = rowwise_mg_tiled_loss_and_grads(
            row_fn, t0s=t0s, coarse=coarse, factors0=factors0,
            consts=consts, nterms=nterms, hist=1, tile_cfg=cfg,
        )
    return list(terms), {k: (dt0[i], dcoarse[i]) for i, k in enumerate(keys)}


def _mg_supported(t0_shapes, dtype):
    """VMEM-fit gate for the whole-plane mg kernel (the eval operator's
    fallback decision)."""
    from ..ops.rowwise_mg import MG_VMEM_LIMIT, mg_vmem_estimate

    return mg_vmem_estimate(t0_shapes, dtype, hist=1, nconsts=2) <= MG_VMEM_LIMIT


def _mg_loss_and_grads_supported(t0_shapes, dtype):
    """Probe for Problem.make_loss_grad_fn: the fused one-pass path runs
    whole-plane when it fits VMEM, or x-tiled (rowwise_mg_tiled) beyond."""
    from ..ops.rowwise_mg_tiled import mg_tiled_supported

    return _mg_supported(t0_shapes, dtype) or (
        mg_tiled_supported(t0_shapes, dtype, hist=1) is not None
    )


def _mg_partial_depth(t0_shapes, dtype):
    """Single-level fusion by default: two-level (the level-1 Horner step
    also in VMEM) measured consistently ~4% SLOWER on the flagship bench
    (1069/1077/1080 vs the 1094-1163 one-level band) -- the extra
    in-kernel reconstruction costs more than the XLA-overlapped prologue
    it removes.  Re-measured in round 5 AFTER the field-batched dots
    (which cheapen the in-kernel side): still ~3% slower (0.631 vs
    0.613 ms/iter on the loss+grad chain) -- the conclusion holds.
    The capability stays available (and tested) by returning
    2 here -- but ONLY when the whole-plane kernel fits VMEM: the depth-2
    branch has no tiled fallback, so beyond-VMEM planes must stay at
    depth 1 (the tiled kernel) instead of dying in the Mosaic compiler."""
    depth = 1  # Flip to 2 to re-enable two-level fusion.
    if depth >= 2 and not _mg_supported(t0_shapes, dtype):
        return 1
    return depth


_mg_loss_and_grads.supported = _mg_loss_and_grads_supported
_mg_loss_and_grads.partial_depth = _mg_partial_depth
operator_fused_mg.loss_and_grads = _mg_loss_and_grads
# The halo (--halo) one-pass builder reconstructs the kernel call from this
# declaration and runs it per device shard (halo.make_halo_loss_grad_fn).
operator_fused_mg.kernel_decl = _kernel_decl


def build(
    nt=64,
    nx=64,
    ny=64,
    kxreg=0.01,
    ktreg=1.0,
    kimp=10.0,
    dtype=np.float32,
    multigrid=True,
    mg_interp="conv",
    mg_nlvl=None,
    kernel="xla",
    mesh=None,
    partition=None,
    args=None,
):
    """Builds the velocity-from-tracer problem.

    Returns (problem, state, extra).  `args` may supply a prebuilt option
    namespace (the example CLI does); otherwise one is synthesized from the
    keyword arguments."""
    if args is None:
        args = argparse.Namespace(kxreg=kxreg, ktreg=ktreg, kimp=kimp)
    domain = Domain(
        cshape=(nt, nx, ny),
        dimnames=("t", "x", "y"),
        lower=(0, 0, 0),
        upper=(1, 1, 1),
        dtype=dtype,
        multigrid=multigrid,
        mg_interp=mg_interp,
        mg_nlvl=mg_nlvl,
        mesh=mesh,
        partition=partition,
    )
    x, y = map(np.asarray, domain.points("x", "y", loc=".cc"))
    u_init = tracer_blob(x, y, 0)
    u_final = tracer_blob(x, y, 1)

    state = State()
    # loc='ncc': node-centered along t, cell-centered along x, y.
    for key in ("u", "vx", "vy"):
        state.fields[key] = Field(None, loc="ncc")
    state = domain.init_state(state)

    exact_uu = np.zeros(domain.get_field_shape(loc="ncc"))
    exact_uu[0] = u_init
    exact_uu[-1] = u_final

    extra = argparse.Namespace(
        u_init=domain.cast(u_init),
        u_final=domain.cast(u_final),
        exact_uu=exact_uu,
        args=args,
    )
    if kernel == "pallas_mg":
        op, mg_partial = operator_fused_mg, bool(multigrid)
    elif kernel == "pallas":
        op, mg_partial = operator_fused, False
    else:
        op, mg_partial = operator, False
    return Problem(op, domain, extra, mg_partial=mg_partial), state, extra
