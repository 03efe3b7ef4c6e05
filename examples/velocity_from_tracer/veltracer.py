#!/usr/bin/env python3
"""Reconstruct a 2D velocity field (vx, vy) from tracer images at t=0 and
t=1 -- the flagship PNAS-Nexus ODIL case.

Workload parity with the reference ``examples/velocity_from_tracer/veltracer.py``:
first-order upwind advection with frozen-velocity switching, Laplacian and
time-derivative velocity regularization, imposed tracer endpoints, multigrid
decomposition with conv interpolation, Adam default.  TPU additions: the
space axes can be sharded over a device mesh (--mesh 'x:2,y:4'), turning the
stencil rolls into ICI halo exchanges.
"""

import argparse

import jax
import numpy as np

import odil_tpu as odil
from odil_tpu import printlog


def tracer_blob(x, y, t):
    """A single blob advected and sheared by a uniform velocity field."""
    u0, v0, r0 = 0.2, 0.2, 0.2
    k = 1 + t
    dx = (x - u0 * t - 0.3) * k
    dy = (y - v0 * t - 0.3) / k
    res = np.maximum(0, 1 - (dx**2 + dy**2) / r0**2)
    return res**0.2


def operator_advection(ctx):
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


def operator_advection_fused(ctx):
    """Same discretization as operator_advection, evaluated through the fused
    row-wise Pallas kernel (odil_tpu.ops): one pass over the state in VMEM,
    recompute-based backward, loss terms returned as Context.Raw scalars."""
    from odil_tpu.context import Context
    from odil_tpu.ops import rowwise_loss_terms

    mod = ctx.mod
    extra = ctx.extra
    args = extra.args
    dt, dx, dy = ctx.step()
    nt = ctx.size("t")
    kimp, kxreg, ktreg = args.kimp, args.kxreg, args.ktreg
    dt, dx, dy = float(dt), float(dx), float(dy)

    u = ctx.field("u")
    vx = ctx.field("vx")
    vy = ctx.field("vy")

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
        fimp = mod.where(it == T - 1, (ucur - u1) / dx, 0.0) * kimp
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

    nterms = 2 + (2 if kxreg else 0) + (2 if ktreg else 0)
    terms = rowwise_loss_terms(
        row_fn, (u, vx, vy), consts=(extra.u_init, extra.u_final), nterms=nterms, hist=1
    )
    return [Context.Raw(t) for t in terms]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--kernel", type=str, default="xla", choices=["xla", "pallas"],
                        help="Residual evaluation path: XLA-fused or the Pallas row-wise kernel")
    parser.add_argument("--Nt", type=int, default=None, help="Grid size in t")
    parser.add_argument("--Nx", type=int, default=64, help="Grid size in x")
    parser.add_argument("--Ny", type=int, default=None, help="Grid size in y")
    parser.add_argument("--kxreg", type=float, default=0.01, help="Laplacian regularization weight")
    parser.add_argument("--ktreg", type=float, default=1, help="Time regularization weight")
    parser.add_argument("--kimp", type=float, default=10, help="Imposed values weight")
    odil.util.add_arguments(parser)
    odil.linsolver.add_arguments(parser)
    parser.set_defaults(
        outdir="out_veltracer",
        frames=5,
        plot_every=100,
        report_every=100,
        history_every=10,
        optimizer="adam",
        lr=0.01,
        multigrid=1,
        mg_interp="conv",
        linsolver="multigrid",
        linsolver_maxiter=10,
    )
    return parser.parse_args(argv)


def plot_func(problem, state, epoch, frame, cbinfo=None):
    domain = problem.domain
    extra = problem.extra
    path0 = f"u_{frame:05d}.png"
    path1 = f"vx_{frame:05d}.png"
    printlog(path0)

    slices_it = np.linspace(0, domain.cshape[0], 5, dtype=int)
    slices_t = np.asarray(domain.points_1d(0, loc="n"))[slices_it]

    state_u = np.asarray(domain.field(state, "u"))
    state_vx = np.asarray(domain.field(state, "vx"))
    state_vy = np.asarray(domain.field(state, "vy"))

    def quiver(i, j, ax, fig):
        import matplotlib.pyplot as plt

        plt.setp(ax.spines.values(), linewidth=0.25)
        ax.yaxis.label.set_size(7)
        xx, yy = domain.points("x", "y", loc=".cc")
        skip = domain.cshape[1] // 8
        offset = max(0, skip // 2 - 1)
        x = np.asarray(xx)[offset::skip, offset::skip].flatten()
        y = np.asarray(yy)[offset::skip, offset::skip].flatten()
        vxs = state_vx[slices_it[j], offset::skip, offset::skip].flatten()
        vys = state_vy[slices_it[j], offset::skip, offset::skip].flatten()
        ax.quiver(x, y, vxs, vys, scale=5, color="k")

    odil.plot.plot_2d(
        domain,
        extra.exact_uu,
        state_u,
        slices_it,
        slices_t,
        path0,
        cmap="YlOrBr",
        umin=0,
        umax=1,
        callback=quiver,
        interpolation="bilinear",
        title=f"epoch={epoch}",
    )
    odil.plot.plot_2d(
        domain,
        state_vx,
        state_vy,
        slices_it,
        slices_t,
        path1,
        umin=-0.5,
        umax=0.5,
        cmap="PuOr_r",
        interpolation="bilinear",
        ylabel_exact="vx",
        ylabel_pred="vy",
    )


def make_problem(args):
    dtype = np.float64 if args.double else np.float32
    mesh = partition = None
    if getattr(args, "mesh", None):
        mesh = odil.parallel.mesh_from_spec(args.mesh)
        partition = odil.parallel.auto_partition(("t", "x", "y"), mesh)
        printlog(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, partition: {partition}")
    domain = odil.Domain(
        cshape=(args.Nt, args.Nx, args.Ny),
        dimnames=("t", "x", "y"),
        lower=(0, 0, 0),
        upper=(1, 1, 1),
        dtype=dtype,
        multigrid=args.multigrid,
        mg_interp=args.mg_interp,
        mg_nlvl=args.nlvl,
        mesh=mesh,
        partition=partition,
    )
    if domain.multigrid:
        printlog("multigrid levels:", domain.mg_cshapes)

    x, y = domain.points("x", "y", loc=".cc")
    x, y = np.asarray(x), np.asarray(y)
    u_init = tracer_blob(x, y, 0)
    u_final = tracer_blob(x, y, 1)

    state = odil.State()
    # loc='ncc': node-centered along t, cell-centered along x, y.
    for key in ("u", "vx", "vy"):
        state.fields[key] = odil.Field(None, loc="ncc")
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
    operator = operator_advection_fused if args.kernel == "pallas" else operator_advection
    return odil.Problem(operator, domain, extra), state


def main(argv=None):
    args = parse_args(argv)
    args.Nt = args.Nt or args.Nx
    args.Ny = args.Ny or args.Nx
    odil.setup_outdir(args)
    problem, state = make_problem(args)
    callback = odil.make_callback(problem, args, plot_func=plot_func)
    odil.optimize(args, args.optimizer, problem, state, callback)
    return problem, state


if __name__ == "__main__":
    main()
