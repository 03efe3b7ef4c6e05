"""Heat-conduction model family.

1. Inverse conductivity: infer k(u) as a neural network from sparse noisy
   temperature measurements (plus the forward problem), finite-volume
   discretization with frozen-flux linearization, annealed regularizers,
   and a full PINN variant (parity with reference ``examples/heat/heat.py``).
2. ``tmax`` inference: recover the final time of a diffusion run from one
   measured value; the scalar unknown rescales dt inside the operator
   (parity with reference ``examples/heat_tmax/heat_tmax.py``).
"""

import argparse

import jax
import numpy as np

from .. import Array, Domain, Field, Problem, State
from ..nn import eval_neural_net
from ..stencil import extrap_linear, extrap_quadh

__all__ = [
    "initial_temperature",
    "true_conductivity",
    "anneal",
    "squash_k",
    "operator_odil",
    "operator_odil_fused",
    "operator_pinn",
    "pick_imposed",
    "build",
    "exact_u_tmax",
    "clamp_initial_row",
    "operator_tmax",
    "build_tmax",
]


def initial_temperature(t, x, mod):
    def bump(z):
        return mod.exp(-((z - 0.5) ** 2) * 50)

    return bump(x) - bump(-mod.cast(0.5, x.dtype))


def true_conductivity(u, mod=np):
    return 0.02 * mod.exp(-((u - 0.5) ** 2) * 20)


def anneal(epoch, period):
    """Exponential decay factor halving every `period` epochs."""
    return 0.5 ** (epoch / period) if period else 1


def squash_k(raw, mod, kmax):
    return mod.sigmoid(raw) * kmax


def operator_odil(ctx):
    extra = ctx.extra
    mod = ctx.mod
    args = extra.args
    dt, dx = ctx.step()
    it, ix = ctx.indices()
    nt, nx = ctx.size()
    epoch = ctx.tracers["epoch"]

    def row_samples(key, tshift, frozen):
        return [ctx.field(key, tshift, s, frozen=frozen) for s in (0, -1, 1)]

    def two_rows(key, frozen=False):
        if not args.keep_frozen:
            frozen = False
        return [row_samples(key, 0, frozen), row_samples(key, -1, frozen)]

    def impose_bc(rows):
        """Overwrites wrapped halo samples: initial condition in time (linear
        extrapolation), zero Dirichlet in space (quadratic-half)."""
        if args.keep_init:
            u0 = extra.init_u
            u0row = [u0, mod.roll(u0, 1, 0), mod.roll(u0, -1, 0)]
            cur, prev = rows
            for i in range(3):
                prev[i] = mod.where(it == 0, extrap_linear(cur[i], u0row[i][None, :]), prev[i])
        for row in rows:
            row[1] = mod.where(ix == 0, extrap_quadh(row[2], row[0], 0), row[1])
            row[2] = mod.where(ix == nx - 1, extrap_quadh(row[1], row[0], 0), row[2])
        return rows

    rows = impose_bc(two_rows("u"))
    cur, prev = rows
    u_t = (cur[0] - prev[0]) / dt
    du_m = ((cur[0] + prev[0]) - (cur[1] + prev[1])) / (2 * dx)
    du_p = ((cur[2] + prev[2]) - (cur[0] + prev[0])) / (2 * dx)

    # Face temperatures from the frozen stencil (linearizes the flux).
    fcur, fprev = impose_bc(two_rows("u", frozen=True))
    uface_m = ((fcur[0] + fprev[0]) + (fcur[1] + fprev[1])) * 0.25
    uface_p = ((fcur[2] + fprev[2]) + (fcur[0] + fprev[0])) * 0.25

    if args.infer_k:
        km = squash_k(ctx.neural_net("k_net")(uface_m)[0], mod, args.kmax)
        kp = squash_k(ctx.neural_net("k_net")(uface_p)[0], mod, args.kmax)
    else:
        km = true_conductivity(uface_m, mod=mod)
        kp = true_conductivity(uface_p, mod=mod)

    flux_div = (du_p * kp - du_m * km) / dx
    fu = u_t - flux_div
    if not args.keep_init:
        fu = mod.where(it == 0, ctx.cast(0), fu)
    res = [("fu", fu)]

    if extra.imp_size:
        weight = args.kimp * (np.prod(ctx.size()) / extra.imp_size) ** 0.5
        res += [("imp", extra.imp_mask * (cur[0] - extra.imp_u) * weight)]

    if args.kxreg:
        k = args.kxreg * anneal(epoch, args.kxregdecay)
        u_x = mod.where(ix == 0, ctx.cast(0), (cur[0] - cur[1]) / dx)
        res += [("xreg", u_x * k)]

    if args.ktreg:
        k = args.ktreg * anneal(epoch, args.ktregdecay)
        du = mod.where(it == 0, ctx.cast(0), (cur[0] - prev[0]) / dt)
        res += [("treg", du * k)]

    if args.kwreg and args.infer_k:
        ww = ctx.domain.arrays_from_field(ctx.state.fields["k_net"])
        ww = mod.concatenate([mod.flatten(w) for w in ww], axis=0)
        k = args.kwreg * anneal(epoch, args.kwregdecay)
        res += [("wreg", (mod.stop_gradient(ww) - ww) * k)]
    return res


def operator_odil_fused(ctx):
    """Same discretization as operator_odil, evaluated through the fused
    row-wise Pallas kernel -- including the conductivity neural network,
    whose weights are differentiable kernel parameters.  The
    weight-regularization term (wreg) has no grid shape and stays on the
    regular path."""
    extra = ctx.extra
    mod = ctx.mod
    args = extra.args
    dt, dx = map(float, ctx.step())
    nt, nx = ctx.size()
    epoch = ctx.tracers["epoch"]
    dtype = ctx.dtype

    if args.infer_k:
        k_params = tuple(ctx.domain.arrays_from_field(ctx.state.fields["k_net"]))
        nlayers = len(ctx.state.fields["k_net"].weights)
        layer_shapes = [tuple(w.shape) for w in ctx.state.fields["k_net"].weights]

        def k_of(x, params):
            # Unrolled scalar-weighted sums instead of einsum: the layer
            # widths are tiny and Mosaic rejects the fused multi_reduction
            # these dots lower to ("only constant accumulators supported").
            ws, bs = params[:nlayers], params[nlayers:]
            h = [x]
            for li, (w, b) in enumerate(zip(ws, bs)):
                no, ni = layer_shapes[li]
                out = []
                for o in range(no):
                    acc = b[o]
                    for i in range(ni):
                        acc = acc + w[o, i] * h[i]
                    out.append(acc)
                h = [mod.tanh(v) for v in out] if li < nlayers - 1 else out
            return mod.sigmoid(h[0]) * args.kmax

    else:
        k_params = ()

        def k_of(x, params):
            return true_conductivity(x, mod=mod)

    u0 = extra.init_u
    consts = (
        u0,
        mod.roll(u0, 1, 0),
        mod.roll(u0, -1, 0),
        mod.cast(ctx.indices("x")[0, :], dtype),  # ix as a plane constant
        mod.reshape(mod.cast(args.kxreg * anneal(epoch, args.kxregdecay), dtype), (1, 1)),
        mod.reshape(mod.cast(args.ktreg * anneal(epoch, args.ktregdecay), dtype), (1, 1)),
    )
    data = (extra.imp_mask, extra.imp_u) if extra.imp_size else ()
    imp_weight = (
        float(args.kimp * (np.prod(ctx.size()) / extra.imp_size) ** 0.5) if extra.imp_size else 0.0
    )

    def row_fn(it, T, rows, data_rows, params, cons):
        cur0, prev0 = rows[0]
        u0c, u0m, u0p, ix, kx, kt = cons

        def shifted(row):
            return [row, mod.roll(row, 1, 0), mod.roll(row, -1, 0)]

        def impose(cur, prev):
            if args.keep_init:
                u0rows = [u0c, u0m, u0p]
                prev = [
                    mod.where(it == 0, extrap_linear(c, z), p)
                    for c, p, z in zip(cur, prev, u0rows)
                ]
            out = []
            for row in (cur, prev):
                r1 = mod.where(ix == 0, extrap_quadh(row[2], row[0], 0.0), row[1])
                r2 = mod.where(ix == nx - 1, extrap_quadh(r1, row[0], 0.0), row[2])
                out.append([row[0], r1, r2])
            return out

        cur, prev = impose(shifted(cur0), shifted(prev0))
        u_t = (cur[0] - prev[0]) / dt
        du_m = ((cur[0] + prev[0]) - (cur[1] + prev[1])) / (2 * dx)
        du_p = ((cur[2] + prev[2]) - (cur[0] + prev[0])) / (2 * dx)

        if args.keep_frozen:
            sg = jax.lax.stop_gradient
            fcur, fprev = impose(shifted(sg(cur0)), shifted(sg(prev0)))
        else:
            fcur, fprev = cur, prev
        uface_m = ((fcur[0] + fprev[0]) + (fcur[1] + fprev[1])) * 0.25
        uface_p = ((fcur[2] + fprev[2]) + (fcur[0] + fprev[0])) * 0.25

        km = k_of(uface_m, params)
        kp = k_of(uface_p, params)
        fu = u_t - (du_p * kp - du_m * km) / dx
        if not args.keep_init:
            fu = mod.where(it == 0, 0.0, fu)
        res = [fu]
        if extra.imp_size:
            mask_row, impu_row = data_rows
            res += [mask_row * (cur[0] - impu_row) * imp_weight]
        if args.kxreg:
            u_x = mod.where(ix == 0, 0.0, (cur[0] - cur[1]) / dx)
            res += [u_x * kx[0, 0]]
        if args.ktreg:
            du = mod.where(it == 0, 0.0, (cur[0] - prev[0]) / dt)
            res += [du * kt[0, 0]]
        return tuple(res)

    names = ["fu"]
    if extra.imp_size:
        names.append("imp")
    if args.kxreg:
        names.append("xreg")
    if args.ktreg:
        names.append("treg")
    terms = ctx.rowwise_terms(
        row_fn, ("u",), params=k_params, data=data, consts=consts, nterms=len(names), hist=1, halox=1
    )
    res = list(zip(names, terms))

    if args.kwreg and args.infer_k:
        ww = ctx.domain.arrays_from_field(ctx.state.fields["k_net"])
        ww = mod.concatenate([mod.flatten(w) for w in ww], axis=0)
        k = args.kwreg * anneal(epoch, args.kwregdecay)
        res += [("wreg", (mod.stop_gradient(ww) - ww) * k)]
    return res


def operator_pinn(ctx):
    """PINN variant: the temperature is a neural network of (t, x);
    derivatives at collocation points via forward-mode AD (jax.jvp)."""
    extra = ctx.extra
    mod = ctx.mod
    args = extra.args

    u_of = ctx.neural_net("u_net")
    if args.infer_k:
        k_net = ctx.neural_net("k_net")

        def k_of(u):
            return squash_k(k_net(u)[0], mod, args.kmax)

    else:

        def k_of(u):
            return true_conductivity(u, mod=mod)

    t_in = mod.cast(extra.t_inner, ctx.dtype)
    x_in = mod.cast(extra.x_inner, ctx.dtype)

    u_t = jax.jvp(lambda t: u_of(t, x_in)[0], (t_in,), (mod.ones_like(t_in),))[1]

    def flux(x):
        u, u_x = jax.jvp(lambda xx: u_of(t_in, xx)[0], (x,), (mod.ones_like(x),))
        return k_of(u) * u_x

    q_x = jax.jvp(flux, (x_in,), (mod.ones_like(x_in),))[1]

    res = [("eqn", u_t - q_x)]

    u_bound = u_of(mod.cast(extra.t_bound, ctx.dtype), mod.cast(extra.x_bound, ctx.dtype))[0]
    res += [("bound", u_bound - extra.u_bound)]

    if args.keep_init:
        u_init = u_of(mod.cast(extra.t_init, ctx.dtype), mod.cast(extra.x_init, ctx.dtype))[0]
        res += [("init", u_init - extra.u_init)]

    if extra.imp_size:
        imp_t, imp_x = extra.imp_points.T
        u_imp_net = u_of(mod.cast(imp_t, ctx.dtype), mod.cast(imp_x, ctx.dtype))[0]
        u_imp = mod.flatten(mod.cast(extra.imp_u, ctx.dtype))[extra.imp_indices]
        res += [("imp", (u_imp_net - u_imp) * args.kimp)]

    return res


def pick_imposed(domain, args):
    """Chooses imposed-measurement cells; returns (mask, points, flat indices)."""
    rng = np.random.default_rng(args.seed)
    size = int(np.prod(domain.cshape))
    flat = np.arange(size)
    if args.imposed == "random":
        chosen = rng.permutation(flat)[: min(args.nimp, size)]
    elif args.imposed == "stripe":
        t = np.asarray(domain.points("t")).flatten()
        band = flat[np.abs(t[flat] - 0.5) < 1 / 6]
        chosen = rng.permutation(band)[: min(args.nimp, band.size)]
    elif args.imposed == "none":
        chosen = np.array([], dtype=int)
    else:
        raise ValueError("Unknown imposed=" + args.imposed)
    chosen = np.unique(chosen)
    mask = np.zeros(size)
    if len(chosen):
        mask[chosen] = 1
        coords = [np.asarray(domain.points(i)).flatten() for i in range(domain.ndim)]
        points = np.array(coords)[:, chosen].T
    else:
        points = np.zeros((0, domain.ndim))
    return mask.reshape(domain.cshape), points, chosen


def build(nt=64, nx=64, infer_k=False, imposed="none", nimp=200, noise=0.0, seed=1000,
          kimp=2.0, kxreg=0.0, ktreg=0.0, kwreg=0.0, kmax=0.1, arch_k=(5, 5),
          dtype=np.float32, multigrid=True, kernel="xla", mesh=None, partition=None,
          args=None):
    """Builds the (inverse-)conductivity problem with a synthetic reference.
    Returns (problem, state, extra)."""
    if args is None:
        args = argparse.Namespace(
            infer_k=infer_k, imposed=imposed, nimp=nimp, noise=noise, seed=seed,
            kimp=kimp, kxreg=kxreg, kxregdecay=0, ktreg=ktreg, ktregdecay=0,
            kwreg=kwreg, kwregdecay=0, kmax=kmax, keep_frozen=1, keep_init=1,
            solver="odil",
        )
    domain = Domain(cshape=(nt, nx), dimnames=("t", "x"), multigrid=multigrid, dtype=dtype,
                    mesh=mesh, partition=partition)
    mod = domain.mod
    tt, xx = domain.points()
    t1, x1 = domain.points_1d()
    init_u = initial_temperature(x1 * 0, mod.cast(x1, dtype), mod)
    ref_u = initial_temperature(tt, xx, mod)

    imp_u = np.asarray(ref_u).copy()
    if args.noise:
        rng = np.random.default_rng(args.seed)
        imp_u = imp_u + rng.normal(loc=0, scale=args.noise, size=imp_u.shape)
    imp_mask, imp_points, imp_indices = pick_imposed(domain, args)

    extra = argparse.Namespace(
        args=args,
        ref_u=ref_u,
        ref_uk=np.linspace(0, 1, 200).astype(domain.dtype),
        init_u=mod.cast(init_u, dtype),
        imp_mask=mod.cast(imp_mask, dtype),
        imp_size=len(imp_points),
        imp_u=mod.cast(imp_u, dtype),
        imp_indices=imp_indices,
        imp_points=imp_points,
    )
    extra.ref_k = true_conductivity(extra.ref_uk)

    state = State(fields={"u": np.zeros(domain.cshape)})
    if args.infer_k:
        state.fields["k_net"] = domain.make_neural_net([1] + list(arch_k) + [1])
    state = domain.init_state(state)
    op = operator_odil_fused if kernel == "pallas" else operator_odil
    return Problem(op, domain, extra), state, extra


# -- tmax inference ---------------------------------------------------------


def exact_u_tmax(t, x, tmax_ref):
    """Solution of u_t = u_xx on [0, pi]: sin(x) exp(-t), time scaled."""
    return np.sin(np.asarray(x)) * np.exp(-np.asarray(t) * tmax_ref)


def clamp_initial_row(u, extra, mod):
    """Replaces the first time row with the exact initial condition."""
    return mod.concatenate([extra.u_init[None, :], u[1:]], axis=0)


def operator_tmax(ctx):
    mod = ctx.mod
    dt, dx = ctx.step("t", "x")
    it, ix = ctx.indices("t", "x", loc="nc")
    nt, nx = ctx.size("t", "x")
    coeff = ctx.field("coeff")
    extra = ctx.extra
    args = extra.args

    offsets = [(0, 0), (0, -1), (0, 1), (-1, 0), (-1, -1), (-1, 1)]

    def sample(offset):
        # Shift, clamp the initial row in the unshifted frame, shift back --
        # keeps ctx.field() as the single source so Newton sees the stencil.
        raw = ctx.field("u", *offset)
        unshifted = mod.roll(raw, offset, (0, 1))
        clamped = clamp_initial_row(unshifted, extra, mod)
        return mod.roll(clamped, [-s for s in offset], (0, 1))

    u, uxm, uxp, um, umxm, umxp = [sample(o) for o in offsets]

    # Zero Dirichlet via odd reflection at both walls.
    uxm = mod.where(ix == 0, -u, uxm)
    uxp = mod.where(ix == nx - 1, -u, uxp)
    umxm = mod.where(ix == 0, -um, umxm)
    umxp = mod.where(ix == nx - 1, -um, umxp)

    dt = dt * coeff[0]  # The inferred tmax stretches the time axis.

    u_t = (u - um) / dt
    lap_prev = (umxm - 2 * um + umxp) / dx**2
    lap_here = (uxm - 2 * u + uxp) / dx**2
    fu = u_t - 0.5 * (lap_here + lap_prev)
    fu = mod.where(it == 0, ctx.cast(0), fu)
    res = [("eqn", fu)]

    # One measured value at the center of the final row.
    ixc = nx // 2
    res += [("imp", args.kimp * (u[-1, ixc] - extra.u_final[ixc]))]
    return res


def build_tmax(nt=64, nx=64, tmax_ref=4.5, tmax_init=1.0, kimp=1.0, dtype=np.float64,
               multigrid=True, mg_interp=None, mg_nlvl=None, args=None):
    """Builds the tmax-inference problem. Returns (problem, state, extra)."""
    if args is None:
        args = argparse.Namespace(kimp=kimp, tmax_ref=tmax_ref, tmax_init=tmax_init)
    domain = Domain(
        cshape=(nt, nx),
        dimnames=("t", "x"),
        lower=(0, 0),
        upper=(1, np.pi),
        dtype=dtype,
        multigrid=multigrid,
        mg_interp=mg_interp,
        mg_nlvl=mg_nlvl,
    )
    tt, xx = domain.points(loc="nc")
    xone = domain.points_1d("x", loc="c")
    ref_u = exact_u_tmax(tt, xx, args.tmax_ref)
    u_init = exact_u_tmax(np.full_like(xone, domain.lower[0]), xone, args.tmax_ref)
    u_final = exact_u_tmax(np.full_like(xone, domain.upper[0]), xone, args.tmax_ref)

    state = domain.init_state(
        State(
            fields={
                "u": Field(np.tile(u_init, [nt + 1, 1]), loc="nc"),
                "coeff": Array([args.tmax_init]),
            }
        )
    )
    extra = argparse.Namespace(
        ref_u=ref_u,
        u_init=domain.cast(u_init),
        u_final=domain.cast(u_final),
        args=args,
    )
    return Problem(operator_tmax, domain, extra), state, extra


# Used by the heat example's plotting: evaluate the PINN temperature net.
def eval_u_net(domain, state):
    tt, xx = domain.points()
    return eval_neural_net(state.fields["u_net"], [tt, xx], domain.mod)[0]
