"""Matrix-free Gauss-Newton: the TPU-native replacement for sparse Newton.

The reference assembles an explicit sparse Jacobian on the host and solves
the normal equations with scipy/PyAMG (``src/odil/core.py:1113-1217``,
``src/odil/linsolver.py``).  Here the products  J v  and  J^T w  are exactly
``jax.jvp`` / ``jax.vjp`` of the concatenated-residual function, so the
damped normal equations

    (J^T J + damp^2 I + dampdiag^2 diag(J^T J)) delta = -J^T r

are solved by (preconditioned) conjugate gradients entirely on device,
inside one jitted step -- no Jacobian is ever materialized (SURVEY.md §7
"Newton without scipy").  Two accelerations:

- **Jacobi preconditioning** with diag(J^T J) estimated exactly-in-
  expectation by Hutchinson probes: diag = E[(J^T z)^2], z Rademacher over
  the residual space.  This plays the role of the reference's PyAMG
  ``multigrid`` linear solver (``src/odil/linsolver.py:61-72``) without any
  host matrix.
- With multigrid-decomposed unknowns the residual function already maps from
  the decomposed basis, so CG runs geometrically preconditioned for free;
  the reference's Newton cannot use multigrid at all
  (``examples/wave/README.md:25-30``).
"""

from argparse import Namespace


import jax
import jax.numpy as jnp
import numpy as np

from .util import printlog

__all__ = [
    "gauss_newton_step",
    "estimate_normal_diag",
    "make_bpx_parts",
    "make_bpx_preconditioner",
    "make_vcycle_parts",
    "make_vcycle_preconditioner",
    "optimize_gauss_newton",
]


def estimate_normal_diag(f, x, key, nprobe=8):
    """Hutchinson estimate of diag(J^T J) at x: E[(J^T z)^2] with Rademacher
    z over the residual space (exact in expectation, nprobe-sample mean)."""
    r0, pullback = jax.vjp(f, x)

    def probe(key):
        # The probe is a COTANGENT seed, so it lives in residual space:
        # r0.dtype, not x.dtype (they differ when an operator's constants
        # promote an f32 state's residuals to f64 under enabled x64).
        z = jax.random.rademacher(key, r0.shape, dtype=r0.dtype)
        return jnp.square(pullback(z)[0])

    keys = jax.random.split(key, nprobe)
    return jnp.mean(jax.vmap(probe)(keys), axis=0)


def _field_layout(domain, state):
    """(key, loc, shape, offset, size) of every plain grid Field in the
    packed vector; None if any unknown is not a plain Field."""
    from .fields import Field, field_arrays

    layout = []
    offset = 0
    for key, fobj in state.fields.items():
        arrays = field_arrays(fobj)
        size = sum(int(np.prod(a.shape)) for a in arrays)
        if not isinstance(fobj, Field):
            return None
        layout.append((key, fobj.loc, tuple(fobj.array.shape), offset, size))
        offset += size
    return layout


def _mg_levels(shape, loc):
    """Level count: how many times every axis can halve (cells >= 4)."""
    cells = [n - (1 if c == "n" else 0) for n, c in zip(shape, loc)]
    nlvl = 1
    while all(n % 2 == 0 and n >= 4 for n in cells):
        cells = [n // 2 for n in cells]
        nlvl += 1
    return nlvl


def make_bpx_parts(domain, state, normal_mv_at, x_template, nprobe=4):
    """Squared-BPX preconditioner as a (setup, apply) pair.

    normal_mv_at(x, v): the GN normal matvec linearized at x.
    setup(x, key) -> pstate (per-level scales; eager, jitted internally) --
    call again at a new linearization point to REBUILD without recompiling
    anything downstream, since apply(pstate, v) is a pure function of the
    pstate arrays.  See make_bpx_preconditioner for the math."""
    from .transfer import interp_to_finer

    layout = _field_layout(domain, state)
    if layout is None:
        return None
    mod = domain.mod
    x0 = x_template

    def level_cshape(shape, loc, lvl):
        return tuple(
            ((n - (1 if c == "n" else 0)) >> lvl) + (1 if c == "n" else 0)
            for n, c in zip(shape, loc)
        )

    def compute_scales(x, key):
        scales = []
        for key_, loc, shape, offset, size in layout:
            nlvl = _mg_levels(shape, loc)
            s_levels = []
            for lvl in range(nlvl):
                cshape_l = level_cshape(shape, loc, lvl)
                acc = 0.0
                for _ in range(nprobe):
                    key, sub = jax.random.split(key)
                    z = jax.random.rademacher(sub, cshape_l, dtype=x0.dtype)
                    pz = interp_to_finer(z, loc=loc, mod=mod, depth=lvl)
                    w = jnp.zeros_like(x0).at[offset : offset + size].set(pz.reshape(-1))
                    acc = acc + jnp.vdot(w, normal_mv_at(x, w))
                est = acc / (nprobe * int(np.prod(cshape_l)))
                s_levels.append(1.0 / jnp.sqrt(jnp.maximum(est, 1e-30)))
            scales.append(s_levels)
        return scales

    setup_jit = jax.jit(compute_scales)

    def setup(x, key):
        return setup_jit(x, key)

    def apply(pstate, v):
        def half_sweep(v):
            out = jnp.zeros_like(v)
            for (key_, loc, shape, offset, size), s_levels in zip(layout, pstate):
                vf = v[offset : offset + size].reshape(shape)
                contrib = s_levels[0] * vf
                for lvl in range(1, len(s_levels)):
                    cshape_l = level_cshape(shape, loc, lvl)
                    prolong = lambda z, _lvl=lvl: interp_to_finer(z, loc=loc, mod=mod, depth=_lvl)
                    _, pt = jax.vjp(prolong, jnp.zeros(cshape_l, v.dtype))
                    contrib = contrib + s_levels[lvl] * prolong(pt(vf)[0])
                out = out.at[offset : offset + size].set(contrib.reshape(-1))
            return out

        return half_sweep(half_sweep(v))

    return setup, apply


def make_bpx_preconditioner(domain, state, normal_matvec, x0, key, nprobe=4):
    """Squared-BPX multilevel preconditioner for the GN normal equations.

    The normal operator N = J^T J is (order of A)^2, so a single additive
    multilevel sweep (classical BPX, optimal for 2nd-order operators) is
    not enough.  Instead build H = sum_l s_l P_l P_l^T per grid field with
    s_l ~ 1/sqrt(mean diag of P_l^T N P_l) -- i.e. H approximates the
    inverse *square root* of N -- and use M = H o H, which is symmetric
    positive definite by construction.  P_l is the geometric prolongation
    chain and P_l^T its *true adjoint* via jax.vjp (the reference-style
    full-weighting restriction is not the transpose).  Scales come from
    Hutchinson probes through the actual normal operator, so no problem
    knowledge is needed.

    This is the TPU-native replacement for the reference's PyAMG
    'multigrid' linear solver (src/odil/linsolver.py:61) -- no matrix, no
    host.  Measured on 128^2 Poisson GN: residual loss 374 -> 0.06 in 400
    CG iterations vs 374 -> 266 for plain CG.  Returns None if the state
    has non-Field unknowns (caller falls back to Jacobi).

    Frozen-at-x0 convenience over make_bpx_parts (the gn driver uses the
    parts directly so it can rebuild on a cadence)."""
    parts = make_bpx_parts(domain, state, lambda x, v: normal_matvec(v), x0, nprobe=nprobe)
    if parts is None:
        return None
    setup, apply = parts
    pstate = setup(x0, key)
    return lambda v: apply(pstate, v)


def make_vcycle_parts(
    domain,
    state,
    normal_mv_at,
    x_template,
    degree=3,
    cheb_alpha=16.0,
    nprobe=8,
    npower=12,
    max_nlvl=None,
    coarse_ridge=1e-8,
    dense_cutoff=1024,
):
    """Geometric V-cycle preconditioner as a (setup, apply) pair.

    Matrix-free Galerkin hierarchy: the level-l operator is
    N_l = P_l^T N P_l with P_l the geometric prolongation chain
    (`interp_to_finer(depth=l)`) and P_l^T its exact adjoint via jax.vjp,
    so every level application costs one fine-grid matvec and the Galerkin
    consistency N_{l+1} = p_l^T N_l p_l holds by construction.  One
    symmetric V-cycle per application:

    - smoother: Chebyshev(degree) on the Jacobi-preconditioned operator
      D_l^-1 N_l, targeting the interval [lmax/cheb_alpha, lmax].  D_l is a
      Hutchinson diagonal estimate (diag = E[z * N_l z], Rademacher z) and
      lmax is measured per level by power iteration on D_l^-1 N_l itself,
      so the smoother is stable regardless of estimator noise -- plain
      omega-Jacobi is NOT (for N = A^2 of the 5-point Laplacian even the
      exact diagonal gives rho(D^-1 N) ~ 3.2 > 2).  cheb_alpha=16 covers
      the coarse-grid-invisible half of the spectrum of a squared
      2nd-order operator (frequency halving divides an A^2 eigenvalue by
      ~16);
    - coarse level: exact dense solve.  The hierarchy is truncated at the
      FIRST level whose total unknown count is <= dense_cutoff; that level's
      Galerkin operator is materialized column-by-column at setup (jitted
      lax.map of fine matvecs) and inverted on the host with a relative
      ridge, so the cycle is strictly SPD.  Truncating early both halves
      the per-application fine-matvec count (every deeper level would cost
      fine matvecs too, since the Galerkin operators are matrix-free) and
      strengthens the coarse correction (exact solve in a richer space).

    Polynomial smoothers are self-adjoint in the N_l inner product, so the
    same pre/post smoothing yields a fixed symmetric positive-definite
    linear operator -- a valid CG preconditioner.  This replaces the
    reference's host-side PyAMG solve (src/odil/linsolver.py:61) for
    ill-conditioned Newton systems where the additive squared-BPX sweep
    (above) is not strong enough (512^2 fp64).
    Returns None for non-Field unknowns or grids with < 2 levels.

    normal_mv_at(x, v) is the normal matvec linearized at x, so the
    preconditioner can be REBUILT at the current iterate of a nonlinear
    Gauss-Newton run: setup(x, key) -> pstate re-estimates the smoother
    diagonals/spectral bounds and re-inverts the coarse Galerkin matrix
    (eager; the jitted probes compile once), while apply(pstate, v) is a
    pure function of the pstate arrays -- swapping in a fresh pstate never
    recompiles the jitted Gauss-Newton step that closes over apply."""
    from .transfer import interp_to_finer

    layout = _field_layout(domain, state)
    if layout is None:
        return None
    mod = domain.mod
    x0 = x_template
    dtype = x0.dtype
    tmap = jax.tree_util.tree_map

    def level_cshape(shape, loc, lvl):
        return tuple(
            ((n - (1 if c == "n" else 0)) >> lvl) + (1 if c == "n" else 0)
            for n, c in zip(shape, loc)
        )

    nlvls = [_mg_levels(shape, loc) for _, loc, shape, _, _ in layout]
    L = max(nlvls)
    if max_nlvl:
        L = min(L, int(max_nlvl))
    if L < 2:
        return None

    def fdepth(i, lvl):
        # Fields shallower than the hierarchy stay at their own coarsest.
        return min(lvl, nlvls[i] - 1)

    def shapes_at(lvl):
        return [
            level_cshape(shape, loc, fdepth(i, lvl))
            for i, (_, loc, shape, _, _) in enumerate(layout)
        ]

    # Truncate at the first level small enough for an exact dense solve.
    for lvl in range(1, L):
        if sum(int(np.prod(s)) for s in shapes_at(lvl)) <= dense_cutoff:
            L = lvl + 1
            break

    def unflatten0(v):
        return tuple(
            v[offset : offset + size].reshape(shape)
            for (_, loc, shape, offset, size) in layout
        )

    def flatten0(fields):
        out = jnp.zeros_like(x0)
        for (key_, loc, shape, offset, size), f in zip(layout, fields):
            out = out.at[offset : offset + size].set(f.reshape(-1))
        return out

    def make_N(lvl):
        depths = [fdepth(i, lvl) for i in range(len(layout))]

        def prolong(fields_l):
            fine = []
            for (key_, loc, *_), z, d in zip(layout, fields_l, depths):
                fine.append(interp_to_finer(z, loc=loc, mod=mod, depth=d) if d else z)
            return flatten0(tuple(fine))

        def N_l(x, fields_l):
            _, pullback = jax.vjp(prolong, fields_l)
            return pullback(normal_mv_at(x, prolong(fields_l)))[0]

        zeros_l = tuple(jnp.zeros(s, dtype) for s in shapes_at(lvl))
        return N_l, zeros_l

    N_ops = [make_N(lvl) for lvl in range(L)]

    def prolong_adj(fields_c, lvl):
        out = []
        for i, ((key_, loc, *_), z) in enumerate(zip(layout, fields_c)):
            if fdepth(i, lvl + 1) > fdepth(i, lvl):
                z = interp_to_finer(z, loc=loc, mod=mod, depth=1)
            out.append(z)
        return tuple(out)

    def restrict_adj(fields_f, lvl):
        zeros_c = tuple(jnp.zeros(s, dtype) for s in shapes_at(lvl + 1))
        _, pullback = jax.vjp(lambda fc: prolong_adj(fc, lvl), zeros_c)
        return pullback(fields_f)[0]

    # Per-level smoother data: Jacobi diagonal estimate (Hutchinson) and
    # the largest eigenvalue of D^-1 N (power iteration), jitted per level
    # as functions of the linearization point x so rebuilds re-run the SAME
    # compiled program.
    setup_fns = []
    for lvl in range(L - 1):
        N_l, zeros_l = N_ops[lvl]

        def setup_level(x, key, N_l=N_l, zeros_l=zeros_l):
            acc = tmap(jnp.zeros_like, zeros_l)
            k = key
            for _ in range(nprobe):
                k, sub = jax.random.split(k)
                subs = jax.random.split(sub, len(zeros_l))
                z = tuple(
                    jax.random.rademacher(s, zl.shape, dtype=dtype)
                    for s, zl in zip(subs, zeros_l)
                )
                nz = N_l(x, z)
                acc = tmap(lambda a, zi, ni: a + zi * ni, acc, z, nz)

            def _fix(a):
                m = jnp.mean(jnp.abs(a)) / nprobe + 1e-30
                a = a / nprobe
                return jnp.where(a > 0.01 * m, a, m)

            dinv = tmap(lambda a: 1.0 / _fix(a), acc)
            # Power iteration on D^-1 N for a stable Chebyshev upper bound.
            k, sub = jax.random.split(k)
            subs = jax.random.split(sub, len(zeros_l))
            y = tuple(
                jax.random.normal(s, zl.shape, dtype=dtype)
                for s, zl in zip(subs, zeros_l)
            )
            lam = jnp.asarray(1.0, dtype)
            for _ in range(npower):
                ny = jnp.sqrt(
                    sum(jnp.sum(jnp.square(yi)) for yi in jax.tree_util.tree_leaves(y))
                )
                y = tmap(lambda yi: yi / (ny + 1e-30), y)
                w = tmap(jnp.multiply, dinv, N_l(x, y))
                lam = jnp.sqrt(
                    sum(jnp.sum(jnp.square(wi)) for wi in jax.tree_util.tree_leaves(w))
                )
                y = w
            lmax = 1.1 * lam
            lmin = lmax / cheb_alpha
            return dinv, 0.5 * (lmax + lmin), 0.5 * (lmax - lmin)

        setup_fns.append(jax.jit(setup_level))

    def cheb_smooth(Nx_l, dinv, theta, delta, b, v=None):
        """`degree` steps of preconditioned Chebyshev for N_l v = b on the
        interval [theta-delta, theta+delta] of D^-1 N_l (Saad Alg. 12.1);
        v=None starts from zero (saves one matvec).  theta/delta may be
        traced scalars (they live in the rebuildable pstate)."""
        r = b if v is None else tmap(jnp.subtract, b, Nx_l(v))
        d = tmap(lambda di, ri: di * ri / theta, dinv, r)
        v = d if v is None else tmap(jnp.add, v, d)
        sigma = theta / delta
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = tmap(jnp.subtract, r, Nx_l(d))
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = tmap(
                lambda dk, di, ri: (rho_new * rho) * dk + (2.0 * rho_new / delta) * di * ri,
                d,
                dinv,
                r,
            )
            v = tmap(jnp.add, v, d)
            rho = rho_new
        return v

    # Exact coarse solve: materialize N_{L-1} column by column (jitted as a
    # function of x; the host inversion reruns per rebuild).
    N_c, zeros_c = N_ops[L - 1]
    sizes_c = [int(np.prod(z.shape)) for z in zeros_c]
    m = sum(sizes_c)
    if m > 4096:
        return None

    def unpack_c(v):
        out, o = [], 0
        for zl, n in zip(zeros_c, sizes_c):
            out.append(v[o : o + n].reshape(zl.shape))
            o += n
        return tuple(out)

    def pack_c(fields):
        return jnp.concatenate([f.reshape(-1) for f in fields])

    cols_fn = jax.jit(
        lambda x: jax.lax.map(
            lambda e: pack_c(N_c(x, unpack_c(e))), jnp.eye(m, dtype=dtype)
        )
    )

    def setup(x, key):
        """Builds the preconditioner state at linearization point x."""
        smoothers = []
        for lvl in range(L - 1):
            key, sub = jax.random.split(key)
            smoothers.append(setup_fns[lvl](x, sub))
        A = np.asarray(cols_fn(x))
        A = 0.5 * (A + A.T)
        ridge = coarse_ridge * max(float(np.trace(A)) / m, 1e-30)
        Minv_c = jnp.asarray(np.linalg.inv(A + ridge * np.eye(m)), dtype=dtype)
        return {"x": x, "smooth": smoothers, "Minv": Minv_c}

    def apply(pstate, v):
        x = pstate["x"]

        def coarse_solve(r):
            return unpack_c(pstate["Minv"] @ pack_c(r))

        def vcycle(r, lvl):
            if lvl == L - 1:
                return coarse_solve(r)
            N_l, _ = N_ops[lvl]
            Nx_l = lambda fl: N_l(x, fl)  # noqa: E731
            dinv, theta, delta = pstate["smooth"][lvl]
            v = cheb_smooth(Nx_l, dinv, theta, delta, r)  # pre-smooth from zero
            res = tmap(jnp.subtract, r, Nx_l(v))
            vc = vcycle(restrict_adj(res, lvl), lvl + 1)
            v = tmap(jnp.add, v, prolong_adj(vc, lvl))
            return cheb_smooth(Nx_l, dinv, theta, delta, r, v=v)  # post-smooth

        return flatten0(vcycle(unflatten0(v), 0))

    return setup, apply


def make_vcycle_preconditioner(
    domain, state, normal_matvec, x0, key, **kwargs
):
    """Frozen-at-x0 V-cycle preconditioner M(v) (see make_vcycle_parts for
    the rebuildable (setup, apply) form the gn driver uses).  normal_matvec
    is already linearized at x0."""
    parts = make_vcycle_parts(
        domain, state, lambda x, v: normal_matvec(v), x0, **kwargs
    )
    if parts is None:
        return None
    setup, apply = parts
    pstate = setup(x0, key)
    return lambda v: apply(pstate, v)


def gauss_newton_step(
    f, x, damp=0.0, dampdiag=0.0, tol=1e-6, maxiter=100, precond_diag=None,
    precond=None, term_sizes=None,
):
    """One Gauss-Newton update for residual function `f` at point `x`.

    precond_diag: optional diag(J^T J) estimate; enables Jacobi
    preconditioning and the dampdiag term.  term_sizes: optional flat sizes
    of the per-term residual slices (f.term_sizes); when given, the info
    dict carries 'terms' = per-term mean squares of r(x) -- free, since the
    step evaluates r(x) anyway -- plus 'step_norm'/'x_norm'.  Jittable."""
    r0, pullback = jax.vjp(f, x)

    def normal_matvec(v):
        jv = jax.jvp(f, (x,), (v,))[1]
        av = pullback(jv)[0]
        if damp:
            av = av + (damp * damp) * v
        if dampdiag and precond_diag is not None:
            av = av + (dampdiag * dampdiag) * precond_diag * v
        return av

    M = precond
    if M is None and precond_diag is not None:
        inv = 1.0 / jnp.maximum(precond_diag + damp * damp, 1e-30)

        def M(v):  # noqa: E731
            return inv * v

    rhs = -pullback(r0)[0]
    delta, _ = jax.scipy.sparse.linalg.cg(normal_matvec, rhs, tol=tol, maxiter=maxiter, M=M)
    info = {"loss": jnp.mean(jnp.square(r0))}
    if term_sizes is not None:
        parts = jnp.split(r0, list(np.cumsum(term_sizes)[:-1]))
        info["terms"] = [jnp.mean(jnp.square(p)) for p in parts]
        info["step_norm"] = jnp.linalg.norm(delta)
        info["x_norm"] = jnp.linalg.norm(x)
    return x + delta, info


def optimize_gauss_newton(args, problem, state, callback=None, **kwargs):
    """Newton driver using the matrix-free Gauss-Newton step.

    Flags reused from the linsolver group: --linsolver_tol, --linsolver_damp,
    --linsolver_dampdiag, --linsolver_maxiter (CG iterations).
    --linsolver multigrid -> BPX multilevel preconditioning (grid-Field
    states); --linsolver cg (or dampdiag>0) -> Hutchinson-Jacobi."""
    domain = problem.domain
    f, x = problem.residual_fn(state, halo=bool(getattr(args, "halo", 0)))
    damp = getattr(args, "linsolver_damp", 0.0) or 0.0
    dampdiag = getattr(args, "linsolver_dampdiag", 0.0) or 0.0
    tol = getattr(args, "linsolver_tol", 1e-6)
    maxiter = getattr(args, "linsolver_maxiter", None) or 100
    linsolver = getattr(args, "linsolver", "")
    use_bpx = linsolver == "multigrid"
    use_vcycle = linsolver == "vcycle"
    use_jacobi = linsolver == "cg" or dampdiag > 0

    def normal_mv_at(xl, v):
        _, pb = jax.vjp(f, xl)
        return pb(jax.jvp(f, (xl,), (v,))[1])[0]

    names = f.term_names
    sizes = f.term_sizes
    setup = apply_M = pstate = None
    if use_bpx or use_vcycle:
        # Multilevel preconditioner as a rebuildable (setup, apply) pair:
        # setup(x, key) re-estimates smoother data at the current iterate
        # without recompiling the jitted step (pstate is a step argument).
        key0 = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
        if use_vcycle:
            # Reference MG knobs map onto the V-cycle: --nlvl caps the
            # hierarchy depth, --smooth_pre sets the Chebyshev degree,
            # --ndirect^2 scales the exact-coarse-solve cutoff.
            nlvl = getattr(args, "nlvl", None)
            degree = getattr(args, "smooth_pre", None) or 3
            ndirect = getattr(args, "ndirect", None)
            parts = make_vcycle_parts(
                domain,
                state,
                normal_mv_at,
                x,
                degree=max(1, int(degree)),
                max_nlvl=nlvl if nlvl and nlvl < 100 else None,
                dense_cutoff=max(1024, int(ndirect) ** 2) if ndirect else 1024,
            )
        else:
            parts = make_bpx_parts(domain, state, normal_mv_at, x)
        if parts is None:
            printlog(
                "Multilevel preconditioner unavailable "
                "(non-Field unknowns or no grid hierarchy); using Jacobi"
            )
            use_bpx, use_vcycle, use_jacobi = False, False, True
        else:
            setup, apply_M = parts
            pstate = setup(x, key0)
            step = jax.jit(
                lambda x, pstate, key: gauss_newton_step(
                    f, x, damp=damp, tol=tol, maxiter=maxiter,
                    precond=lambda v: apply_M(pstate, v), term_sizes=sizes,
                )
            )
    if not (use_bpx or use_vcycle) and use_jacobi:
        # Unrolled in the jitted step: each probe adds a transposed residual
        # evaluation to the graph, which dominates GSPMD-partitioning time
        # on wide meshes — override via --gn_nprobe when compile time
        # matters more than diagonal-estimate variance.
        nprobe = int(getattr(args, "gn_nprobe", 0) or 8)

        @jax.jit
        def step(x, pstate, key):
            diag = estimate_normal_diag(f, x, key, nprobe=nprobe)
            return gauss_newton_step(
                f, x, damp=damp, dampdiag=dampdiag, tol=tol, maxiter=maxiter,
                precond_diag=diag, term_sizes=sizes,
            )

    elif not (use_bpx or use_vcycle):
        step = jax.jit(
            lambda x, pstate, key: gauss_newton_step(
                f, x, damp=damp, tol=tol, maxiter=maxiter, term_sizes=sizes
            )
        )

    @jax.jit
    def term_stats(x):
        r = f(x)
        parts = jnp.split(r, list(np.cumsum(sizes)[:-1]))
        return [jnp.mean(jnp.square(p)) for p in parts]

    def pinfo_from_terms(terms):
        terms = [np.asarray(t) for t in terms]
        norms = [np.sqrt(max(float(t), 0.0)) for t in terms]
        return {
            "terms": terms,
            "names": names,
            "norms": norms,
            "loss": float(np.sum(terms)),
        }

    kind = (
        ", BPX-preconditioned"
        if use_bpx
        else ", V-cycle-preconditioned"
        if use_vcycle
        else ", Jacobi-preconditioned"
        if use_jacobi
        else ""
    )
    printlog(f"Running Gauss-Newton (matrix-free CG{kind}) optimizer")
    if callback:
        callback(state, args.epoch_start, pinfo_from_terms(term_stats(x)))

    # Preconditioner rebuild policy: --linsolver_precond_every N rebuilds on
    # a fixed cadence; with the flag unset (0) a rebuild triggers when the
    # per-epoch loss reduction stalls (< 1.5x) while the iterate still moves
    # (so converged/linear runs never thrash), at most every 3 epochs.
    precond_every = int(getattr(args, "linsolver_precond_every", 0) or 0)
    last_rebuild = args.epoch_start
    loss_prev = None

    key = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    evals = 0
    for epoch in range(args.epoch_start, args.epochs):
        key, sub = jax.random.split(key)
        x_new, info = step(x, pstate, sub)
        evals += 1
        # info['terms'] is free (computed from the step's own residual
        # r(x)): it describes the PRE-step point, i.e. the post-state of the
        # previous epoch -- so the callback for boundary `epoch` fires now,
        # one iteration late, and the final boundary runs one term_stats
        # pass after the loop.  This removes the reference-style full
        # eval_loss_grad per epoch (src/odil/util.py:170-182).
        if callback and epoch > args.epoch_start:
            domain.unpack_state(x, state)
            callback(state, epoch, pinfo_from_terms(info["terms"]))
        loss_now = float(np.sum([np.asarray(t) for t in info["terms"]]))
        if setup is not None:
            due = precond_every > 0 and (epoch + 1 - last_rebuild) >= precond_every
            stalled = (
                precond_every == 0
                and loss_prev is not None
                and loss_now > loss_prev / 1.5
                and float(info["step_norm"]) > 1e-6 * (1.0 + float(info["x_norm"]))
                and (epoch + 1 - last_rebuild) >= 3
            )
            if due or stalled:
                key, sub = jax.random.split(key)
                pstate = setup(x_new, sub)
                last_rebuild = epoch + 1
        loss_prev = loss_now
        x = x_new
    domain.unpack_state(x, state)
    if callback and args.epochs > args.epoch_start:
        callback(state, args.epochs, pinfo_from_terms(term_stats(x)))
    arrays = domain.arrays_from_state(state)
    optinfo = Namespace(epochs=args.epochs, evals=evals)
    return arrays, optinfo
