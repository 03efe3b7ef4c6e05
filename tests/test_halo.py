"""Explicit shard_map + ppermute halo-exchange path (halo.py): loss, terms,
and gradients must match the GSPMD path exactly on the 8-device CPU mesh,
and the build-time validation must reject the unsupported layouts with
clear errors."""

import argparse

import jax
import numpy as np
import pytest

import odil_tpu as odil
from odil_tpu import parallel

from test_sharding import poisson_like_problem

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _compare_loss_and_grads(problem, state, halo_kw=None, rtol=1e-12, atol=1e-12):
    loss_fn0, arrays0 = problem.make_loss_fn(state)
    from odil_tpu.halo import make_halo_loss_fn

    loss_fn1, arrays1 = make_halo_loss_fn(problem, state, **(halo_kw or {}))

    def run(fn, arrays):
        def scalar(a, t):
            loss, aux = fn(a, t)
            return loss, aux

        (loss, (terms, norms)), grads = jax.jit(jax.value_and_grad(scalar, has_aux=True))(
            arrays, problem.tracers
        )
        return np.asarray(loss), list(map(np.asarray, terms)), [np.asarray(g) for g in grads]

    l0, t0, g0 = run(loss_fn0, arrays0)
    l1, t1, g1 = run(loss_fn1, arrays1)
    np.testing.assert_allclose(l0, l1, rtol=rtol)
    for a, b in zip(t0, t1):
        np.testing.assert_allclose(a, b, rtol=rtol)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol * max(1.0, np.max(np.abs(a))))
    return l1, g1


def test_halo_matches_gspmd_poisson():
    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem, state = poisson_like_problem(mesh=mesh, partition={"x": "x", "y": "y"})
    _compare_loss_and_grads(problem, state)


def test_halo_loc_conversion_on_unsharded_dim():
    """Staggered retargeting (c->n pad) is allowed along unpartitioned
    dimensions; only the partitioned ones are restricted."""
    mesh = parallel.mesh_from_spec("x:4")
    N = 16
    domain = odil.Domain(
        cshape=(N, N), dimnames=["x", "y"], dtype=np.float64, mesh=mesh, partition={"x": "x"}
    )

    def operator(ctx):
        u = ctx.field("u")
        uxp = ctx.field("u", 1, 0)
        un = ctx.field("u", 0, 1, loc="cn")  # c->n pad along unsharded y
        return [u - ctx.extra.rhs, uxp * 0.3, un[:, :-1] * 0.1]

    rhs = np.random.RandomState(1).rand(N, N)
    extra = argparse.Namespace(rhs=domain.cast(rhs))
    state = domain.init_state(
        odil.State(fields={"u": np.random.RandomState(2).rand(N, N)})
    )
    problem = odil.Problem(operator, domain, extra)
    _compare_loss_and_grads(problem, state)


@pytest.mark.parametrize("mg_ladder", ["local", "global"])
def test_halo_veltracer_multigrid(mg_ladder):
    """The flagship workload (three coupled multigrid fields, upwind
    stencils, localized extra data u_init/u_final) through the halo path.
    mg_ladder='local' runs the Horner ladder inside shard_map (windowed
    dynamic-sliced interp matrices, replicated coarse levels);
    'global' flattens it under GSPMD outside shard_map."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem, state, extra = vt.build(
        nt=8,
        nx=16,
        ny=16,
        kernel="xla",
        multigrid=True,
        dtype=np.float64,
        mesh=mesh,
        partition={"x": "x", "y": "y"},
    )
    _compare_loss_and_grads(
        problem, state, halo_kw={"mg_ladder": mg_ladder}, rtol=1e-9, atol=1e-10
    )


@pytest.mark.parametrize("mg_ladder", ["local", "global"])
def test_halo_veltracer_multigrid_t_partition(mg_ladder):
    """The flagship partitioned over the TIME axis (node-located, the
    long-axis/sequence-parallel analogue, SURVEY.md §5) and x: ghost-node
    blocks for every 'ncc' field, multigrid on — both ladder placements."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:4,x:2")
    problem, state, extra = vt.build(
        nt=16,
        nx=16,
        ny=16,
        kernel="xla",
        multigrid=True,
        dtype=np.float64,
        mesh=mesh,
        partition={"t": "t", "x": "x"},
    )
    _compare_loss_and_grads(
        problem, state, halo_kw={"mg_ladder": mg_ladder}, rtol=1e-12, atol=1e-12
    )


def test_halo_node_field_on_partitioned_axis():
    """Node-located ('+1 node') axes partition via the ghost-node layout:
    stencil reads INCLUDING the periodic wrap (roll modulo N+1, which the
    ring must correct for by one node) match GSPMD, with no boundary
    masking in the operator."""
    mesh = parallel.mesh_from_spec("x:4,y:2")
    N = 16
    rnd = np.random.RandomState(3)
    coef = rnd.rand(N + 1, N)

    def make(mesh=None, partition=None):
        domain = odil.Domain(
            cshape=(N, N), dimnames=["x", "y"], dtype=np.float64,
            mesh=mesh, partition=partition,
        )

        def operator(ctx):
            u = ctx.field("u")
            uxm = ctx.field("u", -1, 0)
            uxp = ctx.field("u", 1, 0)
            uxp2 = ctx.field("u", 2, 0)
            return [u * ctx.extra.coef - 1.0, uxp - uxm, uxp2 * 0.25]

        extra = argparse.Namespace(coef=domain.cast(coef))
        state = domain.init_state(
            odil.State(fields={"u": odil.Field(rnd.rand(N + 1, N), loc="nc")})
        )
        # Identical initial field for both paths.
        state.fields["u"].array = domain.cast(coef * 2.0 - 0.5)
        return odil.Problem(operator, domain, extra), state

    problem, state = make(mesh=mesh, partition={"x": "x", "y": "y"})
    _compare_loss_and_grads(problem, state)


def test_halo_rejects_term_sliced_along_partitioned_axis():
    """A global trim like field(...)[:-1] would silently become a per-device
    trim inside shard_map; the trace-time shape validation rejects it."""
    mesh = parallel.mesh_from_spec("x:2")
    N = 16
    domain = odil.Domain(
        cshape=(N, N), dimnames=["x", "y"], dtype=np.float64, mesh=mesh, partition={"x": "x"}
    )

    def operator(ctx):
        return [ctx.field("u")[:-1, :]]

    state = domain.init_state(odil.State(fields={"u": np.zeros((N, N))}))
    problem = odil.Problem(operator, domain, None)
    from odil_tpu.halo import make_halo_loss_fn

    loss_fn, arrays = make_halo_loss_fn(problem, state)
    with pytest.raises(ValueError, match="must not slice"):
        jax.eval_shape(loss_fn, arrays, problem.tracers)


@pytest.mark.parametrize("spec,part", [
    ("x:4", {"x": "x"}),
    ("t:4,x:2", {"t": "t", "x": "x"}),
])
@pytest.mark.parametrize("multigrid", [False, True])
def test_halo_fused_kernel_veltracer(spec, part, multigrid):
    """Fused-kernel operators compose with halo mode through
    ctx.rowwise_terms: the kernel runs per device shard on halo-extended
    blocks (incl. ghost-node time blocks) with masked sums, matching the
    global kernel path to roundoff."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec(spec)
    problem, state, extra = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas", multigrid=multigrid,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    _compare_loss_and_grads(problem, state)


def test_halo_fused_kernel_trains_with_scanned_adam():
    """The sharded-kernel loss_fn binds into the scanned Adam optimizer."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:2,x:2")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=False,
        dtype=np.float64, mesh=mesh, partition={"t": "t", "x": "x"},
    )
    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.optim import make_optimizer

    loss_fn, arrays = make_halo_loss_fn(problem, state)
    opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
    opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 40], names=None)
    loss_start = float(loss_fn(arrays, problem.tracers)[0])
    arrays, optinfo = opt.run(arrays, epochs=40, lr=0.02)
    loss_end = float(loss_fn(arrays, problem.tracers)[0])
    assert loss_end < 0.5 * loss_start, (loss_start, loss_end)


def test_halo_fused_kernel_wave_data_rows():
    """Wave's fused operator feeds boundary traces as per-row data (hist=2):
    data rows must ride the same t-halo exchange as the field, with the
    global (replicated-extra) arrays sliced to the local block."""
    from odil_tpu.models import wave as wv

    mesh = parallel.mesh_from_spec("t:4")
    problem, state, extra = wv.build(
        nt=16, nx=16, kernel="pallas", multigrid=True,
        mesh=mesh, partition={"t": "t"},
    )
    _compare_loss_and_grads(problem, state)


def test_halo_fused_kernel_heat_imposed_data():
    """Heat's fused operator under --halo: per-row imposed-measurement data
    (auto-sharded extras arriving local), NeuralNet conductivity params, and
    the epoch tracer, partitioned over time."""
    from odil_tpu.models import heat as ht

    mesh = parallel.mesh_from_spec("t:4")
    problem, state, extra = ht.build(
        nt=16, nx=16, infer_k=True, imposed="random", nimp=40,
        dtype=np.float64, multigrid=True, kernel="pallas",
        mesh=mesh, partition={"t": "t"},
    )
    _compare_loss_and_grads(problem, state)


@pytest.mark.parametrize("replicated", [False, True])
def test_halo_fused_kernel_data_planes(replicated):
    """Per-row data with plane extent along a partitioned axis: auto-sharded
    extras arrive local and are halo-extended by ppermute; replicated extras
    are sliced from the global array first.  The residual reads a rolled
    data plane, so the data halo columns enter real residuals."""
    mesh = parallel.mesh_from_spec("t:2,x:2")
    T, N = 8, 16
    domain = odil.Domain(
        cshape=(T, N, N), dimnames=("t", "x", "y"), dtype=np.float64,
        mesh=mesh, partition={"t": "t", "x": "x"}, multigrid=False,
    )
    rng = np.random.RandomState(5)
    extra = argparse.Namespace(dat=domain.cast(rng.rand(T, N, N)))

    def operator(ctx):
        mod = ctx.mod

        def row_fn(it, Tg, rows, data_rows, params, consts):
            (cur, prev) = rows[0]
            d = data_rows[0]
            return (cur - mod.roll(d, 1, 0) + 0.5 * prev,)

        return ctx.rowwise_terms(
            row_fn, ("u",), data=(ctx.extra.dat,), nterms=1, hist=1, halox=1
        )

    state = domain.init_state(odil.State(fields={"u": rng.rand(T, N, N)}))
    problem = odil.Problem(operator, domain, extra)
    halo_kw = {"extra_partition": {"dat": None}} if replicated else None
    _compare_loss_and_grads(problem, state, halo_kw=halo_kw)


def test_halo_rejects_handmade_raw_terms():
    mesh = parallel.mesh_from_spec("x:2")
    N = 16
    domain = odil.Domain(
        cshape=(N, N), dimnames=["x", "y"], dtype=np.float64, mesh=mesh, partition={"x": "x"}
    )

    def operator(ctx):
        from odil_tpu.context import Context

        return [Context.Raw(ctx.mod.mean(ctx.field("u") ** 2))]

    state = domain.init_state(odil.State(fields={"u": np.zeros((N, N))}))
    problem = odil.Problem(operator, domain, None)
    from odil_tpu.halo import make_halo_loss_fn

    with pytest.raises(ValueError, match="hand-made"):
        make_halo_loss_fn(problem, state)


@pytest.mark.parametrize("spec,part", [
    ("y:2", {"y": "y"}),
    ("x:2,y:2", {"x": "x", "y": "y"}),
    ("t:2,y:2", {"t": "t", "y": "y"}),
])
@pytest.mark.parametrize("multigrid", [False, True])
def test_halo_fused_kernel_lane_axis_partition(spec, part, multigrid):
    """Kernel operators partition the last (lane) plane axis too: the
    kernel runs on lane-extended local blocks (Ny/k + 2*halox columns)
    with the halo columns masked out of every sum, and the lane-axis
    ppermute exchange transposes exactly."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec(spec)
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=multigrid,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    _compare_loss_and_grads(problem, state)


def test_halo_lane_axis_trains_with_scanned_adam():
    """Scanned-Adam trajectory under a 2-D space mesh (x:2,y:2) through the
    sharded-kernel halo loss matches the single-device trajectory."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("x:2,y:2")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"x": "x", "y": "y"},
    )
    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.optim import make_optimizer

    loss_fn, arrays = make_halo_loss_fn(problem, state)
    opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
    opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 20], names=None)
    arrays, optinfo = opt.run(arrays, epochs=20, lr=0.02)

    problem0, state0, _ = vt.build(nt=8, nx=16, ny=16, kernel="pallas", multigrid=True,
                                   dtype=np.float64)
    loss_fn0, arrays0 = problem0.make_loss_fn(state0)
    opt0 = make_optimizer("adamn", dtype=problem0.domain.dtype, mod=problem0.domain.mod)
    opt0.bind(loss_fn0, tracers=problem0.tracers, task_epochs=[0, 20], names=None)
    arrays0, _ = opt0.run(arrays0, epochs=20, lr=0.02)
    for a, b in zip(arrays0, arrays):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12 * max(1.0, np.max(np.abs(a))))


def test_halo_rejects_loc_conversion_on_partitioned_axis():
    mesh = parallel.mesh_from_spec("x:2")
    N = 16
    domain = odil.Domain(
        cshape=(N, N), dimnames=["x", "y"], dtype=np.float64, mesh=mesh, partition={"x": "x"}
    )

    def operator(ctx):
        return [ctx.field("u", 0, 0, loc="nc")[:-1]]

    state = domain.init_state(odil.State(fields={"u": np.zeros((N, N))}))
    problem = odil.Problem(operator, domain, None)
    from odil_tpu.halo import make_halo_loss_fn

    with pytest.raises(ValueError, match="retargeting"):
        make_halo_loss_fn(problem, state)


def test_halo_trains_with_scanned_adam():
    """The halo loss_fn binds into the scanned Adam optimizer unchanged."""
    mesh = parallel.mesh_from_spec("x:2,y:4")
    problem, state = poisson_like_problem(mesh=mesh, partition={"x": "x", "y": "y"})
    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.optim import make_optimizer

    loss_fn, arrays = make_halo_loss_fn(problem, state)
    opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
    opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 50], names=None)
    loss_start = float(loss_fn(arrays, problem.tracers)[0])
    arrays, optinfo = opt.run(arrays, epochs=50, lr=0.05)
    loss_end = float(loss_fn(arrays, problem.tracers)[0])
    assert loss_end < 0.5 * loss_start, (loss_start, loss_end)


def _run_halo_onepass(problem, state, fuse=None):
    """((loss, terms, norms), grads) through the halo one-pass builder.
    ``fuse`` forces a route and asserts it was actually taken (so a
    builder silently declining cannot hollow out the test)."""
    lg = problem.make_loss_grad_fn(state, halo=True, halo_fuse=fuse)
    assert lg is not None
    if fuse is not None:
        assert lg.route == fuse, (lg.route, fuse)
    arrays = problem.domain.arrays_from_state(state)
    (loss, (terms, norms)), grads = jax.jit(lg)(arrays, problem.tracers)
    return (
        np.asarray(loss),
        list(map(np.asarray, terms)),
        list(map(np.asarray, norms)),
        [np.asarray(g) for g in grads],
    )


@pytest.mark.parametrize("spec,part", [
    ("x:4", {"x": "x"}),
    ("t:4,x:2", {"t": "t", "x": "x"}),
    ("t:8", {"t": "t"}),
])
def test_halo_onepass_mg_matches_gspmd(spec, part):
    """The MG-fused ONE-PASS loss+grad kernel composes with halo mode
    (halo.make_halo_loss_grad_fn): per device shard, fine rows are
    reconstructed in VMEM from the sharded level-0 term plus a time-window
    of the replicated level-1 partial, head rows ride a ppermute of the
    predecessor's reconstruction, and the backward sweep emits loss sums
    and cotangents together.  Must equal the replicated GSPMD
    value_and_grad evaluation to roundoff (f64 on the CPU mesh)."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec(spec)
    problem, state, extra = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    loss1, terms1, norms1, grads1 = _run_halo_onepass(problem, state, fuse="mg")

    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(loss1, np.asarray(loss0), rtol=1e-12)
    for a, b in zip(terms0, terms1):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-12)
    assert len(grads0) == len(grads1)
    for a, b in zip(grads0, grads1):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=1e-13 * max(1.0, np.max(np.abs(a)))
        )


def test_halo_onepass_mg_regularized_terms():
    """All six loss terms (kimp + x/t velocity regularizers) through the
    halo one-pass path, with an uneven mesh (t:2,x:4)."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:2,x:4")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"t": "t", "x": "x"},
        kxreg=0.01, ktreg=0.01,
    )
    loss1, terms1, norms1, grads1 = _run_halo_onepass(problem, state, fuse="mg")
    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(loss1, np.asarray(loss0), rtol=1e-12)
    assert len(terms1) == 6
    for a, b in zip(grads0, grads1):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=1e-13 * max(1.0, np.max(np.abs(a)))
        )


def test_halo_default_route_is_generic():
    """Production default routing under --halo: a kernel_decl operator
    (flagship pallas_mg, multigrid on) routes to the GENERIC one-pass
    (fn.route == "generic") -- the measured-faster route at halo
    geometries (BENCH_NOTES round 3) -- and matches the replicated GSPMD
    evaluation to roundoff.  ``halo_fuse="mg"`` flips to the MG-fused
    per-shard kernel (covered by the tests above)."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:2,x:2")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"t": "t", "x": "x"},
    )
    # interpret=True: off-TPU the generic builder otherwise declines (the
    # XLA fallback beats the Pallas interpreter); on device no flag needed.
    lg = problem.make_loss_grad_fn(state, halo=True, interpret=True)
    assert lg is not None and lg.route == "generic"
    arrays = problem.domain.arrays_from_state(state)
    (loss1, (terms1, _)), grads1 = jax.jit(lg)(arrays, problem.tracers)

    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0), rtol=1e-12)
    for a, b in zip(grads0, grads1):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=1e-12,
            atol=1e-13 * max(1.0, np.max(np.abs(a))),
        )


def test_halo_mg_fuse_declines_lane_partition_to_generic():
    """``halo_fuse='mg'`` under a lane-axis (y) partition falls back to the
    generic one-pass (the MG-fused local kernels' reconstruction windows
    assume a whole lane plane) and still matches GSPMD to roundoff."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("x:2,y:2")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"x": "x", "y": "y"},
    )
    lg = problem.make_loss_grad_fn(state, halo=True, interpret=True, halo_fuse="mg")
    assert lg is not None and lg.route == "generic"
    arrays = problem.domain.arrays_from_state(state)
    (loss1, _), grads1 = jax.jit(lg)(arrays, problem.tracers)

    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, _), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0), rtol=1e-12)
    for a, b in zip(grads0, grads1):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=1e-12,
            atol=1e-13 * max(1.0, np.max(np.abs(a))),
        )


def test_halo_onepass_gates():
    """The one-pass builder declines (returns None) outside its envelope:
    multigrid off, plain-kernel operators without a declaration."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:4")
    problem, state, extra = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas_mg", multigrid=False,
        dtype=np.float64, mesh=mesh, partition={"t": "t"},
    )
    assert problem.make_loss_grad_fn(state, halo=True) is None

    problem2, state2, extra2 = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"t": "t"},
    )
    assert problem2.make_loss_grad_fn(state2, halo=True) is None


def test_halo_onepass_trains_with_scanned_adam():
    """The halo one-pass binds into the scanned Adam optimizer as
    loss_grad_fn and reproduces the replicated fused training trajectory."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.optim import make_optimizer

    def train(mesh, part, halo):
        problem, state, extra = vt.build(
            nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
            dtype=np.float64, mesh=mesh, partition=part,
        )
        from odil_tpu.halo import make_halo_loss_fn

        if halo:
            loss_fn, arrays = make_halo_loss_fn(problem, state)
            lg = problem.make_loss_grad_fn(state, halo=True)
            assert lg is not None
        else:
            loss_fn, arrays = problem.make_loss_fn(state)
            lg = None
        opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
        opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 20],
                 names=None, loss_grad_fn=lg)
        arrays, optinfo = opt.run(arrays, epochs=20, lr=0.02)
        return float(loss_fn(arrays, problem.tracers)[0])

    mesh = parallel.mesh_from_spec("t:2,x:2")
    l_halo = train(mesh, {"t": "t", "x": "x"}, halo=True)
    l_ref = train(None, {}, halo=False)
    np.testing.assert_allclose(l_halo, l_ref, rtol=1e-10)


def test_halo_kernel_terms_with_unused_mesh_axis():
    """A mesh axis that partitions no grid dimension replicates every block;
    kernel (Raw) term sums must not be psum'd across it (regression: they
    were overcounted by the axis size)."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:2,r:4")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=False,
        dtype=np.float64, mesh=mesh, partition={"t": "t"},
    )
    _compare_loss_and_grads(problem, state)


# -- Generic one-pass (deferred-kernel) halo route ----------------------------


def _compare_generic_onepass(problem, state, nterms=None):
    """((loss, terms, norms), grads) through the GENERIC halo one-pass
    builder (deferred-kernel replay inside one per-shard jax.vjp) vs the
    replicated GSPMD value_and_grad evaluation, to roundoff."""
    from odil_tpu.halo import _make_halo_onepass_loss_grad_fn

    lg = _make_halo_onepass_loss_grad_fn(problem, state, interpret=True)
    assert lg is not None, "generic halo one-pass builder declined"
    arrays = problem.domain.arrays_from_state(state)
    (loss1, (terms1, norms1)), grads1 = jax.jit(lg)(arrays, problem.tracers)

    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0), rtol=1e-12)
    if nterms is not None:
        assert len(terms1) == nterms
    for a, b in zip(terms0, terms1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    assert len(grads0) == len(grads1)
    for a, b in zip(grads0, grads1):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=1e-13 * max(1.0, np.max(np.abs(a)))
        )


@pytest.mark.parametrize("spec,part", [
    ("x:4", {"x": "x"}),
    ("t:4,x:2", {"t": "t", "x": "x"}),
    ("x:2,y:2", {"x": "x", "y": "y"}),
])
@pytest.mark.parametrize("multigrid", [False, True])
def test_halo_generic_onepass_veltracer(spec, part, multigrid):
    """The generic one-pass fused loss+grad (plain-kernel operators, no MG
    partials) composes with halo mode: the operator replays in deferred
    mode inside one per-shard jax.vjp (multigrid ladder local, halo
    exchange transposed exactly), and the backward kernel emits masked loss
    sums and cotangents together."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec(spec)
    problem, state, extra = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas", multigrid=multigrid,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    _compare_generic_onepass(problem, state)


def test_halo_generic_onepass_wave_data_rows():
    """Wave (2-D grid, hist=2, boundary traces as per-row data) through the
    generic halo one-pass: data rows ride the recorded halo exchange."""
    from odil_tpu.models import wave as wv

    mesh = parallel.mesh_from_spec("t:4")
    problem, state, extra = wv.build(
        nt=16, nx=16, kernel="pallas", multigrid=True,
        mesh=mesh, partition={"t": "t"},
    )
    _compare_generic_onepass(problem, state)


def test_halo_generic_onepass_heat_params():
    """Heat with NeuralNet conductivity params and imposed-measurement data:
    parameter cotangents cross the per-shard kernel and are psum-combined
    over partitioning axes only."""
    from odil_tpu.models import heat as ht

    mesh = parallel.mesh_from_spec("t:4")
    problem, state, extra = ht.build(
        nt=16, nx=16, infer_k=True, imposed="random", nimp=40,
        dtype=np.float64, multigrid=True, kernel="pallas",
        mesh=mesh, partition={"t": "t"},
    )
    _compare_generic_onepass(problem, state)


def test_halo_generic_onepass_unused_axis_and_regs():
    """All six veltracer terms (kernel terms + imposed + x/t velocity
    regularizers evaluated in XLA) with a mesh axis that partitions
    nothing: kernel and non-kernel sums share the partitioning-axes-only
    psum convention, replicating axes enter the counts."""
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:2,r:4")
    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"t": "t"},
        kxreg=0.01, ktreg=0.01,
    )
    _compare_generic_onepass(problem, state, nterms=6)


def test_halo_generic_onepass_gates():
    """The generic builder declines (returns None) outside its envelope:
    no ctx.rowwise_terms calls, or interpret unset off-TPU -- and the
    make_loss_grad_fn(halo=True) dispatcher reaches it when the MG-fused
    route declines."""
    from odil_tpu.halo import _make_halo_onepass_loss_grad_fn
    from odil_tpu.models import veltracer as vt

    mesh = parallel.mesh_from_spec("t:4")
    problem, state, extra = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"t": "t"},
    )
    assert _make_halo_onepass_loss_grad_fn(problem, state, interpret=True) is None

    problem2, state2, extra2 = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas", multigrid=True,
        dtype=np.float64, mesh=mesh, partition={"t": "t"},
    )
    # Off-TPU without interpret=True: decline (training falls back to
    # value_and_grad of the halo loss; the XLA fallback beats the
    # interpreter there).
    assert problem2.make_loss_grad_fn(state2, halo=True) is None
    assert problem2.make_loss_grad_fn(state2, halo=True, interpret=True) is not None


def test_halo_generic_onepass_trains_with_scanned_adam():
    """The generic halo one-pass binds into the scanned Adam optimizer as
    loss_grad_fn and reproduces the replicated training trajectory."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.optim import make_optimizer

    def train(mesh, part, halo):
        problem, state, extra = vt.build(
            nt=8, nx=16, ny=16, kernel="pallas", multigrid=True,
            dtype=np.float64, mesh=mesh, partition=part,
        )
        from odil_tpu.halo import make_halo_loss_fn

        if halo:
            loss_fn, arrays = make_halo_loss_fn(problem, state)
            lg = problem.make_loss_grad_fn(state, halo=True, interpret=True)
            assert lg is not None
        else:
            loss_fn, arrays = problem.make_loss_fn(state)
            lg = None
        opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
        opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 20],
                 names=None, loss_grad_fn=lg)
        arrays, optinfo = opt.run(arrays, epochs=20, lr=0.02)
        return float(loss_fn(arrays, problem.tracers)[0])

    mesh = parallel.mesh_from_spec("t:2,x:2")
    l_halo = train(mesh, {"t": "t", "x": "x"}, halo=True)
    l_ref = train(None, {}, halo=False)
    np.testing.assert_allclose(l_halo, l_ref, rtol=1e-10)


@pytest.mark.parametrize("spec,part", [
    ("x:2", {"x": "x"}),          # ext X = 16+2 = 18 -> edge-padded to 24
    ("t:2,x:4", {"t": "t", "x": "x"}),  # ext X = 8+2 = 10 -> padded to 16
    ("t:4", {"t": "t"}),          # x unpartitioned: ext X = 32, no pad
])
@pytest.mark.parametrize("multigrid", [False, True])
def test_halo_fused_kernel_tiled(spec, part, multigrid, monkeypatch):
    """Beyond-VMEM local blocks route the per-shard kernel to the x-tiled
    variant (rowwise_tiled): halo-extended extents edge-padded under the
    masked-edge contract, the (1, 2) meta const streamed whole, periodic
    t selection via ghost-node blocks.  Forced at small shapes through the
    rowwise._FORCE_TILE hook (interpret mode on the CPU mesh); must match
    the GSPMD path to 1e-12."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise

    monkeypatch.setattr(rowwise, "_FORCE_TILE", 8)
    mesh = parallel.mesh_from_spec(spec)
    problem, state, extra = vt.build(
        nt=8, nx=32, ny=16, kernel="pallas", multigrid=multigrid,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    _compare_loss_and_grads(problem, state)


def test_halo_fused_kernel_tiled_trains_with_scanned_adam(monkeypatch):
    """The halo x-tiled route binds into the scanned Adam optimizer and
    reproduces the untiled halo trajectory exactly."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise
    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.optim import make_optimizer

    mesh = parallel.mesh_from_spec("t:2,x:2")

    def train(force_tile):
        if force_tile:
            monkeypatch.setattr(rowwise, "_FORCE_TILE", 8)
        else:
            monkeypatch.setattr(rowwise, "_FORCE_TILE", None)
        problem, state, extra = vt.build(
            nt=8, nx=32, ny=16, kernel="pallas", multigrid=False,
            dtype=np.float64, mesh=mesh, partition={"t": "t", "x": "x"},
        )
        loss_fn, arrays = make_halo_loss_fn(problem, state)
        opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
        opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 20], names=None)
        arrays, optinfo = opt.run(arrays, epochs=20, lr=0.02)
        return float(loss_fn(arrays, problem.tracers)[0])

    l_ref = train(force_tile=False)
    l_tiled = train(force_tile=True)
    np.testing.assert_allclose(l_ref, l_tiled, rtol=1e-12)


@pytest.mark.parametrize("spec,part", [
    ("x:2", {"x": "x"}),          # ext X = 32+2 = 34 -> edge-padded to 40
    ("t:2,x:4", {"t": "t", "x": "x"}),  # ext X = 8+2 = 10 -> padded to 16
])
@pytest.mark.parametrize("multigrid", [False, True])
def test_halo_generic_onepass_tiled(spec, part, multigrid, monkeypatch):
    """The generic halo one-pass through the x-tiled backward-with-sums
    kernel (beyond-VMEM local blocks, forced at small shapes via
    rowwise._FORCE_TILE): the deferred-kernel replay runs
    rowwise_loss_and_grads_tiled per shard on the edge-padded
    halo-extended block and must match the replicated GSPMD
    value_and_grad to 1e-12."""
    from odil_tpu.halo import _make_halo_onepass_loss_grad_fn
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise

    monkeypatch.setattr(rowwise, "_FORCE_TILE", 8)
    mesh = parallel.mesh_from_spec(spec)
    nx = 64 if spec == "x:2" else 32
    problem, state, extra = vt.build(
        nt=8, nx=nx, ny=16, kernel="pallas", multigrid=multigrid,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    lg = _make_halo_onepass_loss_grad_fn(problem, state)  # interpret=None
    assert lg is not None, "tiled generic halo one-pass builder declined"
    arrays = problem.domain.arrays_from_state(state)
    (loss1, (terms1, norms1)), grads1 = jax.jit(lg)(arrays, problem.tracers)

    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0), rtol=1e-12)
    for a, b in zip(terms0, terms1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    for a, b in zip(grads0, grads1):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=1e-13 * max(1.0, np.max(np.abs(a)))
        )


@pytest.mark.parametrize("spec,part", [
    ("x:2", {"x": "x"}),
    ("t:2,x:2", {"t": "t", "x": "x"}),
    ("t:4", {"t": "t"}),
])
def test_halo_onepass_mg_tiled_matches_gspmd(spec, part, monkeypatch):
    """The MG-fused TILED one-pass (ops/rowwise_mg_local_tiled.py) under
    halo: local blocks beyond the untiled kernel's VMEM fit keep the fused
    route via x tiling with runtime-gathered per-tile prolongation
    sub-matrices (virtual coarse axis) and edge-padded non-tileable
    extents.  Forced at small shapes by shrinking the untiled VMEM limit;
    must equal the replicated GSPMD value_and_grad to roundoff."""
    import odil_tpu.halo as halo_mod
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise_mg

    monkeypatch.setattr(rowwise_mg, "MG_VMEM_LIMIT", 1)

    mesh = parallel.mesh_from_spec(spec)
    problem, state, extra = vt.build(
        nt=16, nx=64, ny=16, kernel="pallas_mg", multigrid=True,
        dtype=np.float64, mesh=mesh, partition=part,
    )
    loss1, terms1, norms1, grads1 = _run_halo_onepass(problem, state, fuse="mg")

    loss_fn0, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn0, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(loss1, np.asarray(loss0), rtol=1e-12)
    for a, b in zip(terms0, terms1):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-12)
    assert len(grads0) == len(grads1)
    for a, b in zip(grads0, grads1):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=1e-13 * max(1.0, np.max(np.abs(a)))
        )


def test_halo_onepass_mg_tiled_scanned_adam_trajectory(monkeypatch):
    """Scanned-Adam training through the tiled MG-fused halo one-pass
    reproduces the replicated fused trajectory."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.optim import make_optimizer
    from odil_tpu.ops import rowwise_mg

    def train(mesh, part, halo):
        problem, state, extra = vt.build(
            nt=8, nx=64, ny=16, kernel="pallas_mg", multigrid=True,
            dtype=np.float64, mesh=mesh, partition=part,
        )
        from odil_tpu.halo import make_halo_loss_fn

        if halo:
            loss_fn, arrays = make_halo_loss_fn(problem, state)
            lg = problem.make_loss_grad_fn(state, halo=True, halo_fuse="mg")
            assert lg is not None and lg.route == "mg"
        else:
            loss_fn, arrays = problem.make_loss_fn(state)
            lg = None
        opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
        opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 15],
                 names=None, loss_grad_fn=lg)
        arrays, optinfo = opt.run(arrays, epochs=15, lr=0.02)
        return float(loss_fn(arrays, problem.tracers)[0])

    l_ref = train(None, {}, halo=False)
    monkeypatch.setattr(rowwise_mg, "MG_VMEM_LIMIT", 1)
    mesh = parallel.mesh_from_spec("t:2,x:2")
    l_halo = train(mesh, {"t": "t", "x": "x"}, halo=True)
    np.testing.assert_allclose(l_halo, l_ref, rtol=1e-10)
