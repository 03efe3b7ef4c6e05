"""Mosaic lowering checks on real TPU silicon (VERDICT round 1, item 7).

The CPU suite exercises the Pallas kernels only in interpret mode
(tests/test_rowwise.py), so a kernel change that interprets correctly but
mis-lowers through Mosaic would previously surface only in bench
archaeology.  Here each fused kernel family compiles with interpret=False
on the attached TPU and must reproduce the plain-XLA operator's loss,
terms, and gradients on the same device.
"""

import numpy as np
import pytest

import jax

def _tpu_available(timeout=120):
    """True only when a TPU backend initializes promptly: backend init goes
    through a remote tunnel here, so failures -- an error OR an indefinite
    stall (observed: a down tunnel hangs init for 25+ minutes) -- must SKIP
    the lane, not error or hang collection.  A healthy tunnel initializes
    in seconds; the probe runs in a daemon thread with a timeout."""
    import threading

    result = []

    def probe():
        try:
            dev = jax.devices()[0]
            result.append(
                dev.platform in ("tpu", "axon") or "TPU" in str(dev).upper()
            )
        except Exception:
            result.append(False)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout)
    return bool(result) and result[0]


pytestmark = pytest.mark.skipif(not _tpu_available(), reason="needs a TPU device")


def _eval(problem, state):
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    return (
        float(np.asarray(loss)),
        [np.asarray(t) for t in terms],
        [np.asarray(g) for g in grads],
    )


# Gradient tolerance for the mg-kernel comparisons: the cotangent
# down-projection runs at raw MXU precision by default (round 5,
# rowwise_mg._BWD_DOT -- ~2^-9 relative rounding of the cotangent
# operand, applied at a different point than the XLA epilogue's own raw
# transpose), so kernel-vs-XLA gradients spread to ~3e-3 relative on
# random states.  A lowering regression produces garbage, not 5e-3.
MG_GRAD_TOL = 5e-3


def _compare_kernel_to_xla(kernel, multigrid, rtol=2e-6, atol=2e-6,
                           grad_rtol=None):
    from odil_tpu.models import veltracer as vt

    runs = {}
    for k in ("xla", kernel):
        problem, state, _ = vt.build(
            nt=16, nx=16, ny=16, kernel=k, multigrid=multigrid, dtype=np.float32
        )
        # Non-zero fields so gradients exercise every kernel branch.
        rnd = np.random.RandomState(5)
        arrays = problem.domain.arrays_from_state(state)
        arrays = [
            problem.domain.cast(0.1 * rnd.standard_normal(a.shape)) for a in arrays
        ]
        problem.domain.arrays_to_state(arrays, state)
        runs[k] = _eval(problem, state)
    (l0, t0, g0), (l1, t1, g1) = runs["xla"], runs[kernel]
    assert np.isfinite(l1)
    np.testing.assert_allclose(l0, l1, rtol=rtol)
    for a, b in zip(t0, t1):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
    gr = grad_rtol if grad_rtol is not None else rtol
    for a, b in zip(g0, g1):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(a, b, rtol=gr, atol=gr * scale)


def test_rowwise_kernel_lowers():
    """Whole-plane fused kernel (ops/rowwise.py) on silicon == XLA path."""
    _compare_kernel_to_xla("pallas", multigrid=False)


def test_rowwise_mg_kernel_lowers():
    """MG-fused kernel (ops/rowwise_mg.py) incl. the fused one-pass
    loss+grad training path on silicon == XLA path with multigrid.

    Tolerance 1e-3: the in-kernel Horner reconstruction runs on the MXU at
    default (bf16-mantissa) precision while the XLA ladder uses a different
    contraction order, giving ~2e-4 relative spread on random states; a
    lowering regression produces garbage, not 1e-4."""
    _compare_kernel_to_xla("pallas_mg", multigrid=True, rtol=1e-3, atol=1e-3,
                           grad_rtol=MG_GRAD_TOL)

    # The training-path fused loss+grad (Problem.make_loss_grad_fn) must
    # agree too -- it is the path bench.py and the optimizer scan use.
    from odil_tpu.models import veltracer as vt

    problem, state, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas_mg", multigrid=True, dtype=np.float32
    )
    fn = problem.make_loss_grad_fn(state)
    if fn is None:
        pytest.skip("fused loss+grad unavailable for this shape")
    arrays = problem.domain.arrays_from_state(state)
    (loss, (terms, norms)), grads = jax.jit(fn)(arrays, problem.tracers)

    problem0, state0, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=True, dtype=np.float32
    )
    l0, t0, g0 = _eval(problem0, state0)
    np.testing.assert_allclose(l0, float(np.asarray(loss)), rtol=1e-3)
    for a, b in zip(g0, grads):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=MG_GRAD_TOL, atol=MG_GRAD_TOL * scale
        )


def test_halo_sharded_kernel_lowers():
    """The halo-mode per-shard kernel (ctx.rowwise_terms rerouted through
    _HaloContext: halo-extended blocks, masked sums, psum) on silicon must
    reproduce the plain global-kernel path.  A 1-device mesh with a
    partitioned axis still exercises the full machinery (ghost extension,
    wrapped row function, sum/psum convention) inside shard_map."""
    from odil_tpu import parallel
    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.models import veltracer as vt

    kw = dict(nt=16, nx=16, ny=16, kernel="pallas", multigrid=False,
              dtype=np.float32)
    problem, state, _ = vt.build(**kw)
    loss_fn, arrays = problem.make_loss_fn(state)
    f0 = jax.jit(jax.value_and_grad(lambda a: loss_fn(a, problem.tracers)[0]))
    v0, g0 = f0(arrays)

    mesh = parallel.mesh_from_spec("x:1")
    problem1, state1, _ = vt.build(**kw, mesh=mesh, partition={"x": "x"})
    loss_fn1, arrays1 = make_halo_loss_fn(problem1, state1)
    f1 = jax.jit(jax.value_and_grad(lambda a: loss_fn1(a, problem1.tracers)[0]))
    v1, g1 = f1(arrays1)

    np.testing.assert_allclose(float(v0), float(v1), rtol=2e-6)
    for a, b in zip(g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6 * scale)


def test_halo_onepass_kernel_lowers():
    """The halo one-pass kernel mode (ops/rowwise_mg emit_dwraps/wraps_in:
    external head residents, head-cotangent outputs) through Mosaic on
    silicon: a 1-device mesh with a partitioned time axis runs the full
    make_halo_loss_grad_fn machinery (wrapped row function, windowed
    coarse, ppermuted heads) with interpret=False, and must reproduce the
    replicated XLA evaluation at f32/MXU tolerances."""
    from odil_tpu import parallel
    from odil_tpu.models import veltracer as vt

    problem0, state0, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=True, dtype=np.float32
    )
    l0, t0, g0 = _eval(problem0, state0)

    mesh = parallel.mesh_from_spec("t:1")
    problem1, state1, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
        dtype=np.float32, mesh=mesh, partition={"t": "t"},
    )
    fn = problem1.make_loss_grad_fn(state1, halo=True, halo_fuse="mg")
    assert fn is not None and fn.route == "mg"
    arrays1 = problem1.domain.arrays_from_state(state1)
    (loss, (terms, norms)), grads = jax.jit(fn)(arrays1, problem1.tracers)

    np.testing.assert_allclose(l0, float(np.asarray(loss)), rtol=1e-3)
    for a, b in zip(g0, grads):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=MG_GRAD_TOL, atol=MG_GRAD_TOL * scale
        )


def test_halo_generic_onepass_kernel_lowers():
    """The GENERIC halo one-pass route (deferred-kernel replay inside one
    per-shard jax.vjp; backward-with-sums kernel on the halo-extended local
    block) through Mosaic on silicon: a 1-device mesh with a partitioned x
    axis runs make_loss_grad_fn(halo=True) for a plain (non-kernel_decl)
    pallas operator with interpret=False, and must reproduce the replicated
    XLA evaluation at f32/MXU tolerances."""
    from odil_tpu import parallel
    from odil_tpu.models import veltracer as vt

    problem0, state0, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=False, dtype=np.float32
    )
    l0, t0, g0 = _eval(problem0, state0)

    mesh = parallel.mesh_from_spec("x:1")
    problem1, state1, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas", multigrid=False,
        dtype=np.float32, mesh=mesh, partition={"x": "x"},
    )
    fn = problem1.make_loss_grad_fn(state1, halo=True)
    assert fn is not None and fn.route == "generic"
    arrays1 = problem1.domain.arrays_from_state(state1)
    (loss, (terms, norms)), grads = jax.jit(fn)(arrays1, problem1.tracers)

    np.testing.assert_allclose(l0, float(np.asarray(loss)), rtol=1e-3)
    # No multigrid here -> no cotangent down-projection; keep the tight
    # non-mg gradient tolerance.
    for a, b in zip(g0, grads):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-3, atol=1e-3 * scale)


def test_halo_tiled_kernel_lowers():
    """The x-tiled halo composition through Mosaic on silicon: a 1-device
    mesh with a partitioned x axis gives a non-tileable halo-extended
    extent (16 + 2 = 18 -> edge-padded to 24 at the forced tile 8), so this
    exercises the whole-streamed meta const, the edge-pad mask, and the
    tiled backward with interpret=False -- for both the loss path
    (custom-vjp tiled backward) and the generic one-pass
    (backward-with-sums)."""
    from odil_tpu import parallel
    from odil_tpu.halo import _make_halo_onepass_loss_grad_fn, make_halo_loss_fn
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise

    problem0, state0, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=False, dtype=np.float32
    )
    l0, t0, g0 = _eval(problem0, state0)

    old = rowwise._FORCE_TILE
    rowwise._FORCE_TILE = 8
    try:
        mesh = parallel.mesh_from_spec("x:1")
        problem1, state1, _ = vt.build(
            nt=16, nx=16, ny=16, kernel="pallas", multigrid=False,
            dtype=np.float32, mesh=mesh, partition={"x": "x"},
        )
        loss_fn1, arrays1 = make_halo_loss_fn(problem1, state1)
        f1 = jax.jit(jax.value_and_grad(lambda a: loss_fn1(a, problem1.tracers)[0]))
        v1, g1 = f1(arrays1)

        lg = _make_halo_onepass_loss_grad_fn(problem1, state1)
        assert lg is not None, "tiled generic halo one-pass builder declined"
        (v2, (terms2, _)), g2 = jax.jit(lg)(arrays1, problem1.tracers)
    finally:
        rowwise._FORCE_TILE = old

    for v, g in ((v1, g1), (v2, g2)):
        np.testing.assert_allclose(l0, float(np.asarray(v)), rtol=2e-5)
        for a, b in zip(g0, g):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.max(np.abs(a))))
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5 * scale)


def test_halo_mg_tiled_onepass_lowers():
    """The MG-fused TILED halo one-pass (ops/rowwise_mg_local_tiled.py)
    through Mosaic on silicon: a 1-device mesh with a partitioned x axis
    gives a non-tileable halo-extended extent, forced onto the tiled route
    by shrinking the untiled kernel's VMEM limit -- runtime-gathered
    per-tile prolongation sub-matrices (virtual coarse axis), edge-padded
    extent, head residents and dwraps outputs, all with interpret=False.
    Must reproduce the replicated XLA evaluation at f32/MXU tolerances."""
    from odil_tpu import parallel
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise_mg

    problem0, state0, _ = vt.build(
        nt=16, nx=64, ny=16, kernel="xla", multigrid=True, dtype=np.float32
    )
    l0, t0, g0 = _eval(problem0, state0)

    old = rowwise_mg.MG_VMEM_LIMIT
    rowwise_mg.MG_VMEM_LIMIT = 1
    try:
        mesh = parallel.mesh_from_spec("x:1")
        problem1, state1, _ = vt.build(
            nt=16, nx=64, ny=16, kernel="pallas_mg", multigrid=True,
            dtype=np.float32, mesh=mesh, partition={"x": "x"},
        )
        fn = problem1.make_loss_grad_fn(state1, halo=True, halo_fuse="mg")
        assert fn is not None and fn.route == "mg", (
            "tiled MG halo one-pass builder declined"
        )
        arrays1 = problem1.domain.arrays_from_state(state1)
        (loss, (terms, norms)), grads = jax.jit(fn)(arrays1, problem1.tracers)
    finally:
        rowwise_mg.MG_VMEM_LIMIT = old

    np.testing.assert_allclose(l0, float(np.asarray(loss)), rtol=1e-3)
    for a, b in zip(g0, grads):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=MG_GRAD_TOL, atol=MG_GRAD_TOL * scale
        )


def test_halo_lane_partition_kernel_lowers():
    """A lane-axis (y) partition through Mosaic on silicon: the per-shard
    kernel runs on lane-extended local blocks (Ny + 2*halox columns, not a
    multiple of 128, so Mosaic pads the lane dimension) with the halo
    columns masked out of every sum.  A 1-device mesh partitioning y runs
    both the halo loss path and the generic one-pass with interpret=False
    and must reproduce the replicated XLA evaluation at f32/MXU
    tolerances."""
    from odil_tpu import parallel
    from odil_tpu.halo import make_halo_loss_fn
    from odil_tpu.models import veltracer as vt

    problem0, state0, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="xla", multigrid=True, dtype=np.float32
    )
    l0, t0, g0 = _eval(problem0, state0)

    mesh = parallel.mesh_from_spec("y:1")
    problem1, state1, _ = vt.build(
        nt=16, nx=16, ny=16, kernel="pallas", multigrid=True,
        dtype=np.float32, mesh=mesh, partition={"y": "y"},
    )
    loss_fn1, arrays1 = make_halo_loss_fn(problem1, state1)
    f1 = jax.jit(jax.value_and_grad(lambda a: loss_fn1(a, problem1.tracers)[0]))
    v1, g1 = f1(arrays1)
    np.testing.assert_allclose(l0, float(np.asarray(v1)), rtol=1e-3)
    for a, b in zip(g0, g1):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=MG_GRAD_TOL, atol=MG_GRAD_TOL * scale
        )

    fn = problem1.make_loss_grad_fn(state1, halo=True)
    assert fn is not None and fn.route == "generic"
    (loss, (terms, norms)), grads = jax.jit(fn)(arrays1, problem1.tracers)
    np.testing.assert_allclose(l0, float(np.asarray(loss)), rtol=1e-3)
    for a, b in zip(g0, grads):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=MG_GRAD_TOL, atol=MG_GRAD_TOL * scale
        )
