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

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon")
    and "TPU" not in str(jax.devices()[0]).upper(),
    reason="needs a TPU device",
)


def _eval(problem, state):
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    return (
        float(np.asarray(loss)),
        [np.asarray(t) for t in terms],
        [np.asarray(g) for g in grads],
    )


def _compare_kernel_to_xla(kernel, multigrid, rtol=2e-6, atol=2e-6):
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
    for a, b in zip(g0, g1):
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol * scale)


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
    _compare_kernel_to_xla("pallas_mg", multigrid=True, rtol=1e-3, atol=1e-3)

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
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-3, atol=1e-3 * scale)
