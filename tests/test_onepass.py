"""Generic one-pass fused loss+grad (Problem._make_onepass_loss_grad_fn):
for ANY operator whose kernel terms run through ctx.rowwise_terms, the
training step runs only the backward kernel (with accumulated loss sums)
plus exact jax.vjp folding of everything else -- no forward kernel.  Must
reproduce jax.value_and_grad of the standard loss bit-for-bit-close on
every workload shape: blocked 1D kernels (wave), NeuralNet params +
per-row data + non-kernel weight-regularizer terms (heat), and whole-plane
3D kernels (veltracer without multigrid partials)."""

import jax
import numpy as np
import pytest

import odil_tpu as odil


def _compare(problem, state, rtol=1e-12, atol=1e-12):
    fn = problem.make_loss_grad_fn(state, interpret=True)
    assert fn is not None, "generic one-pass builder declined"
    arrays = problem.domain.arrays_from_state(state)
    (loss1, (terms1, norms1)), grads1 = jax.jit(fn)(arrays, problem.tracers)

    loss_fn, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(arrays0, problem.tracers)

    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1), rtol=rtol)
    assert len(terms0) == len(terms1)
    for a, b in zip(terms0, terms1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol)
    assert len(grads0) == len(grads1)
    for a, b in zip(grads0, grads1):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol * max(1.0, np.max(np.abs(a))))


def _randomized(problem, state, seed=7):
    rnd = np.random.RandomState(seed)
    arrays = problem.domain.arrays_from_state(state)
    arrays = [problem.domain.cast(0.1 * rnd.standard_normal(a.shape)) for a in arrays]
    problem.domain.arrays_to_state(arrays, state)
    return state


def test_onepass_wave_blocked():
    """Wave: 1D planes (blocked kernel, hist=2 data rows), multigrid on."""
    from odil_tpu.models import wave as wv

    problem, state, extra = wv.build(nt=16, nx=16, kernel="pallas", multigrid=True)
    _compare(problem, _randomized(problem, state))


def test_onepass_heat_params_data_and_extra_terms():
    """Heat inverse: NeuralNet conductivity (kernel params), imposed
    measurements (per-row data), annealing tracers, and the non-kernel
    wreg term -- all gradients through one backward kernel + jax.vjp."""
    from odil_tpu.models import heat as ht

    problem, state, extra = ht.build(
        nt=16, nx=16, infer_k=True, imposed="random", nimp=40,
        dtype=np.float64, multigrid=True, kernel="pallas",
    )
    _compare(problem, _randomized(problem, state))


def test_onepass_veltracer_whole_plane():
    """Veltracer through the plain kernel (no multigrid partials): 3D
    whole-plane path of the one-pass backward."""
    from odil_tpu.models import veltracer as vt

    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=False, dtype=np.float64
    )
    _compare(problem, _randomized(problem, state))


def test_onepass_veltracer_multigrid_flattened():
    """Veltracer 'pallas' with multigrid ON: the generic route flattens the
    ladder inside the vjp (no partials), so multigrid cotangents flow
    through the batched Horner ladder transpose."""
    from odil_tpu.models import veltracer as vt

    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas", multigrid=True, dtype=np.float64
    )
    _compare(problem, _randomized(problem, state))


def test_onepass_declines_without_kernel_calls():
    """Plain-XLA operators record no kernel calls: the builder returns None
    (callers fall back to value_and_grad)."""
    from odil_tpu.models import wave as wv

    problem, state, extra = wv.build(nt=16, nx=16, kernel="xla", multigrid=True)
    assert problem.make_loss_grad_fn(state, interpret=True) is None


def test_onepass_trains_with_scanned_adam():
    """The generic one-pass binds into the scanned Adam optimizer and
    reproduces the value_and_grad training trajectory."""
    from odil_tpu.models import wave as wv
    from odil_tpu.optim import make_optimizer

    def train(onepass):
        problem, state, extra = wv.build(nt=16, nx=16, kernel="pallas", multigrid=True)
        loss_fn, arrays = problem.make_loss_fn(state)
        lg = problem.make_loss_grad_fn(state, interpret=True) if onepass else None
        if onepass:
            assert lg is not None
        opt = make_optimizer("adamn", dtype=problem.domain.dtype, mod=problem.domain.mod)
        opt.bind(loss_fn, tracers=problem.tracers, task_epochs=[0, 20],
                 names=None, loss_grad_fn=lg)
        arrays, _ = opt.run(arrays, epochs=20, lr=0.02)
        return float(loss_fn(arrays, problem.tracers)[0])

    np.testing.assert_allclose(train(True), train(False), rtol=1e-10)


def test_onepass_veltracer_tiled(monkeypatch):
    """Beyond-VMEM planes route the one-pass backward to the x-tiled
    kernel (rowwise_loss_and_grads_tiled: backward-with-sums, edge
    cotangent folds), forced at small shapes via rowwise._FORCE_TILE
    (interpret mode on CPU): make_loss_grad_fn must route with
    interpret=None and match jax.value_and_grad to roundoff."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops import rowwise

    monkeypatch.setattr(rowwise, "_FORCE_TILE", 8)
    problem, state, extra = vt.build(
        nt=8, nx=32, ny=16, kernel="pallas", multigrid=False, dtype=np.float64
    )
    state = _randomized(problem, state)
    fn = problem.make_loss_grad_fn(state)  # interpret=None: the tiled route
    assert fn is not None, "tiled one-pass builder declined"
    arrays = problem.domain.arrays_from_state(state)
    (loss1, (terms1, norms1)), grads1 = jax.jit(fn)(arrays, problem.tracers)

    loss_fn, arrays0 = problem.make_loss_fn(state)
    (loss0, (terms0, _)), grads0 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(arrays0, problem.tracers)
    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1), rtol=1e-12)
    for a, b in zip(grads0, grads1):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12 * max(1.0, np.max(np.abs(a))))
