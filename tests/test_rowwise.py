"""Fused row-wise residual kernel: forward and gradients must match the
plain-XLA reference computation exactly (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odil_tpu.ops import rowwise_loss_terms


def make_fields(T=6, N=16, nf=2, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(T, N)), jnp.float32) for _ in range(nf))


def test_matches_xla_simple_diffusion():
    T, N = 6, 16
    (u,) = make_fields(T, N, nf=1)
    dt, dx = 0.1, 0.2

    def row_fn(it, T_, rows, data_rows, params, consts):
        (u_rows,) = rows
        cur, prev = u_rows
        lap = (jnp.roll(cur, -1) - 2 * cur + jnp.roll(cur, 1)) / dx**2
        r = (cur - prev) / dt - lap
        r = jnp.where(it == 0, 0.0, r)
        return (r,)

    terms = rowwise_loss_terms(row_fn, (u,), nterms=1, hist=1, interpret=True)

    # Reference: same residual via whole-array rolls.
    prev = jnp.roll(u, 1, axis=0)
    lap = (jnp.roll(u, -1, 1) - 2 * u + jnp.roll(u, 1, 1)) / dx**2
    r = (u - prev) / dt - lap
    it = jnp.arange(T)[:, None]
    r = jnp.where(it == 0, 0.0, r)
    expect = jnp.mean(r**2)
    np.testing.assert_allclose(np.asarray(terms[0]), np.asarray(expect), rtol=1e-6)


def test_gradients_match_xla():
    T, N = 8, 16
    u, v = make_fields(T, N, nf=2, seed=1)
    c = jnp.asarray(np.random.default_rng(2).normal(size=(N,)), jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts):
        (u_rows, v_rows) = rows
        (c0,) = consts
        ucur, uprev = u_rows
        vcur, _ = v_rows
        adv = vcur * (jnp.roll(ucur, -1) - jnp.roll(ucur, 1)) * 0.5
        r1 = (ucur - uprev) + adv
        r1 = jnp.where(it == 0, ucur - c0, r1)
        r2 = vcur - jnp.roll(vcur, 1)
        return (r1, r2)

    def loss_kernel(u, v):
        t1, t2 = rowwise_loss_terms(row_fn, (u, v), consts=(c,), nterms=2, hist=1, interpret=True)
        return t1 + 0.5 * t2

    def loss_ref(u, v):
        uprev = jnp.roll(u, 1, axis=0)
        adv = v * (jnp.roll(u, -1, 1) - jnp.roll(u, 1, 1)) * 0.5
        r1 = (u - uprev) + adv
        it = jnp.arange(T)[:, None]
        r1 = jnp.where(it == 0, u - c[None, :], r1)
        r2 = v - jnp.roll(v, 1, 1)
        return jnp.mean(r1**2) + 0.5 * jnp.mean(r2**2)

    l_k = float(loss_kernel(u, v))
    l_r = float(loss_ref(u, v))
    np.testing.assert_allclose(l_k, l_r, rtol=1e-6)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(u, v)
    gr = jax.grad(loss_ref, argnums=(0, 1))(u, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_hist2_wave_pattern():
    """Second-order-in-time stencil (wave equation, hist=2)."""
    T, N = 8, 16
    (u,) = make_fields(T, N, nf=1, seed=3)
    dt, dx = 0.1, 0.2

    def row_fn(it, T_, rows, data_rows, params, consts):
        (u_rows,) = rows
        cur, tm, tmm = u_rows
        u_tt = (cur - 2 * tm + tmm) / dt**2
        u_xx = (jnp.roll(tm, -1) - 2 * tm + jnp.roll(tm, 1)) / dx**2
        r = u_tt - u_xx
        r = jnp.where(it <= 1, 0.0, r)
        return (r,)

    def loss_kernel(u):
        (t,) = rowwise_loss_terms(row_fn, (u,), nterms=1, hist=2, interpret=True)
        return t

    def loss_ref(u):
        tm = jnp.roll(u, 1, 0)
        tmm = jnp.roll(u, 2, 0)
        u_tt = (u - 2 * tm + tmm) / dt**2
        u_xx = (jnp.roll(tm, -1, 1) - 2 * tm + jnp.roll(tm, 1, 1)) / dx**2
        r = u_tt - u_xx
        it = jnp.arange(T)[:, None]
        r = jnp.where(it <= 1, 0.0, r)
        return jnp.mean(r**2)

    np.testing.assert_allclose(float(loss_kernel(u)), float(loss_ref(u)), rtol=1e-6)
    gk = jax.grad(loss_kernel)(u)
    gr = jax.grad(loss_ref)(u)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-5, atol=1e-6)


def test_2d_planes():
    """3D space-time fields: planes are 2D (veltracer pattern)."""
    T, NX, NY = 4, 8, 8
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=(T, NX, NY)), jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts):
        ((cur, prev),) = rows
        r = (cur - prev) + 0.1 * (jnp.roll(cur, -1, 0) - jnp.roll(cur, 1, 0))
        return (r,)

    def loss_kernel(u):
        (t,) = rowwise_loss_terms(row_fn, (u,), nterms=1, hist=1, interpret=True)
        return t

    def loss_ref(u):
        prev = jnp.roll(u, 1, 0)
        r = (u - prev) + 0.1 * (jnp.roll(u, -1, 1) - jnp.roll(u, 1, 1))
        return jnp.mean(r**2)

    np.testing.assert_allclose(float(loss_kernel(u)), float(loss_ref(u)), rtol=1e-6)
    gk = jax.grad(loss_kernel)(u)
    gr = jax.grad(loss_ref)(u)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-5, atol=1e-6)


def test_veltracer_pallas_operator_matches_xla():
    """The example's fused operator must produce the same training result."""
    import importlib
    import os
    import sys
    import tempfile

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "velocity_from_tracer")
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        veltracer = importlib.import_module("veltracer")
        losses = {}
        for kernel in ("xla", "pallas"):
            os.chdir(cwd)
            argv = ["--Nx", "8", "--kernel", kernel, "--multigrid", "0", "--epochs", "20",
                    "--report_every", "1000", "--history_every", "10", "--plot_every", "1000",
                    "--frames", "0", "--outdir", tempfile.mkdtemp(), "--seed", "7"]
            p, s = veltracer.main(argv)
            losses[kernel] = float(p.eval_loss_grad(s)[0])
        assert abs(losses["xla"] - losses["pallas"]) / abs(losses["xla"]) < 1e-4, losses
    finally:
        os.chdir(cwd)
        sys.path.remove(path)


def test_params_gradients_neural_net_in_kernel():
    """NeuralNet weights as differentiable kernel params: gradients must
    match the plain-XLA computation (heat inverse-conductivity pattern)."""
    T, N = 8, 16
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(T, N)), jnp.float32)
    W1 = jnp.asarray(rng.normal(size=(4, 1)) * 0.5, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4,)) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.normal(size=(1, 4)) * 0.5, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(T, N)), jnp.float32)

    def net(x, params):
        W1, b1, W2, b2 = params
        h = jnp.tanh(jnp.einsum("...i,oi->...o", x[..., None], W1) + b1)
        return (jnp.einsum("...i,oi->...o", h, W2) + b2)[..., 0]

    def row_fn(it, T_, rows, data_rows, params, consts):
        ((cur, prev),) = rows
        (m,) = data_rows
        k = net(cur, params)
        r = (cur - prev) - k * (jnp.roll(cur, -1) - 2 * cur + jnp.roll(cur, 1))
        return (r * m,)

    def loss_kernel(u, params):
        (t,) = rowwise_loss_terms(
            row_fn, (u,), params=params, data=(mask,), nterms=1, hist=1, interpret=True
        )
        return t

    def loss_ref(u, params):
        prev = jnp.roll(u, 1, 0)
        k = net(u, params)
        r = (u - prev) - k * (jnp.roll(u, -1, 1) - 2 * u + jnp.roll(u, 1, 1))
        return jnp.mean((r * mask) ** 2)

    params = (W1, b1, W2, b2)
    np.testing.assert_allclose(float(loss_kernel(u, params)), float(loss_ref(u, params)), rtol=1e-5)
    gk = jax.grad(loss_kernel, argnums=(0, 1))(u, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(u, params)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-6)
    for a, b in zip(gk[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_heat_pallas_operator_matches_xla():
    import importlib
    import os
    import sys
    import tempfile

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "heat")
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        heat = importlib.import_module("heat")
        losses = {}
        for kernel in ("xla", "pallas"):
            os.chdir(cwd)
            argv = ["--Nt", "16", "--Nx", "16", "--kernel", kernel, "--multigrid", "0",
                    "--epochs", "20", "--infer_k", "1", "--imposed", "random", "--nimp", "30",
                    "--kxreg", "0.01", "--ktreg", "0.01", "--kwreg", "0.1",
                    "--report_every", "1000", "--history_every", "10", "--plot_every", "1000",
                    "--frames", "0", "--outdir", tempfile.mkdtemp(), "--seed", "7"]
            p, s = heat.main(argv)
            losses[kernel] = float(p.eval_loss_grad(s)[0])
        assert abs(losses["xla"] - losses["pallas"]) / abs(losses["xla"]) < 1e-3, losses
    finally:
        os.chdir(cwd)
        sys.path.remove(path)


def test_wave_pallas_operator_matches_xla():
    import importlib
    import os
    import sys
    import tempfile

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "wave")
    sys.path.insert(0, path)
    cwd = os.getcwd()
    try:
        wave = importlib.import_module("wave")
        losses = {}
        for kernel in ("xla", "pallas"):
            os.chdir(cwd)
            argv = ["--Nt", "16", "--Nx", "16", "--kernel", kernel, "--multigrid", "0",
                    "--optimizer", "adamn", "--lr", "0.01", "--epochs", "20",
                    "--report_every", "1000", "--history_every", "10", "--plot_every", "1000",
                    "--frames", "0", "--outdir", tempfile.mkdtemp(), "--seed", "7"]
            p, s = wave.main(argv)
            losses[kernel] = float(p.eval_loss_grad(s)[0])
        assert abs(losses["xla"] - losses["pallas"]) / abs(losses["xla"]) < 1e-6, losses
    finally:
        os.chdir(cwd)
        sys.path.remove(path)


def test_vmap_fallback_matches_interpret():
    """The automatic XLA vmap path (off-TPU / VMEM-overflow fallback) must
    equal the kernel in interpret mode, values and gradients."""
    T, N = 8, 16
    u, v = make_fields(T, N, nf=2, seed=9)

    def row_fn(it, T_, rows, data_rows, params, consts):
        (u_rows, v_rows) = rows
        ucur, uprev = u_rows
        vcur, _ = v_rows
        r1 = (ucur - uprev) + vcur * (jnp.roll(ucur, -1) - jnp.roll(ucur, 1)) * 0.5
        r1 = jnp.where(it == 0, 0.0, r1)
        return (r1,)

    def loss(u, v, interpret):
        (t,) = rowwise_loss_terms(row_fn, (u, v), nterms=1, hist=1, interpret=interpret)
        return t

    li = float(loss(u, v, True))
    lf = float(loss(u, v, None))  # CPU -> vmap fallback
    np.testing.assert_allclose(li, lf, rtol=1e-6)
    gi = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(u, v)
    gf = jax.grad(lambda a, b: loss(a, b, None), argnums=(0, 1))(u, v)
    for a, b in zip(gi, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_blocked_matches_unblocked():
    """Multi-row blocked kernel == per-row kernel, values and gradients,
    including params, data, hist=2, and 1D planes."""
    T, N = 8, 16
    u, v = make_fields(T, N, nf=2, seed=11)
    mask = jnp.asarray(np.random.default_rng(3).integers(0, 2, (T, N)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(4).normal(size=(3,)) * 0.3, jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts):
        (u_rows, v_rows) = rows
        (m,) = data_rows
        (wv,) = params
        cur, tm, tmm = u_rows
        vcur = v_rows[0]
        r1 = (cur - 2 * tm + tmm) + vcur * (jnp.roll(cur, -1) - jnp.roll(cur, 1)) * wv[0]
        r1 = jnp.where(it <= 1, wv[1] * cur, r1) * m
        r2 = (vcur - v_rows[1]) * wv[2]
        r2 = jnp.where(it == 0, 0.0, r2)
        return (r1, r2)

    def loss(u, v, w, block_rows):
        t1, t2 = rowwise_loss_terms(
            row_fn, (u, v), params=(w,), data=(mask,), nterms=2, hist=2,
            interpret=True, block_rows=block_rows,
        )
        return t1 + 0.3 * t2

    l1 = float(loss(u, v, w, 1))
    l4 = float(loss(u, v, w, 4))
    np.testing.assert_allclose(l1, l4, rtol=1e-6)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(u, v, w, 1)
    g4 = jax.grad(loss, argnums=(0, 1, 2))(u, v, w, 4)
    for a, b in zip(g1, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_blocked_2d_planes():
    T, NX, NY = 8, 8, 8
    rng = np.random.default_rng(12)
    u = jnp.asarray(rng.normal(size=(T, NX, NY)), jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts):
        ((cur, prev),) = rows
        r = (cur - prev) + 0.1 * (jnp.roll(cur, -1, 0) - jnp.roll(cur, 1, 1))
        r = jnp.where(it == 0, 0.0, r)
        return (r,)

    def loss(u, block_rows):
        (t,) = rowwise_loss_terms(
            row_fn, (u,), nterms=1, hist=1, interpret=True, block_rows=block_rows
        )
        return t

    np.testing.assert_allclose(float(loss(u, 1)), float(loss(u, 4)), rtol=1e-6)
    g1 = jax.grad(lambda a: loss(a, 1))(u)
    g4 = jax.grad(lambda a: loss(a, 4))(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g4), rtol=1e-5, atol=1e-6)


def test_stream_matches_per_row():
    """Streaming ring-buffer kernel == per-row kernel, values and gradients,
    including params, data, hist=2, 1D/2D planes."""
    T, N = 8, 16
    u, v = make_fields(T, N, nf=2, seed=21)
    mask = jnp.asarray(np.random.default_rng(22).integers(0, 2, (T, N)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(23).normal(size=(3,)) * 0.3, jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts):
        (u_rows, v_rows) = rows
        (m,) = data_rows
        (wv,) = params
        cur, tm, tmm = u_rows
        vcur = v_rows[0]
        r1 = (cur - 2 * tm + tmm) + vcur * (jnp.roll(cur, -1) - jnp.roll(cur, 1)) * wv[0]
        r1 = jnp.where(it <= 1, wv[1] * cur, r1) * m
        r2 = (vcur - v_rows[1]) * wv[2]
        r2 = jnp.where(it == 0, 0.0, r2)
        return (r1, r2)

    def loss(u, v, w, stream):
        t1, t2 = rowwise_loss_terms(
            row_fn, (u, v), params=(w,), data=(mask,), nterms=2, hist=2,
            interpret=True, stream=stream,
        )
        return t1 + 0.3 * t2

    np.testing.assert_allclose(float(loss(u, v, w, False)), float(loss(u, v, w, True)), rtol=1e-6)
    g0 = jax.grad(loss, argnums=(0, 1, 2))(u, v, w, False)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(u, v, w, True)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_stream_2d_planes_hist1():
    T, NX, NY = 6, 8, 8
    rng = np.random.default_rng(24)
    u = jnp.asarray(rng.normal(size=(T, NX, NY)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(NX, NY)), jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts):
        ((cur, prev),) = rows
        (c0,) = consts
        r = (cur - prev) + 0.1 * (jnp.roll(cur, -1, 0) - jnp.roll(cur, 1, 1))
        r = jnp.where(it == 0, cur - c0, r)
        return (r,)

    def loss(u, stream):
        (t,) = rowwise_loss_terms(
            row_fn, (u,), consts=(c,), nterms=1, hist=1, interpret=True, stream=stream
        )
        return t

    np.testing.assert_allclose(float(loss(u, False)), float(loss(u, True)), rtol=1e-6)
    g0 = jax.grad(lambda a: loss(a, False))(u)
    g1 = jax.grad(lambda a: loss(a, True))(u)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-6)


def test_mg_fused_kernel_matches_pallas_path():
    """kernel='pallas_mg' (finest multigrid Horner step fused into the
    row-wise kernel, ops/rowwise_mg.py) must match the plain fused kernel's
    loss and gradients to float32 roundoff."""
    from odil_tpu.models import veltracer as vt

    outs = {}
    for kernel in ("pallas", "pallas_mg"):
        problem, state, extra = vt.build(nt=8, nx=16, ny=16, kernel=kernel, multigrid=True)
        loss_fn, arrays = problem.make_loss_fn(state)
        rng = np.random.RandomState(1)
        arrays = [
            jnp.asarray(rng.randn(*np.shape(a)).astype(np.float32) * 0.1) for a in arrays
        ]
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(arrays, {"epoch": 0})
        outs[kernel] = (float(loss), [np.asarray(g) for g in grads])
    l0, g0 = outs["pallas"]
    l1, g1 = outs["pallas_mg"]
    assert abs(l0 - l1) <= 1e-5 * abs(l0), (l0, l1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5 * np.max(np.abs(a)))


def test_mg_kernel_hist2_matches_xla_reference():
    """rowwise_loss_terms_mg with hist=2 (second-order-in-time stencil):
    the VMEM ring of reconstructed rows is 4 deep here and the head/wrap
    residents cover two rows each; loss and grads must match an independent
    XLA re-implementation of the docstring reconstruction formula."""
    from odil_tpu.ops.rowwise_mg import rowwise_loss_terms_mg
    from odil_tpu.transfer import _interp_matrix

    Tc, CX, CY = 5, 8, 8
    T, X, Y = 2 * (Tc - 1) + 1, 2 * CX, 2 * CY
    f0 = 0.7
    rng = np.random.default_rng(3)
    t0 = jnp.asarray(rng.normal(size=(T, X, Y)), jnp.float32)
    P = jnp.asarray(rng.normal(size=(Tc, CX, CY)), jnp.float32)
    Wx = jnp.asarray(_interp_matrix(CX, "c", np.float32))
    Wy = jnp.asarray(_interp_matrix(CY, "c", np.float32))

    def row_fn(it, T_, rows, data_rows, params, consts):
        ((cur, prev, prev2),) = rows
        r = cur - 2 * prev + prev2 + 0.1 * (jnp.roll(cur, -1, 0) - jnp.roll(cur, 1, 1))
        r = jnp.where(it <= 1, cur, r)
        return (r,)

    def loss_kernel(t0, P):
        (t,) = rowwise_loss_terms_mg(
            row_fn, (t0,), (P,), (f0,), nterms=1, hist=2, interpret=True
        )
        return t

    def loss_ref(t0, P):
        w = 0.5 * (jnp.arange(T) % 2).astype(jnp.float32)
        c = (1.0 - w)[:, None, None] * P[jnp.arange(T) // 2] + w[:, None, None] * P[
            jnp.minimum(jnp.arange(T) // 2 + 1, Tc - 1)
        ]
        fine = f0 * t0 + jnp.einsum("xc,tcd,yd->txy", Wx, c, Wy)
        res = []
        for it in range(T):
            rows = ((fine[it], fine[(it - 1) % T], fine[(it - 2) % T]),)
            res.append(row_fn(it, T, rows, (), (), ())[0])
        r = jnp.stack(res)
        return jnp.mean(r * r)

    l0, l1 = float(loss_kernel(t0, P)), float(loss_ref(t0, P))
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    g0 = jax.grad(lambda a, b: loss_kernel(a, b), argnums=(0, 1))(t0, P)
    g1 = jax.grad(lambda a, b: loss_ref(a, b), argnums=(0, 1))(t0, P)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_loss_grad_matches_value_and_grad():
    """Problem.make_loss_grad_fn (one-pass loss+gradients: the backward
    kernel accumulates the loss terms while computing cotangents) must
    match jax.value_and_grad of the loss to roundoff, and must decline
    (return None) when no fused path applies."""
    from odil_tpu.models import veltracer as vt

    problem, state, extra = vt.build(nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True)
    loss_fn, arrays = problem.make_loss_fn(state)
    rng = np.random.RandomState(5)
    arrays = [jnp.asarray(rng.randn(*np.shape(a)).astype(np.float32) * 0.1) for a in arrays]
    (l0, (t0s, n0s)), g0 = jax.value_and_grad(loss_fn, has_aux=True)(arrays, {"epoch": 0})
    lg = problem.make_loss_grad_fn(state)
    assert lg is not None
    (l1, (t1s, n1s)), g1 = lg(arrays, {"epoch": 0})
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(t0s, t1s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7 * np.max(np.abs(np.asarray(a)))
        )

    # No fused path: plain pallas kernel / multigrid off -> None.
    p2, s2, _ = vt.build(nt=8, nx=16, ny=16, kernel="pallas", multigrid=True)
    assert p2.make_loss_grad_fn(s2) is None
    p3, s3, _ = vt.build(nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=False)
    assert p3.make_loss_grad_fn(s3) is None


def test_mg_vmem_gate_declines_large_planes():
    """Planes whose backward working set exceeds VMEM (512^2+) must be
    declined: make_loss_grad_fn returns None (optimizers fall back to
    value_and_grad) and the mg eval operator falls back to the plain fused
    operator, which routes oversized planes to the XLA path -- instead of
    crashing in the Mosaic compiler."""
    from odil_tpu.models.veltracer import _mg_supported
    from odil_tpu.ops.rowwise_mg import MG_VMEM_LIMIT, mg_vmem_estimate

    small = ((9, 256, 256),) * 3
    big = ((9, 512, 512),) * 3
    assert mg_vmem_estimate(small, np.float32, hist=1, nconsts=2) <= MG_VMEM_LIMIT
    assert mg_vmem_estimate(big, np.float32, hist=1, nconsts=2) > MG_VMEM_LIMIT
    assert _mg_supported(small, np.float32)
    assert not _mg_supported(big, np.float32)

    # End to end on a (tiny-t, 512, 512) problem: the fused loss+grad path
    # stays available through the x-tiled mg kernel (rowwise_mg_tiled),
    # and eval works through the fallback chain.
    from odil_tpu.models import veltracer as vt
    from odil_tpu.ops.rowwise_mg_tiled import mg_tiled_supported

    assert mg_tiled_supported(big, np.float32, hist=1) is not None
    # VMEM-model calibration anchors (round 5, measured on the v5e):
    # 512^2 must keep W=128 (compiles, 4.09 ms/iter shipped) and 1024^2
    # must pick W=32 -- W=64's real Mosaic scoped allocation is
    # 19.69 MiB, a compile-time OOM the old model (no resident Wy, no
    # split temporaries) walked into.  2048^2 exceeds the model for any
    # width (the resident Wy alone is 8 MiB) and must decline to the
    # XLA fallback rather than die in the compiler.
    assert mg_tiled_supported(((65, 512, 512),) * 3, np.float32, hist=1)[0] == 128
    assert mg_tiled_supported(((65, 1024, 1024),) * 3, np.float32, hist=1)[0] == 32
    assert mg_tiled_supported(((65, 2048, 2048),) * 3, np.float32, hist=1) is None
    problem, state, extra = vt.build(nt=4, nx=512, ny=512, kernel="pallas_mg", multigrid=True)
    assert problem.make_loss_grad_fn(state) is not None
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    assert np.isfinite(float(loss))


def test_mg_fused_kernel_fallback_without_partials():
    """With multigrid=False there are no partials; the mg operator must fall
    back to the plain fused path and still evaluate."""
    from odil_tpu.models import veltracer as vt

    problem, state, extra = vt.build(nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=False)
    loss, grads, terms, names, norms = problem.eval_loss_grad(state)
    assert np.isfinite(float(loss))


def test_mg_fused_problem_eval_operator_falls_back():
    """eval_operator on an mg_partial Problem flattens fully (no partials)
    and must evaluate through the fallback kernel path."""
    from odil_tpu.models import veltracer as vt

    problem, state, extra = vt.build(nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True)
    values, names = problem.eval_operator(state)
    assert len(values) >= 2 and all(np.isfinite(float(np.asarray(v))) for v in values)


# ---------------------------------------------------------------------------
# x-tiled kernel (ops/rowwise_tiled.py)
# ---------------------------------------------------------------------------


def _tiled_case(T=9, X=16, Y=16, seed=3):
    """A veltracer-shaped case: 3 fields, advection + laplacian regularizer
    residuals (x/y stencil reach 1), two grid consts."""
    rng = np.random.default_rng(seed)
    fields = tuple(
        jnp.asarray(rng.normal(size=(T, X, Y)), jnp.float32) * 0.3 for _ in range(3)
    )
    consts = tuple(jnp.asarray(rng.normal(size=(X, Y)), jnp.float32) for _ in range(2))

    def row_fn(it, T_, rows, data_rows, params, consts_v):
        (u_r, vx_r, vy_r) = rows
        u0, u1 = consts_v
        ucur, uprev = u_r
        vxc, _ = vx_r
        vyc, vyp = vy_r
        dux = (jnp.roll(uprev, -1, 0) - jnp.roll(uprev, 1, 0)) * 0.5
        duy = (jnp.roll(uprev, -1, 1) - jnp.roll(uprev, 1, 1)) * 0.5
        r1 = (ucur - uprev) + vxc * dux + vyc * duy
        r1 = jnp.where(it == 0, ucur - u0, r1)
        r2 = jnp.where(it == T_ - 1, ucur - u1, 0.0)
        lap = (
            jnp.roll(vxc, -1, 0) - 2 * vxc + jnp.roll(vxc, 1, 0)
            + jnp.roll(vxc, -1, 1) - 2 * vxc + jnp.roll(vxc, 1, 1)
        )
        r3 = 0.1 * lap
        r4 = jnp.where(it == 0, 0.0, vyc - vyp)
        return (r1, r2, r3, r4)

    return fields, consts, row_fn, 4


@pytest.mark.parametrize("tile", [8, 16])
def test_tiled_matches_untiled(tile):
    """The x-tiled kernel (including the nxt=1 degenerate tile=X case) must
    reproduce the untiled kernel's loss terms and gradients, edge-cotangent
    folding and periodic x-wrap included."""
    from odil_tpu.ops.rowwise_tiled import rowwise_loss_terms_tiled

    fields, consts, row_fn, nterms = _tiled_case()

    def loss_ref(*fs):
        ts = rowwise_loss_terms(
            row_fn, fs, consts=consts, nterms=nterms, hist=1, interpret=True
        )
        return sum(ts), tuple(ts)

    def loss_tiled(*fs):
        ts = rowwise_loss_terms_tiled(
            row_fn, fs, consts=consts, nterms=nterms, hist=1, halox=1,
            tile=tile, interpret=True,
        )
        return sum(ts), tuple(ts)

    (l0, t0), g0 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2), has_aux=True)(*fields)
    (l1, t1), g1 = jax.value_and_grad(loss_tiled, argnums=(0, 1, 2), has_aux=True)(*fields)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(t0, t1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_tiled_hist2():
    """hist=2 stencils (second-order in time) through the tiled kernel."""
    from odil_tpu.ops.rowwise_tiled import rowwise_loss_terms_tiled

    rng = np.random.default_rng(7)
    T, X, Y = 8, 16, 16
    u = jnp.asarray(rng.normal(size=(T, X, Y)), jnp.float32)

    def row_fn(it, T_, rows, data_rows, params, consts_v):
        ((cur, prev, prev2),) = rows
        lap = jnp.roll(cur, -1, 0) - 2 * cur + jnp.roll(cur, 1, 0)
        r = (cur - 2 * prev + prev2) - 0.1 * lap
        r = jnp.where((it == 0) | (it == 1), 0.0, r)
        return (r,)

    def loss_ref(u):
        (t,) = rowwise_loss_terms(row_fn, (u,), nterms=1, hist=2, interpret=True)
        return t

    def loss_tiled(u):
        (t,) = rowwise_loss_terms_tiled(
            row_fn, (u,), nterms=1, hist=2, halox=1, tile=8, interpret=True
        )
        return t

    np.testing.assert_allclose(float(loss_ref(u)), float(loss_tiled(u)), rtol=1e-6)
    g0 = jax.grad(loss_ref)(u)
    g1 = jax.grad(loss_tiled)(u)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-6)


def test_tiled_autoroute_shapes():
    """pick_tile splits oversized planes and the wrapper routes to the tiled
    kernel only on TPU (on CPU the XLA fallback keeps running)."""
    from odil_tpu.ops.rowwise_tiled import pick_tile, tiled_vmem_estimate

    W = pick_tile(512, 512, 4, nf=3, nd=0, nc=2, hist=1)
    assert W is not None and W < 512 and 512 % W == 0
    assert tiled_vmem_estimate(W, 512, 4, 3, 0, 2, 1) <= 10 * 1024 * 1024
    assert pick_tile(256, 256, 4, nf=3, nd=0, nc=2, hist=1) == 256  # fits whole


def test_mg_tiled_matches_untiled():
    """The x-tiled MG-fused one-pass loss+grad kernel must reproduce the
    untiled mg kernel's terms and gradients (tile forced at a size the
    router would keep untiled), edge and coarse-window folds included."""
    from odil_tpu.ops.rowwise_mg import rowwise_mg_loss_and_grads
    from odil_tpu.ops.rowwise_mg_tiled import rowwise_mg_tiled_loss_and_grads

    rng = np.random.default_rng(11)
    T, X, Y = 9, 64, 64
    Tc, CX, CY = 5, 32, 32
    nf = 3
    t0s = tuple(jnp.asarray(rng.normal(size=(T, X, Y)), jnp.float32) * 0.3 for _ in range(nf))
    coarse = tuple(jnp.asarray(rng.normal(size=(Tc, CX, CY)), jnp.float32) * 0.3 for _ in range(nf))
    consts = tuple(jnp.asarray(rng.normal(size=(X, Y)), jnp.float32) for _ in range(2))
    factors0 = (0.7, 1.1, 0.9)

    def row_fn(it, T_, rows, data_rows, params, consts_v):
        (u_r, vx_r, vy_r) = rows
        u0, u1 = consts_v
        ucur, uprev = u_r
        vxc, _ = vx_r
        vyc, vyp = vy_r
        dux = (jnp.roll(uprev, -1, 0) - jnp.roll(uprev, 1, 0)) * 0.5
        duy = (jnp.roll(uprev, -1, 1) - jnp.roll(uprev, 1, 1)) * 0.5
        r1 = (ucur - uprev) + vxc * dux + vyc * duy
        r1 = jnp.where(it == 0, ucur - u0, r1)
        r2 = jnp.where(it == T_ - 1, ucur - u1, 0.0)
        lap = (
            jnp.roll(vxc, -1, 0) - 2 * vxc + jnp.roll(vxc, 1, 0)
            + jnp.roll(vxc, -1, 1) - 2 * vxc + jnp.roll(vxc, 1, 1)
        )
        r3 = 0.1 * lap
        r4 = jnp.where(it == 0, 0.0, vyc - vyp)
        return (r1, r2, r3, r4)

    t_ref, (dt0_ref, dc_ref, _) = rowwise_mg_loss_and_grads(
        row_fn, t0s=t0s, coarse=coarse, factors0=factors0, consts=consts,
        nterms=4, hist=1,
    )
    t_til, (dt0_til, dc_til, _) = rowwise_mg_tiled_loss_and_grads(
        row_fn, t0s=t0s, coarse=coarse, factors0=factors0, consts=consts,
        nterms=4, hist=1, tile_cfg=(32, 1, 2),
    )
    for a, b in zip(t_ref, t_til):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    for a, b in zip(dt0_ref, dt0_til):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    for a, b in zip(dc_ref, dc_til):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_two_level_fusion_exact_when_requested():
    """Two-level fusion (partial_depth 2: the level-1 Horner step also in
    VMEM) is off by default (measured ~4% slower on the flagship bench)
    but must stay exact when an operator requests it: the prologue's
    partial tuples carry (t0, f0, t1, f1, P2) and the one-pass gradients
    match autodiff."""
    from odil_tpu.models import veltracer as vt
    from odil_tpu.models.veltracer import _mg_partial_depth

    assert _mg_partial_depth(((9, 16, 16),) * 3, np.float32) == 1  # default off

    problem, state, extra = vt.build(nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True)
    problem._capture_structure(state)
    arrays = problem.domain.arrays_from_state(state)
    probe = {}
    problem._flatten_multigrid_batched(
        problem.state_from_arrays(arrays), partial_out=probe, partial_depth=2
    )
    assert probe and all(len(v) == 5 for v in probe.values())
    t0, f0, t1, f1, P2 = next(iter(probe.values()))
    assert t0.shape[0] == 2 * (t1.shape[0] - 1) + 1
    assert t1.shape[0] == 2 * (P2.shape[0] - 1) + 1

    # Force depth 2 through the full one-pass path and match autodiff.
    old = vt._mg_loss_and_grads.partial_depth
    try:
        vt._mg_loss_and_grads.partial_depth = lambda *a: 2
        loss_fn, arrays = problem.make_loss_fn(state)
        rng = np.random.RandomState(13)
        arrays = [jnp.asarray(rng.randn(*np.shape(a)).astype(np.float32) * 0.1) for a in arrays]
        lg = problem.make_loss_grad_fn(state)
        assert lg is not None
        (l1, _), g1 = lg(arrays, {"epoch": 0})
        (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(arrays, {"epoch": 0})
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5,
                atol=1e-6 * np.max(np.abs(np.asarray(a))),
            )
    finally:
        vt._mg_loss_and_grads.partial_depth = old


def test_two_level_request_degrades_at_nlvl2():
    """A two-level-capable operator on a 2-level hierarchy must fall back
    to single-level partials and still match autodiff."""
    from odil_tpu.models import veltracer as vt

    problem, state, extra = vt.build(
        nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True, mg_nlvl=2
    )
    loss_fn, arrays = problem.make_loss_fn(state)
    rng = np.random.RandomState(9)
    arrays = [jnp.asarray(rng.randn(*np.shape(a)).astype(np.float32) * 0.1) for a in arrays]
    lg = problem.make_loss_grad_fn(state)
    assert lg is not None
    (l1, _), g1 = lg(arrays, {"epoch": 0})
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(arrays, {"epoch": 0})
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7 * np.max(np.abs(np.asarray(a)))
        )


@pytest.mark.parametrize(
    "model,kernel,kw",
    [
        ("veltracer", "pallas", dict(nt=16, nx=16, ny=16, multigrid=False)),
        ("veltracer", "pallas_mg", dict(nt=16, nx=16, ny=16, multigrid=True)),
        ("heat", "pallas", dict(nt=16, nx=16, multigrid=False, infer_k=True,
                                imposed="random", nimp=20, kxreg=0.01, ktreg=0.01)),
        ("wave", "pallas", dict(nt=16, nx=16, multigrid=False)),
    ],
)
def test_kernel_operator_random_state_parity(model, kernel, kw):
    """Fused-kernel operators must match the XLA operators on RANDOM states
    (loss, every term, every gradient).  Zero-state comparisons are blind to
    row-placement bugs: a boundary term masked at the wrong row has the
    same value when the field is uniform (this caught the fused veltracer
    imposing the final tracer at node T-1 instead of the reference's
    T-2, examples/velocity_from_tracer/veltracer.py:41,112)."""
    import importlib

    mod = importlib.import_module(f"odil_tpu.models.{model}")
    runs = {}
    for k in ("xla", kernel):
        problem, state, _ = mod.build(kernel=k, dtype=np.float32, **kw)
        rnd = np.random.RandomState(5)
        arrays = problem.domain.arrays_from_state(state)
        arrays = [problem.domain.cast(0.1 * rnd.standard_normal(np.shape(a))) for a in arrays]
        problem.domain.arrays_to_state(arrays, state)
        loss, grads, terms, names, norms = problem.eval_loss_grad(state)
        runs[k] = (
            float(np.asarray(loss)),
            [np.asarray(t) for t in terms],
            [np.asarray(g) for g in grads],
        )
    (l0, t0, g0), (l1, t1, g1) = runs["xla"], runs[kernel]
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(t0, t1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * max(1.0, np.max(np.abs(a))))


def test_tiled_sums_xpad_whole_consts():
    """The halo-composition extras of the tiled kernel: per-term SUMS
    (_sums=True), a non-tileable x extent edge-padded under the masked-edge
    contract (xpad), a whole-streamed non-plane const ((1, 2) metadata), and
    a tiled plane const -- vs the plain kernel's interpret-mode sums."""
    from odil_tpu.ops.rowwise import rowwise_loss_sums
    from odil_tpu.ops.rowwise_tiled import rowwise_loss_terms_tiled

    rng = np.random.default_rng(11)
    T, X, Y = 6, 18, 16  # X = 18: no power-of-two tile divides it.
    fields = tuple(
        jnp.asarray(rng.normal(size=(T, X, Y)), jnp.float32) * 0.3 for _ in range(2)
    )
    # Masked-edge contract: residuals within halox=1 of either x end vanish.
    xm = np.ones((X, Y), np.float32)
    xm[0] = 0.0
    xm[-1] = 0.0
    cmask = jnp.asarray(xm)
    cmeta = jnp.asarray([[0.7, 1.3]], jnp.float32)  # whole-streamed (1, 2)

    def row_fn(it, T_, rows, data_rows, params, consts_v):
        (u_r, v_r) = rows
        m, meta = consts_v
        ucur, uprev = u_r
        vcur, _ = v_r
        dux = (jnp.roll(uprev, -1, 0) - jnp.roll(uprev, 1, 0)) * 0.5
        r1 = ((ucur - uprev) + vcur * dux) * m * meta[0, 0]
        r2 = jnp.where(it == 0, ucur * meta[0, 1], 0.0) * m
        return (r1, r2)

    def loss_ref(*fs):
        ts = rowwise_loss_sums(
            row_fn, fs, consts=(cmask, cmeta), nterms=2, hist=1, interpret=True
        )
        return sum(ts), tuple(ts)

    def loss_tiled(*fs):
        ts = rowwise_loss_terms_tiled(
            row_fn, fs, consts=(cmask, cmeta), nterms=2, hist=1, halox=1,
            tile=8, xpad=24, _sums=True,
        )
        return sum(ts), tuple(ts)

    (l0, t0), g0 = jax.value_and_grad(loss_ref, argnums=(0, 1), has_aux=True)(*fields)
    (l1, t1), g1 = jax.value_and_grad(loss_tiled, argnums=(0, 1), has_aux=True)(*fields)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(t0, t1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_tiled_onepass_matches_value_and_grad():
    """The tiled one-pass (backward-with-sums) must reproduce
    jax.value_and_grad of the plain kernel's loss: sums and all field
    cotangents, including the edge folds and the periodic x wrap."""
    from odil_tpu.ops.rowwise_tiled import rowwise_loss_and_grads_tiled

    fields, consts, row_fn, nterms = _tiled_case()
    T, X, Y = fields[0].shape
    gscale = 1.0 / (T * X * Y)

    def loss(*fs):
        ts = rowwise_loss_terms(
            row_fn, fs, consts=consts, nterms=nterms, hist=1, interpret=True
        )
        return sum(ts)

    l0, g0 = jax.value_and_grad(loss, argnums=(0, 1, 2))(*fields)
    sums, dfields, dparams = rowwise_loss_and_grads_tiled(
        row_fn, fields, consts=consts, nterms=nterms, hist=1, halox=1,
        tile=8, gscale=gscale,
    )
    assert dparams == ()
    np.testing.assert_allclose(float(sum(sums)) * gscale, float(l0), rtol=1e-6)
    for a, b in zip(g0, dfields):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_tiled_onepass_xpad():
    """The tiled one-pass with an edge-padded non-tileable x extent under
    the masked-edge contract: sums and cotangents match value_and_grad of
    the un-padded sums, pad-region cotangents discarded as exact zeros."""
    from odil_tpu.ops.rowwise import rowwise_loss_sums
    from odil_tpu.ops.rowwise_tiled import rowwise_loss_and_grads_tiled

    rng = np.random.default_rng(13)
    T, X, Y = 6, 18, 16
    fields = tuple(
        jnp.asarray(rng.normal(size=(T, X, Y)), jnp.float32) * 0.3 for _ in range(2)
    )
    xm = np.ones((X, Y), np.float32)
    xm[0] = 0.0
    xm[-1] = 0.0
    cmask = jnp.asarray(xm)

    def row_fn(it, T_, rows, data_rows, params, consts_v):
        (u_r, v_r) = rows
        (m,) = consts_v
        ucur, uprev = u_r
        vcur, _ = v_r
        dux = (jnp.roll(uprev, -1, 0) - jnp.roll(uprev, 1, 0)) * 0.5
        r1 = ((ucur - uprev) + vcur * dux) * m
        r2 = jnp.where(it == 0, ucur, 0.0) * m
        return (r1, r2)

    def loss(*fs):
        ts = rowwise_loss_sums(
            row_fn, fs, consts=(cmask,), nterms=2, hist=1, interpret=True
        )
        return 0.25 * sum(ts)

    l0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(*fields)
    sums, dfields, dparams = rowwise_loss_and_grads_tiled(
        row_fn, fields, consts=(cmask,), nterms=2, hist=1, halox=1,
        tile=8, xpad=24, gscale=0.25,
    )
    np.testing.assert_allclose(0.25 * float(sum(sums)), float(l0), rtol=1e-6)
    for a, b in zip(g0, dfields):
        assert b.shape == (T, X, Y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_hand_row_vjp_matches_autodiff(monkeypatch):
    """The opt-in closed-form adjoint of the flagship row function
    (veltracer._make_row_vjp, consumed via the row_fn.vjp hook when
    ODIL_ROW_VJP=hand): (a) cotangents match jax.vjp of the row function
    to fp32 roundoff at every special row and flag combination; (b) the
    full fused loss+grad route with the hook engaged matches the
    autodiff default to the same tolerance."""
    import jax.numpy as jnp

    from odil_tpu.models import veltracer as vt

    dt, dx, dy = 0.017, 0.01, 0.012
    T = 9
    rng = np.random.RandomState(0)
    shape = (16, 16)
    rows = tuple(
        tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(2))
        for _ in range(3)
    )
    consts = tuple(
        jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(2)
    )
    flat = tuple(rows[f][m] for f in range(3) for m in range(2))
    for kxreg, ktreg in [(1e-3, 2e-3), (0.0, 0.0), (1e-3, 0.0), (0.0, 2e-3)]:
        rf = vt._make_row_fn(jnp, dt, dx, dy, 1.3, kxreg, ktreg)
        rv = vt._make_row_vjp(jnp, dt, dx, dy, 1.3, kxreg, ktreg)
        nterms = 2 + (2 if kxreg else 0) + (2 if ktreg else 0)
        for it in [0, 1, 2, 5, T - 2, T - 1]:
            def f(*fl):
                rws = ((fl[0], fl[1]), (fl[2], fl[3]), (fl[4], fl[5]))
                return tuple(rf(it, T, rws, (), (), consts))

            res, vjp = jax.vjp(f, *flat)
            cots = tuple(
                jnp.asarray(rng.standard_normal(shape), jnp.float32)
                for _ in range(nterms)
            )
            want = vjp(cots)
            got, dpar = rv(it, T, rows, (), (), consts, cots)
            assert dpar == ()
            for a, b in zip(want, got):
                a, b = np.asarray(a), np.asarray(b)
                scale = max(1.0, float(np.max(np.abs(a))))
                np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6 * scale)

    def run(env):
        if env:
            monkeypatch.setenv("ODIL_ROW_VJP", env)
        else:
            monkeypatch.delenv("ODIL_ROW_VJP", raising=False)
        problem, state, _ = vt.build(
            nt=8, nx=16, ny=16, kernel="pallas_mg", multigrid=True,
            dtype=np.float32,
        )
        fn = problem.make_loss_grad_fn(state, interpret=True)
        assert fn is not None
        _, arrays = problem.make_loss_fn(state)
        r2 = np.random.RandomState(3)
        arrays = [
            jnp.asarray(0.1 * r2.standard_normal(a.shape), jnp.float32)
            for a in arrays
        ]
        (loss, _), grads = jax.jit(fn)(arrays, problem.tracers)
        return float(loss), [np.asarray(g) for g in grads]

    l_auto, g_auto = run("")
    l_hand, g_hand = run("hand")
    np.testing.assert_allclose(l_hand, l_auto, rtol=1e-6)
    for a, b in zip(g_auto, g_hand):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
