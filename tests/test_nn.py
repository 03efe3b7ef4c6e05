"""Neural-net module: initializer scales, pointwise grid evaluation,
activation/transform plumbing, frozen parameters."""

import jax
import numpy as np
import pytest

import odil_tpu as odil
from odil_tpu.nn import eval_neural_net, make_neural_net
from odil_tpu.runtime import mod


def test_shapes_and_broadcast():
    net = make_neural_net([2, 5, 3], np.float64, mod)
    assert [w.shape for w in net.weights] == [(5, 2), (3, 5)]
    assert [b.shape for b in net.biases] == [(5,), (3,)]
    x = np.random.rand(4, 6)
    y = np.random.rand(4, 6)
    outs = eval_neural_net(net, [x, y], mod)
    assert len(outs) == 3
    assert outs[0].shape == (4, 6)


def test_pointwise_consistency():
    """Grid evaluation equals per-point evaluation."""
    net = make_neural_net([2, 4, 1], np.float64, mod)
    x = np.random.rand(3, 2)
    y = np.random.rand(3, 2)
    grid = np.asarray(eval_neural_net(net, [x, y], mod)[0])
    for i in range(3):
        for j in range(2):
            single = np.asarray(eval_neural_net(net, [x[i, j : j + 1], y[i, j : j + 1]], mod)[0])
            np.testing.assert_allclose(grid[i, j], single[0], rtol=1e-12)


def test_linear_activation_is_affine():
    net = make_neural_net([2, 2], np.float64, mod, activation="none")
    x = np.array([1.0, 2.0])
    y = np.array([0.5, -1.0])
    out = np.stack([np.asarray(o) for o in eval_neural_net(net, [x, y], mod)])
    W = np.asarray(net.weights[0])
    expect = W @ np.stack([x, y])
    np.testing.assert_allclose(out, expect, rtol=1e-12)


@pytest.mark.parametrize("init", ["legacy", "glorot", "lecun", "he"])
def test_initializer_scale(init):
    mod.random.set_seed(0)
    net = make_neural_net([100, 50], np.float64, mod, initializer=init)
    scale = {
        "legacy": np.sqrt(1 / 100),
        "glorot": np.sqrt(6 / 150),
        "lecun": np.sqrt(3 / 100),
        "he": np.sqrt(6 / 100),
    }[init]
    w = np.asarray(net.weights[0])
    assert np.abs(w).max() <= scale + 1e-12
    assert np.abs(w).max() > scale * 0.8


def test_func_in_out():
    net = make_neural_net(
        [1, 3, 1],
        np.float64,
        mod,
        func_in=lambda x: [x * 2],
        func_out=lambda y: [y + 1],
    )
    x = np.array([0.3])
    direct = eval_neural_net(
        odil.NeuralNet(net.weights, net.biases, activation=net.activation), [x * 2], mod
    )[0]
    wrapped = eval_neural_net(net, [x], mod)[0]
    np.testing.assert_allclose(np.asarray(wrapped), np.asarray(direct) + 1, rtol=1e-12)


def test_frozen_blocks_param_gradient():
    net = make_neural_net([1, 3, 1], np.float64, mod)

    def loss(params, frozen):
        n = odil.NeuralNet(params[:2], params[2:], activation="tanh")
        out = eval_neural_net(n, [np.array([0.5])], mod, frozen=frozen)[0]
        return out.sum()

    params = list(net.weights) + list(net.biases)
    g_live = jax.grad(lambda p: loss(p, False))(params)
    g_frozen = jax.grad(lambda p: loss(p, True))(params)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in g_live)
    assert all(float(np.abs(np.asarray(g)).max()) == 0 for g in g_frozen)
