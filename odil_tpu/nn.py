"""Fully-connected neural nets evaluated over grid-shaped inputs.

Spec from the reference (``src/odil/core.py:779-862``): weights are
``(n_out, n_in)`` matrices, biases length ``n_out``; evaluation maps a list
of equally-shaped input arrays to a list of equally-shaped outputs by
applying the MLP pointwise.  Initializers: lecun / glorot / he / legacy.
"""

import numpy as np

from .fields import NeuralNet

__all__ = ["make_neural_net", "eval_neural_net"]

_INIT_SCALES = {
    "legacy": lambda ni, no: np.sqrt(1.0 / ni),
    "glorot": lambda ni, no: np.sqrt(6.0 / (ni + no)),
    "lecun": lambda ni, no: np.sqrt(3.0 / ni),
    "he": lambda ni, no: np.sqrt(6.0 / ni),
}


def make_neural_net(layers, dtype, mod, initializer="lecun", func_in=None, func_out=None, activation=None):
    """Creates a NeuralNet with uniform random weights and zero biases.

    layers: neuron counts per layer, e.g. [2, 10, 10, 1].
    """
    if initializer not in _INIT_SCALES:
        raise ValueError(f"Unknown initializer='{initializer}'")
    scale_of = _INIT_SCALES[initializer]
    weights, biases = [], []
    for ni, no in zip(layers[:-1], layers[1:]):
        s = scale_of(ni, no)
        weights.append(mod.random.uniform(shape=(no, ni), minval=-s, maxval=s, dtype=dtype))
        biases.append(mod.zeros(no, dtype=dtype))
    return NeuralNet(weights, biases, func_in=func_in, func_out=func_out, activation=activation)


def eval_neural_net(net, inputs, mod, frozen=False):
    """Evaluates `net` pointwise over a list of equally-shaped input arrays.

    Returns a list of output arrays with the input shape.  With
    ``frozen=True`` the parameters are wrapped in ``stop_gradient``.
    """
    weights = net.weights
    biases = net.biases
    if len(weights) != len(biases):
        raise ValueError("Weights and biases do not match")
    if weights[0].shape[1] != len(inputs):
        raise ValueError(
            f"Network expects {weights[0].shape[1]} inputs, got {len(inputs)}"
        )
    if frozen:
        weights = [mod.stop_gradient(w) for w in weights]
        biases = [mod.stop_gradient(b) for b in biases]

    act = {"tanh": mod.tanh, "relu": mod.relu, "none": lambda x: x}[net.activation]

    if net.func_in is not None:
        inputs = net.func_in(*inputs)
    # Feature axis last: h has shape (*grid, n_in).
    h = mod.stack(list(inputs), axis=-1)
    nlayers = len(weights)
    for i, (w, b) in enumerate(zip(weights, biases)):
        # (*grid, ni) x (no, ni)^T -> (*grid, no)
        h = mod.einsum("...i,oi->...o", h, w) + b
        if i < nlayers - 1:
            h = act(h)
    outputs = [h[..., i] for i in range(h.shape[-1])]
    if net.func_out is not None:
        outputs = net.func_out(*outputs)
    return outputs
