"""Elementwise activations with exact PyTorch semantics.

These replace the reference's nn.Hardswish/Hardsigmoid/ReLU/LeakyReLU/SiLU
(used throughout mobilenet.py, movinet.py, mobilevit.py). All are cheap VPU
ops on TPU and fuse into neighboring convs under XLA — no kernels needed.
"""

import jax
import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.clip(x, 0, 6)


def leaky_relu(x, negative_slope: float = 0.01):
    # torch nn.LeakyReLU default slope (reference mobilenet.py:228)
    return jnp.where(x >= 0, x, negative_slope * x)


def hardsigmoid(x):
    # torch nn.Hardsigmoid: relu6(x + 3) / 6
    return relu6(x + 3.0) * (1.0 / 6.0)


def hardswish(x):
    # torch nn.Hardswish: x * relu6(x + 3) / 6
    return x * (relu6(x + 3.0) * (1.0 / 6.0))


def silu(x):
    return x * jax.nn.sigmoid(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def identity(x):
    return x


ACTIVATIONS = {
    "relu": relu,
    "relu6": relu6,
    "leaky_relu": leaky_relu,
    "hardsigmoid": hardsigmoid,
    "hardswish": hardswish,
    "silu": silu,
    "sigmoid": sigmoid,
    "identity": identity,
}


def get(name: str):
    return ACTIVATIONS[name]
