"""Weight initializers matching PyTorch's schemes — host-side numpy.

Initialization runs ONCE on the host: initializers take an integer seed and
return numpy arrays (a counter-based Philox generator keyed on the seed).
This is a deliberate TPU-first choice: doing init with jax.random would
either dispatch hundreds of tiny ops to the device (pathological over a
remote-device tunnel) or force an expensive one-off XLA compile of the whole
init graph; numpy gives deterministic params instantly, which then transfer
to the device/mesh in one device_put.

The reference relies on torch's *default* layer init almost everywhere — its
MobileNet ``initialize_weights`` checks a nonexistent ``module.nonlinearity``
attribute and is a no-op (reference mobilenet.py:203-210), so the effective
init is torch's default kaiming-uniform(a=√5) + uniform bias. MoViNet uses a
real kaiming/xavier scheme (movinet.py:167-179) and MobileViT uses
normal(0, 0.02) (mobilevit.py:207-215). We reproduce each *effective* scheme
so from-scratch training matches the reference's dynamics.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np

Initializer = Callable[[int, Sequence[int]], np.ndarray]


def _gen(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(seed & 0xFFFFFFFF))


def _fan_in_out(shape: Sequence[int], fan_axes: str = "auto"):
    """Fan for conv weights in our (k..., I, O) layout or dense (I, O)."""
    if len(shape) < 2:
        return int(shape[0]), int(shape[0])
    receptive = 1
    for d in shape[:-2]:
        receptive *= int(d)
    fan_in = int(shape[-2]) * receptive
    fan_out = int(shape[-1]) * receptive
    return fan_in, fan_out


def kaiming_uniform(a: float = math.sqrt(5.0), mode: str = "fan_in",
                    nonlinearity: str = "leaky_relu") -> Initializer:
    """torch.nn.init.kaiming_uniform_. With a=√5 this is torch's default
    conv/linear weight init."""

    def init(key, shape, dtype=np.float32):
        fan_in, fan_out = _fan_in_out(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        if nonlinearity == "relu":
            gain = math.sqrt(2.0)
        elif nonlinearity == "leaky_relu":
            gain = math.sqrt(2.0 / (1 + a * a))
        else:
            gain = 1.0
        bound = gain * math.sqrt(3.0 / fan)
        return _gen(key).uniform(-bound, bound, shape).astype(dtype)

    return init


def kaiming_normal(mode: str = "fan_out",
                   nonlinearity: str = "relu") -> Initializer:
    def init(key, shape, dtype=np.float32):
        fan_in, fan_out = _fan_in_out(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        gain = math.sqrt(2.0) if nonlinearity == "relu" else 1.0
        std = gain / math.sqrt(fan)
        return (std * _gen(key).standard_normal(shape)).astype(dtype)

    return init


def xavier_uniform() -> Initializer:
    def init(key, shape, dtype=np.float32):
        fan_in, fan_out = _fan_in_out(shape)
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return _gen(key).uniform(-bound, bound, shape).astype(dtype)

    return init


def normal(std: float = 0.02, mean: float = 0.0) -> Initializer:
    def init(key, shape, dtype=np.float32):
        return (mean + std * _gen(key).standard_normal(shape)).astype(dtype)

    return init


def torch_default_bias(fan_in: int) -> Initializer:
    """torch default bias: U(-1/√fan_in, 1/√fan_in)."""

    def init(key, shape, dtype=np.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return _gen(key).uniform(-bound, bound, shape).astype(dtype)

    return init


def zeros() -> Initializer:
    return lambda key, shape, dtype=np.float32: np.zeros(shape, dtype)


def ones() -> Initializer:
    return lambda key, shape, dtype=np.float32: np.ones(shape, dtype)


def uniform(low: float, high: float) -> Initializer:
    return lambda key, shape, dtype=np.float32: _gen(key).uniform(
        low, high, shape).astype(dtype)


def reinit_normal_002(params, seed: int):
    """The MobileViT-family init (reference mobilevit.py:207-215,
    mobilevitv2.py:307-314): EVERY conv/linear weight ~ N(0, 0.02²), biases
    zeroed, norm scale/bias untouched. Applied tree-wide to a params pytree
    (weight leaves are named w/w1/w2, bias leaves b/b1/b2 by convention)."""
    import zlib

    from picklebot_tpu.core.module import flatten_dict, unflatten_dict
    out = {}
    for path, leaf in flatten_dict(params).items():
        name = path.rsplit(".", 1)[-1]
        if name in ("w", "w1", "w2"):
            sub = zlib.crc32(path.encode(), seed & 0xFFFFFFFF) & 0xFFFFFFFF
            out[path] = (0.02 * _gen(sub).standard_normal(leaf.shape)
                         ).astype(np.float32)
        elif name in ("b", "b1", "b2"):
            out[path] = np.zeros_like(leaf)
        else:
            out[path] = leaf
    return unflatten_dict(out)
