"""Squeeze-and-Excitation blocks (channels-last).

Replaces reference SEBlock3D/SEBlock2D (mobilenet.py:11-44): global average
pool → 1x1 conv C→C/4 → ReLU → 1x1 conv C/4→C → Hardsigmoid → channel scale.
The 1x1 convs on a pooled (B, 1..1, C) tensor are just dense layers; we fold
the pool + two matmuls + scale into plain jnp ops that XLA fuses into one
reduction + one small matmul chain (a fused Pallas variant is unnecessary —
this is bandwidth-trivial next to the surrounding depthwise conv).

Parameters keep conv-shaped weights so torch checkpoints convert 1:1
(torch keys se.1.weight / se.3.weight).
"""

from __future__ import annotations

import jax.numpy as jnp

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module
from picklebot_tpu.ops.activations import hardsigmoid, relu


class SEBlock(Module):
    """Rank-agnostic SE over (B, *spatial, C)."""

    def __init__(self, channels: int, reduction: int = 4):
        super().__init__()
        self.channels = channels
        self.reduced = channels // reduction
        self.w1_init = pinit.kaiming_uniform()
        self.b1_init = pinit.torch_default_bias(channels)
        self.w2_init = pinit.kaiming_uniform()
        self.b2_init = pinit.torch_default_bias(self.reduced)

    def param_spec(self):
        c, r = self.channels, self.reduced
        return {
            # stored (in, out) like Dense; converter squeezes torch's
            # (out, in, 1, 1[,1]) conv weights.
            "w1": lambda k: self.w1_init(k, (c, r)),
            "b1": lambda k: self.b1_init(k, (r,)),
            "w2": lambda k: self.w2_init(k, (r, c)),
            "b2": lambda k: self.b2_init(k, (c,)),
        }

    def forward(self, cx: Ctx, x):
        dtype = cx.policy.compute_dtype
        axes = tuple(range(1, x.ndim - 1))
        # squeeze: global average pool (f32 accumulate)
        s = jnp.mean(x.astype(jnp.float32), axis=axes).astype(dtype)  # (B, C)
        s = relu(jnp.dot(s, cx.param("w1").astype(dtype))
                 + cx.param("b1").astype(dtype))
        s = hardsigmoid(jnp.dot(s, cx.param("w2").astype(dtype))
                        + cx.param("b2").astype(dtype))
        # excite: broadcast channel scale
        s = s.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))
        return (x.astype(dtype) * s).astype(dtype)
