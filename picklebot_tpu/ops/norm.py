"""Normalization layers with exact PyTorch numerics, channels-last.

BatchNorm replaces the reference's nn.BatchNorm3d/2d/1d (everywhere in the
model zoo). Matching torch matters for checkpoint logit-parity:
  * training normalizes with the *biased* batch variance,
  * running_var is updated with the *unbiased* variance,
  * running = (1 - momentum) * running + momentum * batch,  momentum=0.1,
  * statistics are computed in float32 even under bf16 compute (this is also
    what torch.amp autocast does on the reference path, train.py:263-265).

Under data parallelism the reference's DDP keeps *per-replica* batch stats
(no SyncBN). Our shard_map training step does the same for normalization, and
cross-replica-averages only the running statistics so the replicated-state
invariant holds (documented divergence: the reference saves rank 0's stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from picklebot_tpu.core.module import Ctx, Module


class BatchNorm(Module):
    """Channels-last batch norm over all axes but the last.

    Works for (B, C), (B, H, W, C), (B, T, H, W, C) — replacing torch
    BatchNorm1d/2d/3d respectively.
    """

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1, affine: bool = True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.affine = affine

    def param_spec(self):
        if not self.affine:
            return {}
        return {
            "scale": lambda k: np.ones((self.num_features,), np.float32),
            "bias": lambda k: np.zeros((self.num_features,), np.float32),
        }

    def state_spec(self):
        return {
            "mean": lambda: np.zeros((self.num_features,), np.float32),
            "var": lambda: np.ones((self.num_features,), np.float32),
        }

    def forward(self, cx: Ctx, x):
        orig_dtype = x.dtype
        axes = tuple(range(x.ndim - 1))
        if cx.train:
            # statistics in f32 (two fused reduction passes); torch reduces
            # in f32 under autocast too
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)  # biased, used for normalization
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            cx.put_state("mean", (1 - m) * cx.get_state("mean") + m * mean)
            cx.put_state("var", (1 - m) * cx.get_state("var") + m * unbiased)
        else:
            mean = cx.get_state("mean")
            var = cx.get_state("var")
        # fold (mean, var, scale, bias) into one per-channel multiply-add in
        # f32 (C-sized, free), then apply in the activation dtype — a single
        # fusable elementwise op instead of materializing f32 activations
        # (this halved the train step's HBM traffic on v5e).
        inv = jax.lax.rsqrt(var + self.eps)
        if self.affine:
            a = inv * cx.param("scale")
            b = cx.param("bias") - mean * a
        else:
            a = inv
            b = -mean * inv
        return (x * a.astype(orig_dtype) + b.astype(orig_dtype)
                ).astype(orig_dtype)


class LayerNorm(Module):
    """torch nn.LayerNorm over the last dimension (optionally affine).

    MobileViT's attention uses elementwise_affine=False
    (reference mobilevit.py:53)."""

    def __init__(self, num_features: int, eps: float = 1e-5,
                 affine: bool = True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.affine = affine

    def param_spec(self):
        if not self.affine:
            return {}
        return {
            "scale": lambda k: np.ones((self.num_features,), np.float32),
            "bias": lambda k: np.zeros((self.num_features,), np.float32),
        }

    def forward(self, cx: Ctx, x):
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            out = out * cx.param("scale") + cx.param("bias")
        return out.astype(orig_dtype)


class GroupNorm(Module):
    """torch nn.GroupNorm for channels-last inputs (B, *spatial, C).

    Normalizes per sample over (spatial, C/G). MobileViTV2 uses
    GroupNorm(num_groups=1) as its pre/post-attention norm
    (reference mobilevitv2.py:104-107)."""

    def __init__(self, num_groups: int, num_channels: int,
                 eps: float = 1e-5, affine: bool = True):
        super().__init__()
        assert num_channels % num_groups == 0
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        self.affine = affine

    def param_spec(self):
        if not self.affine:
            return {}
        return {
            "scale": lambda k: np.ones((self.num_channels,), np.float32),
            "bias": lambda k: np.zeros((self.num_channels,), np.float32),
        }

    def forward(self, cx: Ctx, x):
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        b = xf.shape[0]
        g = self.num_groups
        # (B, *spatial, C) -> (B, g, everything_else)
        grouped = xf.reshape(b, -1, g, self.num_channels // g)
        grouped = jnp.swapaxes(grouped, 1, 2).reshape(b, g, -1)
        mean = jnp.mean(grouped, axis=-1, keepdims=True)
        var = jnp.var(grouped, axis=-1, keepdims=True)
        normed = (grouped - mean) * jax.lax.rsqrt(var + self.eps)
        normed = normed.reshape(b, g, -1, self.num_channels // g)
        normed = jnp.swapaxes(normed, 1, 2).reshape(xf.shape)
        if self.affine:
            normed = normed * cx.param("scale") + cx.param("bias")
        return normed.astype(orig_dtype)
