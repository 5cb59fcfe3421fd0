"""MobileViT V2 (2D images): separable O(n) linear attention.

Architecture parity with reference mobilevitv2.py:266-305: s2 conv stem →
Bottleneck2D stack → three MobileViTV2Layers (downsample bottleneck +
depthwise-ish kxk + 1x1 + unfold(2x2) → linear-attention transformer →
GroupNorm → fold → 1x1 projection) → pool → 1000-class Linear. The
separable attention (mobilevitv2.py:9-55) replaces the O(n²) softmax with a
softmax over patches on a scalar query channel, a summed context vector, and
a ReLU-gated value product — O(n) in token count.

Faithful quirks kept (they change shapes, so parity demands them): the
reference's "1x1" convs carry stray padding=1 (mobilevitv2.py:193-218),
growing feature maps by 2px per use; ``convkxk`` has groups=1 despite the
"depthwise" comment (mobilevitv2.py:181-190). Debug prints dropped.

Channels-last: the unfold is an einops rearrange to (B, 4, N, C) with the
pixel-position axis P=4 and patches N — the attention contracts over N.

Init: N(0, 0.02²) weights / zero biases tree-wide (mobilevitv2.py:307-314).
Param count 9,223,185 (verified vs reference instantiation).
"""

from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module, ModuleList
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.attention import LinearSelfAttention
from picklebot_tpu.ops.bottleneck import Bottleneck2D
from picklebot_tpu.ops.conv import Conv2d
from picklebot_tpu.ops.linear import Dense, Dropout, GlobalAvgPool
from picklebot_tpu.ops.norm import GroupNorm


class MobileViTV2FFN(Module):
    """conv-FFN over the channel dim (reference mobilevitv2.py:58-91);
    1x1 convs on (B, P, N, C) are dense layers over C."""

    def __init__(self, embed_dim: int, ffn_latent_dim: int,
                 dropout: float = 0.0):
        super().__init__()
        self.conv1 = Dense(embed_dim, ffn_latent_dim, bias=True)
        self.dropout1 = Dropout(dropout)
        self.conv2 = Dense(ffn_latent_dim, embed_dim, bias=True)
        self.dropout2 = Dropout(dropout)

    def forward(self, cx: Ctx, x):
        x = cx(self.dropout1, act.silu(cx(self.conv1, x)))
        return cx(self.dropout2, cx(self.conv2, x))


class MobileViTV2TransformerLayer(Module):
    """reference mobilevitv2.py:94-121: GN → linear attn → +res;
    GN → FFN → +res."""

    def __init__(self, embed_dim: int, ffn_latent_dim: int,
                 dropout: float = 0.0):
        super().__init__()
        self.layernorm_before = GroupNorm(1, embed_dim)
        self.attention = LinearSelfAttention(embed_dim, dropout)
        self.dropout = Dropout(dropout)
        self.layernorm_after = GroupNorm(1, embed_dim)
        self.ffn = MobileViTV2FFN(embed_dim, ffn_latent_dim, dropout)

    def forward(self, cx: Ctx, x):
        h = cx(self.attention, cx(self.layernorm_before, x))
        x = cx(self.dropout, h) + x
        return cx(self.ffn, cx(self.layernorm_after, x)) + x


class MobileViTV2Layer(Module):
    """reference mobilevitv2.py:149-263."""

    def __init__(self, in_channels: int, out_channels: int,
                 attn_unit_dim: int, kernel_size: int = 3,
                 patch_size: int = 2, n_attn_blocks: int = 2,
                 expansion_ratio: int = 2, stride: int = 2):
        super().__init__()
        self.patch = patch_size
        if stride == 2:
            self.downsampling_layer = Bottleneck2D(
                in_channels, out_channels,
                expanded_channels=in_channels * expansion_ratio,
                stride=stride, kernel_size=kernel_size)
            in_channels = out_channels
        else:
            self.downsampling_layer = None
        self.convkxk = Conv2d(in_channels, in_channels, kernel_size,
                              stride=1, padding=1, bias=False)
        # quirk preserved: padding=1 on a 1x1 conv grows H,W by 2
        self.conv1x1 = Conv2d(in_channels, attn_unit_dim, 1, stride=1,
                              padding=1, bias=False)
        ffn_dim = (2 * attn_unit_dim // 16) * 16
        self.transformer = ModuleList([
            MobileViTV2TransformerLayer(attn_unit_dim, ffn_dim)
            for _ in range(n_attn_blocks)])
        self.layernorm = GroupNorm(1, attn_unit_dim)
        # quirk preserved: padding=1 on the 1x1 projection too
        self.conv_projection = Conv2d(attn_unit_dim, in_channels, 1,
                                      stride=1, padding=1, bias=False)

    def forward(self, cx: Ctx, x):
        if self.downsampling_layer is not None:
            x = cx(self.downsampling_layer, x)
        x = cx(self.convkxk, x)
        x = cx(self.conv1x1, x)
        # unfold: (B, H, W, C) -> (B, ph*pw, h*w, C). torch F.unfold FLOORS
        # odd dims (drops the last row/col) and F.fold zero-fills them back
        # (reference mobilevitv2.py:221-244) — replicated exactly.
        p = self.patch
        big_h, big_w = x.shape[1], x.shape[2]
        h, w = big_h // p, big_w // p
        cropped = x[:, :h * p, :w * p, :]
        x = rearrange(cropped, "b (h ph) (w pw) c -> b (ph pw) (h w) c",
                      ph=p, pw=p)
        for i in range(len(self.transformer)):
            x = cx(self.transformer[i], x)
        x = cx(self.layernorm, x)
        x = rearrange(x, "b (ph pw) (h w) c -> b (h ph) (w pw) c",
                      ph=p, pw=p, h=h)
        if h * p != big_h or w * p != big_w:
            x = jnp.pad(x, ((0, 0), (0, big_h - h * p),
                            (0, big_w - w * p), (0, 0)))
        return cx(self.conv_projection, x)


class MobileViTV2(Module):
    """reference mobilevitv2.py:266-305 (ImageNet-style 1000-class head)."""

    def __init__(self, expand_ratio: int = 2, num_classes: int = 1000,
                 space_to_depth: bool = False):
        super().__init__()
        self.conv1 = Conv2d(3, 32, 3, stride=2, padding=1, bias=False,
                            space_to_depth=space_to_depth)
        self.bn1 = Bottleneck2D(32, 64, expanded_channels=32 * expand_ratio)
        self.bn2 = Bottleneck2D(64, 128, expanded_channels=64 * expand_ratio,
                                stride=2)
        self.bn3 = Bottleneck2D(128, 128,
                                expanded_channels=128 * expand_ratio)
        self.bn3_5 = Bottleneck2D(128, 128,
                                  expanded_channels=128 * expand_ratio)
        self.transformer1 = MobileViTV2Layer(128, 256, 128, n_attn_blocks=2)
        self.transformer2 = MobileViTV2Layer(256, 384, 192, n_attn_blocks=4)
        self.transformer3 = MobileViTV2Layer(384, 512, 256, n_attn_blocks=3)
        self.pool = GlobalAvgPool()
        self.fc = Dense(512, num_classes)

    def forward(self, cx: Ctx, x):
        x = cx(self.conv1, x)
        x = cx(self.bn1, x)
        x = cx(self.bn2, x)
        x = cx(self.bn3, x)
        x = cx(self.bn3_5, x)
        x = cx(self.transformer1, x)
        x = cx(self.transformer2, x)
        x = cx(self.transformer3, x)
        x = cx(self.pool, x)
        return cx(self.fc, x)

    def init_params(self, seed):
        from picklebot_tpu.core.module import as_seed
        seed = as_seed(seed)
        return pinit.reinit_normal_002(super().init_params(seed), seed)
