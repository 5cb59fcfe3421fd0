"""Convolution modules in TPU-native channels-last layouts.

The reference computes every conv in NCTHW/NCHW via cuDNN (Conv3d/Conv2d all
over mobilenet.py/movinet.py/mobilevit.py). On TPU the efficient layout is
channels-last — NTHWC for video, NHWC for images — which puts channels on the
128-lane minor dimension of the MXU/VPU and lets batched pointwise convs
compile to large matmuls. Conveniently, the data pipeline's decoded clips are
already (T, H, W, C) (reference dataloader.py:56 stacks frames that way, then
train.py:106 permutes for torch); we skip the permute entirely.

Semantics match torch.nn.ConvNd exactly:
  out = floor((in + 2*pad - dilation*(k-1) - 1)/stride) + 1, cross-correlation,
  groups via feature_group_count. Weight layout here is (k..., I/groups, O);
  the checkpoint converter transposes torch's (O, I/groups, k...).

This includes the reference's quirky Bottleneck3D depthwise geometry
(mobilenet.py:67-75): temporal kernel 1 but integer stride/padding applied to
T as well, so T inflates by 2*(k//2) on stride-1 blocks. We reproduce it
bit-for-bit (it's load-bearing for checkpoint parity) — see ops/bottleneck.py.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module

IntOrTuple = Union[int, Tuple[int, ...]]


def _ntuple(v: IntOrTuple, n: int) -> Tuple[int, ...]:
    if isinstance(v, (tuple, list)):
        assert len(v) == n, f"expected {n}-tuple, got {v}"
        return tuple(int(x) for x in v)
    return (int(v),) * n


class _ConvNd(Module):
    """Shared N-D conv. Spatial rank 2 (NHWC) or 3 (NTHWC)."""

    def __init__(self, rank: int, in_channels: int, out_channels: int,
                 kernel_size: IntOrTuple, stride: IntOrTuple = 1,
                 padding: IntOrTuple = 0, dilation: IntOrTuple = 1,
                 groups: int = 1, bias: bool = True,
                 w_init=None, b_init=None, space_to_depth: bool = False):
        super().__init__()
        self.rank = rank
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _ntuple(kernel_size, rank)
        self.stride = _ntuple(stride, rank)
        self.padding = _ntuple(padding, rank)
        self.dilation = _ntuple(dilation, rank)
        self.groups = groups
        self.use_bias = bias
        # Space-to-depth: exact compute-path rewrite for stem-shaped dims
        # (k=3, s=2, p=1). Each eligible dim is folded 2x into channels, the
        # conv becomes stride-1 kernel-2 along it, and the kernel taps are
        # re-indexed (pad 3->4, reshape (block, phase)). Parameters are
        # untouched, so checkpoints and the torch converter are unaffected.
        # Rationale: a 3-channel 224^2 stem input occupies 3 of 128 MXU/VPU
        # lanes; folding T,H,W packs it to 24 with identical MACs.
        self.fold_dims: Tuple[int, ...] = ()
        if space_to_depth and groups == 1:
            self.fold_dims = tuple(
                i for i in range(rank)
                if self.kernel_size[i] == 3 and self.stride[i] == 2
                and self.padding[i] == 1 and self.dilation[i] == 1)
        assert in_channels % groups == 0 and out_channels % groups == 0
        # weight: (k..., I/groups, O)
        self.w_shape = self.kernel_size + (in_channels // groups, out_channels)
        fan_in = (in_channels // groups) * math.prod(self.kernel_size)
        self.w_init = w_init or pinit.kaiming_uniform()  # torch default
        self.b_init = b_init or pinit.torch_default_bias(fan_in)
        if rank == 3:
            self.dn = lax.conv_dimension_numbers(
                (1, 1, 1, 1, in_channels), self.w_shape,
                ("NTHWC", "THWIO", "NTHWC"))
        else:
            self.dn = lax.conv_dimension_numbers(
                (1, 1, 1, in_channels), self.w_shape,
                ("NHWC", "HWIO", "NHWC"))

    def param_spec(self):
        spec = {"w": lambda k: self.w_init(k, self.w_shape)}
        if self.use_bias:
            spec["b"] = lambda k: self.b_init(k, (self.out_channels,))
        return spec

    def forward(self, cx: Ctx, x, folded=None):
        if folded is not None:
            return self._conv_folded(cx, x, folded)
        w = cx.param("w").astype(cx.policy.compute_dtype)
        x = x.astype(cx.policy.compute_dtype)
        if self.fold_dims:
            out = self._conv_space_to_depth(x, w)
        else:
            # NB: no preferred_element_type — the TPU MXU accumulates bf16
            # matmuls in f32 internally, and an explicit f32 output dtype
            # breaks the conv VJP (f32 cotangent vs bf16 weights).
            out = lax.conv_general_dilated(
                x, w,
                window_strides=self.stride,
                padding=[(p, p) for p in self.padding],
                rhs_dilation=self.dilation,
                dimension_numbers=self.dn,
                feature_group_count=self.groups,
            )
        if self.use_bias:
            out = out + cx.param("b").astype(cx.policy.compute_dtype)
        return out

    def _conv_folded(self, cx: Ctx, x, plan):
        """Run this conv on a lane-folded input per ``plan`` (a
        ops/folded.FoldedConv built for this conv's geometry): the canonical
        weights are gather-scattered into the folded dense kernel at trace
        time, so parameters, checkpoints and autodiff are untouched. The
        output stays folded — (…, prod(folds_out) * out_channels) — for the
        caller to keep folded or unfold (ops/folded.unfold_nd)."""
        from picklebot_tpu.ops.folded import gather_weights
        assert self.groups == 1, "folded conv requires groups == 1"
        # fold plans are built for dilation 1 (folded_conv_map has no
        # dilation parameter): running a dilated conv through one would
        # return plausible-shaped but numerically WRONG activations
        assert all(d == 1 for d in self.dilation), \
            f"folded conv requires dilation 1, got {self.dilation}"
        assert (plan.cin, plan.cout) == (self.in_channels,
                                         self.out_channels), \
            (f"fold plan built for cin={plan.cin}/cout={plan.cout} handed "
             f"to a {self.in_channels}->{self.out_channels} conv")
        dt = cx.policy.compute_dtype
        wf = gather_weights(plan, cx.param("w")).astype(dt)
        out = lax.conv_general_dilated(
            x.astype(dt), wf, plan.strides, list(plan.pads),
            dimension_numbers=self.dn)
        if self.use_bias:
            out = out + jnp.tile(cx.param("b").astype(dt),
                                 math.prod(plan.folds_out))
        return out

    def _conv_space_to_depth(self, x, w):
        """Exact stride-2 conv via 2x channel folding on ``self.fold_dims``.

        For a folded dim, output position h reads input 2h+d-1, d in {0,1,2}.
        In block/phase coords (m = i//2, p = i%2) that is blocks {h-1, h}:
        d=0 -> (block 0, phase 1), d=1 -> (1, 0), d=2 -> (1, 1) — i.e. pad the
        3-tap kernel to 4 with a leading zero and reshape to (2 blocks,
        2 phases). The folded conv is then stride 1, kernel 2, padding (1, 0).
        Identical MACs, input lanes packed 2x per folded dim.
        """
        fold = self.fold_dims
        for i in fold:
            if x.shape[1 + i] % 2:
                raise ValueError(
                    f"space_to_depth needs even input size on dim {i}, "
                    f"got {x.shape[1 + i]} (input shape {x.shape})")
        # ---- fold input: the shared block-major fold (ops/folded.fold_nd)
        # with G=2 on the folded dims — one implementation of the
        # phase-into-channel-minor layout, not a second copy to keep in
        # sync with folded.py's
        from picklebot_tpu.ops.folded import fold_nd
        z = fold_nd(x, tuple(2 if i in fold else 1
                             for i in range(self.rank)))
        # ---- fold kernel: pad 3->4 (leading zero tap), reshape (2, 2)
        pads = [(1, 0) if i in fold else (0, 0) for i in range(self.rank)]
        wp = jnp.pad(w, pads + [(0, 0), (0, 0)])
        kshape = []
        for i in range(self.rank):
            kshape += [2, 2] if i in fold else [self.kernel_size[i]]
        wp = wp.reshape(kshape + list(w.shape[-2:]))
        perm, phases = [], []
        j = 0
        for i in range(self.rank):
            perm.append(j)
            j += 1
            if i in fold:
                phases.append(j)
                j += 1
        wp = wp.transpose(perm + phases + [j, j + 1])
        k2 = tuple(2 if i in fold else self.kernel_size[i]
                   for i in range(self.rank))
        wp = wp.reshape(k2 + (-1, self.out_channels))
        return lax.conv_general_dilated(
            z, wp,
            window_strides=tuple(1 if i in fold else self.stride[i]
                                 for i in range(self.rank)),
            padding=[(1, 0) if i in fold else (p, p)
                     for i, p in enumerate(self.padding)],
            rhs_dilation=self.dilation,
            dimension_numbers=self.dn,
            feature_group_count=1,
        )


class Conv3d(_ConvNd):
    """3D conv over (B, T, H, W, C). Replaces reference nn.Conv3d use."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 w_init=None, b_init=None, space_to_depth=False):
        super().__init__(3, in_channels, out_channels, kernel_size, stride,
                         padding, dilation, groups, bias, w_init, b_init,
                         space_to_depth)


class Conv2d(_ConvNd):
    """2D conv over (B, H, W, C). Replaces reference nn.Conv2d use."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 w_init=None, b_init=None, space_to_depth=False):
        super().__init__(2, in_channels, out_channels, kernel_size, stride,
                         padding, dilation, groups, bias, w_init, b_init,
                         space_to_depth)


class CausalConv3d(Module):
    """Temporally-causal 3D conv with an optional carried stream buffer.

    The reference *defines* this (movinet.py:7-39) but never wires it in; its
    stream_buffer is just a pad constant. Here it is real: in streaming mode
    the temporal left-context is carried as explicit state of shape
    (B, k_t-1, H, W, C), enabling frame-by-frame online inference through
    ``lax.scan`` (see models/movinet.py MoViNetA2Stream). In clip mode it
    left-pads with zeros (true causal padding).
    """

    def __init__(self, in_channels, out_channels, kernel_size,
                 stride: IntOrTuple = 1, dilation: IntOrTuple = 1,
                 groups: int = 1, bias: bool = False, w_init=None,
                 b_init=None):
        super().__init__()
        ks = _ntuple(kernel_size, 3)
        self.t_context = ks[0] - 1  # frames of temporal left context
        self.conv = Conv3d(in_channels, out_channels, ks,
                           stride=stride,
                           padding=(0, ks[1] // 2, ks[2] // 2),
                           dilation=dilation, groups=groups, bias=bias,
                           w_init=w_init, b_init=b_init)

    def forward(self, cx: Ctx, x, buffer: Optional[jax.Array] = None):
        """x: (B, T, H, W, C). If ``buffer`` is given it must hold the last
        ``t_context`` frames of the previous chunk; returns (out, new_buffer).
        Without a buffer, left-pads T with zeros (clip-mode causal conv)."""
        if self.t_context > 0:
            if buffer is None:
                pad = [(0, 0), (self.t_context, 0), (0, 0), (0, 0), (0, 0)]
                x_in = jnp.pad(x, pad)
            else:
                x_in = jnp.concatenate([buffer.astype(x.dtype), x], axis=1)
        else:
            x_in = x
        out = cx(self.conv, x_in)
        if buffer is not None:
            new_buffer = x_in[:, -self.t_context:] if self.t_context > 0 \
                else buffer
            return out, new_buffer
        return out
