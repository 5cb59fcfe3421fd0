"""Inverted-bottleneck blocks — the shared ops layer of the model zoo.

Reproduces reference Bottleneck3D/Bottleneck2D (mobilenet.py:47-130) exactly,
including the deliberate quirks that checkpoint-parity depends on:

  * depthwise kernel is (1, k, k) — temporal kernel 1 — but the *integer*
    stride and padding apply to T as well, so T inflates by 2*(k//2) per
    stride-1 block and is re-strided on stride-2 blocks (mobilenet.py:67-75);
  * there is NO residual connection;
  * BatchNorm + nonlinearity come AFTER the projection conv (the MobileNetV3
    paper puts BN after every conv — the reference does not);
  * channel dropout (Dropout3d) at the end, train-only.

Layout is channels-last (NTHWC / NHWC): the pointwise 1x1 convs become big
(B*T*H*W, C) x (C, E) matmuls on the MXU; the depthwise conv runs as an XLA
grouped conv (a Pallas fusion of depthwise+SE is tracked in ops/pallas/).
"""

from __future__ import annotations

from typing import Callable

from picklebot_tpu.core.module import Ctx, Module
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.conv import Conv2d, Conv3d
from picklebot_tpu.ops.linear import ChannelDropout
from picklebot_tpu.ops.norm import BatchNorm
from picklebot_tpu.ops.se import SEBlock


class Bottleneck3D(Module):
    def __init__(self, in_channels: int, out_channels: int,
                 expanded_channels: int, stride: int = 1,
                 use_se: bool = False, kernel_size: int = 3,
                 nonlinearity: Callable = act.hardswish,
                 batchnorm: bool = True, dropout: float = 0.0,
                 bias: bool = False):
        super().__init__()
        self.stride = stride
        self.kernel_size = kernel_size
        self.use_se = use_se
        self.pointwise_conv1 = Conv3d(in_channels, expanded_channels, 1,
                                      bias=bias)
        # Quirk preserved: int stride/padding hit the temporal dim although
        # the temporal kernel is 1 (reference mobilenet.py:67-75).
        self.depthwise_conv = Conv3d(
            expanded_channels, expanded_channels,
            kernel_size=(1, kernel_size, kernel_size),
            stride=stride, padding=kernel_size // 2,
            groups=expanded_channels, bias=bias)
        self.squeeze_excite = SEBlock(expanded_channels) if use_se else None
        self.pointwise_conv2 = Conv3d(expanded_channels, out_channels, 1,
                                      bias=bias)
        self.batchnorm = BatchNorm(out_channels) if batchnorm else None
        self.nonlinearity = nonlinearity
        self.dropout = ChannelDropout(dropout)

    def forward(self, cx: Ctx, x, folded=None):
        if folded is not None:
            from picklebot_tpu.ops.folded import BoundaryFold
            if isinstance(folded, BoundaryFold):
                return self._forward_boundary(cx, x, folded)
            return self._forward_folded(cx, x, folded)
        x = cx(self.pointwise_conv1, x)
        x = cx(self.depthwise_conv, x)
        if self.squeeze_excite is not None:
            x = cx(self.squeeze_excite, x)
        x = cx(self.pointwise_conv2, x)
        if self.batchnorm is not None:
            x = cx(self.batchnorm, x)
        x = self.nonlinearity(x)
        x = cx(self.dropout, x)
        return x

    def _forward_folded(self, cx: Ctx, x, plan):
        return _folded_bottleneck(self, cx, x, plan)

    def _forward_boundary(self, cx: Ctx, x, plan):
        return _boundary_bottleneck(self, cx, x, plan)


def _folded_bottleneck(block, cx: Ctx, x, plan):
    """Collapsed + lane-folded execution (ops/folded.py) — rank-agnostic
    (shared by Bottleneck3D and Bottleneck2D; the kernel rank rides the
    depthwise weight's shape and the conv dimension numbers come from the
    block's own 1x1 conv, which encode only the NTHWC/NHWC ordering).

    Without SE, expand -> depthwise -> project has no norm or
    nonlinearity in between (reference mobilenet.py:62-96 and :120-130),
    so the three convs combine into one k-window map, executed as a dense
    folded conv with channel-packed lanes (``plan`` maps cin -> cout).

    With SE (which sits between depthwise and project), expand and
    depthwise still collapse (both linear; ``plan`` maps cin -> E); SE
    then runs as the STANDARD module on a (..., F, E) reshape — its
    global pool reduces every axis but the last, so pooling over phases
    too averages exactly the canonical element set per channel, and the
    scale broadcast applies the canonical per-channel factor to every
    phase — and the projection becomes a per-phase matmul (1x1 convs
    never mix phases).

    BN runs on a (..., F, C) reshape of the standard module (same
    stats, same state); dropout — where the block has any: the reference's
    Bottleneck2D never calls its Dropout2d — tiles the canonical mask
    across phases (bit-identical, see ChannelDropout). Exactness vs the
    plain path is golden-tested (tests/test_early_fold.py,
    tests/test_early_fold_2d.py).
    """
    import jax.numpy as jnp
    import math as _math
    from jax import lax
    from picklebot_tpu.ops.folded import gather_weights

    p = cx.params
    w1 = p["pointwise_conv1"]["w"]   # (1..., cin, E)
    wdw = p["depthwise_conv"]["w"]   # (k..., 1, E)
    w2 = p["pointwise_conv2"]["w"]   # (1..., E, cout)
    assert "b" not in p["pointwise_conv1"], "folded path: bias-free only"
    dt = cx.policy.compute_dtype
    w1m = w1.reshape(w1.shape[-2:])
    w2m = w2.reshape(w2.shape[-2:])
    wdwm = wdw[..., 0, :]            # (k..., E)
    # collapse in f32 (params dtype), cast once after the gather
    if block.squeeze_excite is None:
        wc = jnp.einsum("ie,...e,eo->...io", w1m, wdwm, w2m)  # (k...,cin,cout)
    else:
        assert plan.cout == w1.shape[-1], "SE plan must map cin -> E"
        wc = jnp.einsum("ie,...e->...ie", w1m, wdwm)          # (k...,cin,E)
    wf = gather_weights(plan, wc).astype(dt)
    h = lax.conv_general_dilated(
        x.astype(dt), wf, plan.strides, list(plan.pads),
        dimension_numbers=block.pointwise_conv1.dn)
    F = _math.prod(plan.folds_out)
    h6 = h.reshape(h.shape[:-1] + (F, plan.cout))
    if block.squeeze_excite is not None:
        h6 = cx(block.squeeze_excite, h6)
        h6 = jnp.einsum("...fe,eo->...fo", h6,
                        w2m.astype(dt))   # per-phase projection
    if block.batchnorm is not None:
        h6 = cx(block.batchnorm, h6)
    h = h6.reshape(h6.shape[:-2] + (F * h6.shape[-1],))
    h = block.nonlinearity(h)
    drop = getattr(block, "dropout", None)
    if drop is not None:
        h = cx(drop, h, fold=F)
    return h


def _boundary_bottleneck(block, cx: Ctx, x, plan):
    """Boundary-folded execution (ops/folded.BoundaryFold), rank-agnostic:
    only the narrow input/output live W-folded; expand is a per-phase
    matmul, depthwise/SE run the standard modules on the canonical expanded
    layout (the W-major fold<->unfold between them is a pure reshape),
    and the projection refolds its output. Exactly canonical FLOPs —
    for blocks whose E is lane-wide but whose cin/cout are not."""
    import jax.numpy as jnp

    p = cx.params
    assert "b" not in p["pointwise_conv1"], "folded path: bias-free only"
    dt = cx.policy.compute_dtype
    F, F2 = plan.f_in, plan.f_out
    w1 = p["pointwise_conv1"]["w"]
    w1 = w1.reshape(w1.shape[-2:]).astype(dt)            # (cin, E)
    w2 = p["pointwise_conv2"]["w"]
    w2 = w2.reshape(w2.shape[-2:]).astype(dt)            # (E, cout)
    h6 = x.astype(dt).reshape(x.shape[:-1] + (F, plan.cin))
    h6 = jnp.einsum("...fc,ce->...fe", h6, w1)
    E = h6.shape[-1]
    h = h6.reshape(h6.shape[:-3] + (h6.shape[-3] * F, E))  # canonical W
    h = cx(block.depthwise_conv, h)
    if block.squeeze_excite is not None:
        h = cx(block.squeeze_excite, h)
    h6 = h.reshape(h.shape[:-2] + (h.shape[-2] // F2, F2, E))
    h6 = jnp.einsum("...fe,eo->...fo", h6, w2)
    if block.batchnorm is not None:
        h6 = cx(block.batchnorm, h6)
    h = h6.reshape(h6.shape[:-2] + (F2 * h6.shape[-1],))
    h = block.nonlinearity(h)
    drop = getattr(block, "dropout", None)
    if drop is not None:
        h = cx(drop, h, fold=F2)
    return h


class Bottleneck2D(Module):
    def __init__(self, in_channels: int, out_channels: int,
                 expanded_channels: int, stride: int = 1,
                 use_se: bool = False, kernel_size: int = 3,
                 nonlinearity: Callable = act.hardswish,
                 batchnorm: bool = True, dropout: float = 0.0,
                 bias: bool = False):
        super().__init__()
        self.pointwise_conv1 = Conv2d(in_channels, expanded_channels, 1,
                                      bias=bias)
        self.depthwise_conv = Conv2d(
            expanded_channels, expanded_channels, kernel_size,
            stride=stride, padding=kernel_size // 2,
            groups=expanded_channels, bias=bias)
        self.squeeze_excite = SEBlock(expanded_channels) if use_se else None
        self.pointwise_conv2 = Conv2d(expanded_channels, out_channels, 1,
                                      bias=bias)
        self.batchnorm = BatchNorm(out_channels) if batchnorm else None
        self.nonlinearity = nonlinearity
        # NB: reference Bottleneck2D constructs nn.Dropout2d but never calls
        # it in forward (mobilenet.py:120-130); we match by omitting it.

    def forward(self, cx: Ctx, x, folded=None):
        if folded is not None:
            from picklebot_tpu.ops.folded import BoundaryFold
            if isinstance(folded, BoundaryFold):
                return _boundary_bottleneck(self, cx, x, folded)
            return _folded_bottleneck(self, cx, x, folded)
        x = cx(self.pointwise_conv1, x)
        x = cx(self.depthwise_conv, x)
        if self.squeeze_excite is not None:
            x = cx(self.squeeze_excite, x)
        x = cx(self.pointwise_conv2, x)
        if self.batchnorm is not None:
            x = cx(self.batchnorm, x)
        x = self.nonlinearity(x)
        return x
