"""3D MobileNetV3 video classifiers (Small / Large), TPU-native.

Architecture parity with reference mobilenet.py:133-278 (MobileNetLarge3D /
MobileNetSmall3D): stem conv s2 → inverted bottlenecks → 1x1 head conv →
global average pool → two 1x1 "conv" classifiers (dense here — on a pooled
(B, C) tensor a 1x1 conv IS a dense layer; weights convert by squeezing).

Parameter counts match the reference exactly (verified in tests):
Large 4,205,675 / Small 1,684,091 at num_classes=13.

Input layout: (B, T, H, W, C) channels-last (decoded clips arrive this way —
no permute, unlike reference train.py:106).

Init: the reference's ``initialize_weights`` for these models is effectively
a no-op (it checks a nonexistent attribute, mobilenet.py:203-210), so the
effective scheme is torch's default — which is what our layers default to.
"""

from __future__ import annotations

from picklebot_tpu.core.module import Ctx, Module, Sequential
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.bottleneck import Bottleneck3D
from picklebot_tpu.ops.conv import Conv3d
from picklebot_tpu.ops.linear import Dense, GlobalAvgPool
from picklebot_tpu.ops.norm import BatchNorm


class _ConvBNAct(Module):
    def __init__(self, cin, cout, kernel_size, stride=1, padding=0,
                 nonlinearity=act.hardswish, bias=True,
                 space_to_depth=False):
        super().__init__()
        self.conv = Conv3d(cin, cout, kernel_size, stride=stride,
                           padding=padding, bias=bias,
                           space_to_depth=space_to_depth)
        self.bn = BatchNorm(cout)
        self.nonlinearity = nonlinearity

    def forward(self, cx: Ctx, x, folded=None):
        if folded is not None:
            return self._forward_folded(cx, x, folded)
        return self.nonlinearity(cx(self.bn, cx(self.conv, x)))

    def _forward_folded(self, cx: Ctx, x, plan):
        """Stem on a lane-folded input (ops/folded.py): x arrives
        block-major folded (q-phases in the minor dim); the conv runs with
        gather-scattered canonical weights and emits the out-folded layout
        the folded bottlenecks consume. Exact — golden-tested."""
        import math as _math
        import jax.numpy as jnp
        from jax import lax
        from picklebot_tpu.ops.folded import gather_weights

        dt = cx.policy.compute_dtype
        w = cx.params["conv"]["w"]
        wf = gather_weights(plan, w).astype(dt)
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, x.shape[-1]), wf.shape, ("NTHWC", "THWIO", "NTHWC"))
        h = lax.conv_general_dilated(
            x.astype(dt), wf, plan.strides, list(plan.pads),
            dimension_numbers=dn)
        F = _math.prod(plan.folds_out)
        if self.conv.use_bias:
            b = cx.params["conv"]["b"].astype(dt)
            h = h + jnp.tile(b, F)
        h6 = h.reshape(h.shape[:-1] + (F, plan.cout))
        h6 = cx(self.bn, h6)
        h = h6.reshape(h.shape[:-1] + (F * plan.cout,))
        return self.nonlinearity(h)


def _early_fold_plans(variant: str = "w"):
    """Gather plans for the lane-folded stem + block2 (ops/folded.py).

    Variants (identical math, different phase-dim assignment):
      - "w": fold H 2x / W 16x. The W phases sit next to the channel minor,
        so fold_nd moves 48-element contiguous chunks — near-free — and the
        final unfold is a pure reshape. Default (measured fastest on v5e:
        the "h" input transpose alone cost ~8.7 ms at bs=16 T=32 224^2).
      - "h": fold H 16x / W 2x (round-2 original; gathers rows a full image
        apart in the fold transpose).
    Chains: stem in-fold = 2*out-fold per strided dim; block2 folds halve
    on the stride-2 bottleneck. Dense-kernel FLOP inflation is identical
    across variants (same fold factors, transposed dims).
    """
    from picklebot_tpu.ops.folded import folded_conv_map
    if variant == "w":
        return {
            "fold_in": (1, 2, 16), "unfold": (1, 1, 4),
            "stem": folded_conv_map((3, 3, 3), (2, 2, 2), (1, 1, 1),
                                    (1, 2, 16), (1, 1, 8), 3, 16),
            "b0": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                                  (1, 1, 8), (1, 1, 8), 16, 16),
            "b1": folded_conv_map((1, 3, 3), (2, 2, 2), (1, 1, 1),
                                  (1, 1, 8), (1, 1, 4), 16, 24),
            "b2": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                                  (1, 1, 4), (1, 1, 4), 24, 24),
        }
    assert variant == "h", variant
    return {
        "fold_in": (1, 16, 2), "unfold": (1, 4, 1),
        "stem": folded_conv_map((3, 3, 3), (2, 2, 2), (1, 1, 1),
                                (1, 16, 2), (1, 8, 1), 3, 16),
        "b0": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                              (1, 8, 1), (1, 8, 1), 16, 16),
        "b1": folded_conv_map((1, 3, 3), (2, 2, 2), (1, 1, 1),
                              (1, 8, 1), (1, 4, 1), 16, 24),
        "b2": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                              (1, 4, 1), (1, 4, 1), 24, 24),
    }


class MobileNetLarge3D(Module):
    """Reference mobilenet.py:133-201.

    ``early_fold=True`` (exact, opt-in, measured ~2.5x step speedup on
    v5e): the stem + block2 — 85% of the train step at C=16/24 on 128
    lanes — execute via the collapsed/lane-folded rewrites in
    ops/folded.py. Same parameters, same checkpoints, logits golden-equal.
    """

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False,
                 early_fold: bool = False):
        super().__init__()
        self.num_classes = num_classes
        B = Bottleneck3D
        relu = act.relu

        self.block1 = _ConvBNAct(3, 16, 3, stride=2, padding=1,
                                 space_to_depth=space_to_depth
                                 and not early_fold)
        self.block2 = Sequential(
            B(16, 16, 16, stride=1, nonlinearity=relu, dropout=0.2),
            B(16, 24, 64, stride=2, nonlinearity=relu, dropout=0.2),
            B(24, 24, 72, stride=1, nonlinearity=relu, dropout=0.2),
        )
        self.block3 = Sequential(
            B(24, 40, 72, stride=2, use_se=True, kernel_size=5,
              nonlinearity=relu, dropout=0.2),
            B(40, 40, 120, stride=1, use_se=True, kernel_size=5,
              nonlinearity=relu, dropout=0.2),
            B(40, 40, 120, stride=1, use_se=True, kernel_size=5,
              nonlinearity=relu, dropout=0.2),
        )
        self.block4 = Sequential(
            B(40, 80, 240, stride=2, dropout=0.2),
            B(80, 80, 240, stride=1, dropout=0.2),
            B(80, 80, 184, stride=1, dropout=0.2),
            B(80, 80, 184, stride=1, dropout=0.2),
            B(80, 112, 480, stride=1, use_se=True, dropout=0.2),
            B(112, 112, 672, stride=1, use_se=True, dropout=0.2),
        )
        self.block5 = Sequential(
            B(112, 160, 672, stride=2, use_se=True, kernel_size=5,
              dropout=0.2),
            B(160, 160, 960, stride=1, use_se=True, kernel_size=5,
              dropout=0.2),
            B(160, 160, 960, stride=1, use_se=True, kernel_size=5,
              dropout=0.2),
        )
        self.block6 = _ConvBNAct(160, 960, 1, stride=1)
        self.pool = GlobalAvgPool()
        self.fc1 = Dense(960, 1280)   # reference's 1x1 conv on pooled feature
        self.fc2 = Dense(1280, num_classes)

        self._early_plans = _early_fold_plans() if early_fold else None

    def forward(self, cx: Ctx, x):
        if self._early_plans is not None:
            from picklebot_tpu.ops.folded import fold_nd, unfold_nd
            plans = self._early_plans
            z = fold_nd(x, plans["fold_in"])
            z = cx(self.block1, z, folded=plans["stem"])
            z = cx(self.block2.layers[0], z, folded=plans["b0"])
            z = cx(self.block2.layers[1], z, folded=plans["b1"])
            z = cx(self.block2.layers[2], z, folded=plans["b2"])
            x = unfold_nd(z, plans["unfold"], 24)
        else:
            x = cx(self.block1, x)
            x = cx(self.block2, x)
        x = cx(self.block3, x)
        x = cx(self.block4, x)
        x = cx(self.block5, x)
        x = cx(self.block6, x)
        x = cx(self.pool, x)                      # (B, 960)
        x = act.hardswish(cx(self.fc1, x))
        return cx(self.fc2, x)                    # (B, num_classes)


class MobileNetSmall3D(Module):
    """Reference mobilenet.py:213-265."""

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False):
        super().__init__()
        self.num_classes = num_classes
        B = Bottleneck3D
        lrelu = act.leaky_relu

        self.block1 = _ConvBNAct(3, 16, 3, stride=2, padding=1,
                                 space_to_depth=space_to_depth)
        self.block2 = Sequential(
            B(16, 16, 16, stride=2, use_se=True, nonlinearity=lrelu,
              dropout=0.2),
            B(16, 24, 72, stride=2, nonlinearity=lrelu, dropout=0.2),
            B(24, 24, 88, stride=1, nonlinearity=lrelu, dropout=0.2),
        )
        self.block3 = Sequential(
            B(24, 40, 96, stride=2, use_se=True, kernel_size=5, dropout=0.2),
            B(40, 40, 240, stride=1, use_se=True, kernel_size=5, dropout=0.2),
            B(40, 40, 240, stride=1, use_se=True, kernel_size=5, dropout=0.2),
            B(40, 48, 120, stride=1, use_se=True, kernel_size=5, dropout=0.2),
            B(48, 48, 144, stride=1, use_se=True, kernel_size=5, dropout=0.2),
            B(48, 96, 288, stride=2, use_se=True, kernel_size=5, dropout=0.2),
            B(96, 96, 576, stride=1, use_se=True, kernel_size=5, dropout=0.2),
            B(96, 96, 576, stride=1, use_se=True, kernel_size=5, dropout=0.2),
        )
        # block4: 1x1 conv → SE → BN → hardswish (reference mobilenet.py:244)
        from picklebot_tpu.ops.se import SEBlock
        self.b4_conv = Conv3d(96, 576, 1)
        self.b4_se = SEBlock(576)
        self.b4_bn = BatchNorm(576)
        self.pool = GlobalAvgPool()
        self.fc1 = Dense(576, 1024)
        self.fc2 = Dense(1024, num_classes)

    def forward(self, cx: Ctx, x):
        x = cx(self.block1, x)
        x = cx(self.block2, x)
        x = cx(self.block3, x)
        x = act.hardswish(cx(self.b4_bn, cx(self.b4_se, cx(self.b4_conv, x))))
        x = cx(self.pool, x)
        x = act.hardswish(cx(self.fc1, x))
        return cx(self.fc2, x)
