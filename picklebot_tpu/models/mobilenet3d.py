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
        gather-scattered canonical weights (Conv3d folded path) and emits
        the out-folded layout the folded bottlenecks consume. BN runs the
        standard module on a (..., F, C) reshape. Exact — golden-tested."""
        import math as _math
        h = cx(self.conv, x, folded=plan)
        F = _math.prod(plan.folds_out)
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
    Chains: stem in-fold = 2*out-fold per strided dim; folds halve on each
    stride-2 bottleneck. The default span stops after block2 (unfold at
    fold 4, C=24): folding block3/block4[0] too was measured SLOWER on v5e
    (332 vs 469.5 clips/s train bs=16) — the k5, E=120 SE partial collapse
    multiplies depthwise+expand FLOPs ~15x, which overwhelms the 3.2x lane
    -padding win at C=40. Their plans stay here (span="block4") for
    remeasurement on other hardware. Dense-kernel FLOP inflation is
    identical across variants.
    """
    from picklebot_tpu.ops.folded import folded_conv_map

    if variant == "w":
        # H stays a PLAIN strided conv dim (G_h=1): fold_nd(1,1,16) is then
        # a pure reshape — zero data movement. Folding H 2x as well cost a
        # measured 6.8 ms input transpose (scripts/probe_stem.py) and a
        # bigger dense kernel (3*2*2*96 vs 3*3*2*48 MACs/output).
        fold_in, stem_out = (1, 1, 16), (1, 1, 8)

        def fold(f):           # phase dim = W
            return (1, 1, f)
    else:
        assert variant == "h", variant
        fold_in, stem_out = (1, 16, 2), (1, 8, 1)

        def fold(f):           # phase dim = H
            return (1, f, 1)

    return {
        "fold_in": fold_in, "unfold": fold(4),
        "stem": folded_conv_map((3, 3, 3), (2, 2, 2), (1, 1, 1),
                                fold_in, stem_out, 3, 16),
        "b0": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                              fold(8), fold(8), 16, 16),
        "b1": folded_conv_map((1, 3, 3), (2, 2, 2), (1, 1, 1),
                              fold(8), fold(4), 16, 24),
        "b2": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                              fold(4), fold(4), 24, 24),
        # block3: SE between depthwise and projection -> plans map
        # cin -> expanded channels (partial collapse)
        "b3_0": folded_conv_map((1, 5, 5), (2, 2, 2), (2, 2, 2),
                                fold(4), fold(2), 24, 72),
        "b3_1": folded_conv_map((1, 5, 5), (1, 1, 1), (2, 2, 2),
                                fold(2), fold(2), 40, 120),
        "b3_2": folded_conv_map((1, 5, 5), (1, 1, 1), (2, 2, 2),
                                fold(2), fold(2), 40, 120),
        # block4[0]: stride 2 takes the fold to 1 -> output is the
        # canonical dense layout, no unfold step needed
        "b4_0": folded_conv_map((1, 3, 3), (2, 2, 2), (1, 1, 1),
                                fold(2), fold(1), 40, 80),
    }


def _boundary_plans_large():
    """fold_span='boundary' continuation plans: block3 + block4[0] run
    boundary-folded (ops/folded.BoundaryFold — canonical FLOPs, only the
    narrow C=24..80 boundaries stay lane-packed), picking up from the
    collapsed block2's fold of 4 and landing dense at block4[0]."""
    from picklebot_tpu.ops.folded import BoundaryFold
    return {
        "b3_0": BoundaryFold(4, 2, 24, 40),
        "b3_1": BoundaryFold(2, 2, 40, 40),
        "b3_2": BoundaryFold(2, 2, 40, 40),
        "b4_0": BoundaryFold(2, 1, 40, 80),
    }


class MobileNetLarge3D(Module):
    """Reference mobilenet.py:133-201.

    ``early_fold=True`` (exact, opt-in, 2.4x train step on v5e): the stem
    through block4's first bottleneck — ~90% of the plain train step, all
    at C=16..40 paying up to 8x 128-lane padding — execute via the
    collapsed/lane-folded rewrites in ops/folded.py. Same parameters, same
    checkpoints; logits match within float tolerance
    (tests/test_early_fold.py).
    """

    FOLD_SPANS = ("block2", "block4", "boundary")

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False,
                 early_fold: bool = False, fold_span: str = "block2"):
        super().__init__()
        self.num_classes = num_classes
        if fold_span not in self.FOLD_SPANS:
            raise ValueError(
                f"MobileNetLarge3D fold_span={fold_span!r} not recognized "
                f"(valid: {self.FOLD_SPANS})")
        self._fold_span = fold_span
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
            for i, key in enumerate(("b0", "b1", "b2")):
                z = cx(self.block2.layers[i], z, folded=plans[key])
            if self._fold_span in ("block4", "boundary"):
                bp = (plans if self._fold_span == "block4"
                      else _boundary_plans_large())
                for i, key in enumerate(("b3_0", "b3_1", "b3_2")):
                    z = cx(self.block3.layers[i], z, folded=bp[key])
                # b4_0 lands at fold 1: output is already the dense layout
                x = cx(self.block4.layers[0], z, folded=bp["b4_0"])
                for layer in self.block4.layers[1:]:
                    x = cx(layer, x)
            else:
                x = unfold_nd(z, plans["unfold"], 24)
                x = cx(self.block3, x)
                x = cx(self.block4, x)
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


def _early_fold_plans_small():
    """Small3D lane-fold chain (W-major): stride-2 stem/b0/b1 halve the fold
    8 -> 4 -> 2; block3[0] (stride 2, SE, k5) lands at fold 1 — dense C=40.
    block2[0] carries SE (reference mobilenet.py:221) so its plan maps
    cin -> E (partial collapse); b1/b2 collapse fully."""
    from picklebot_tpu.ops.folded import folded_conv_map
    return {
        "fold_in": (1, 1, 16),
        "stem": folded_conv_map((3, 3, 3), (2, 2, 2), (1, 1, 1),
                                (1, 1, 16), (1, 1, 8), 3, 16),
        "b0": folded_conv_map((1, 3, 3), (2, 2, 2), (1, 1, 1),
                              (1, 1, 8), (1, 1, 4), 16, 16),    # SE -> E=16
        "b1": folded_conv_map((1, 3, 3), (2, 2, 2), (1, 1, 1),
                              (1, 1, 4), (1, 1, 2), 16, 24),
        "b2": folded_conv_map((1, 3, 3), (1, 1, 1), (1, 1, 1),
                              (1, 1, 2), (1, 1, 2), 24, 24),
        "b3_0": folded_conv_map((1, 5, 5), (2, 2, 2), (2, 2, 2),
                                (1, 1, 2), (1, 1, 1), 24, 96),  # SE -> E=96
    }


class MobileNetSmall3D(Module):
    """Reference mobilenet.py:213-265."""

    FOLD_SPANS = ("block3", "boundary")

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False,
                 early_fold: bool = False, fold_span: str = "block3"):
        super().__init__()
        self.num_classes = num_classes
        # "block3" (default): block3[0] joins the dense collapse chain;
        # "boundary": block3[0] runs boundary-folded instead (canonical
        # FLOPs — its k5/E=96 collapse carries ~15x structural zeros)
        if fold_span not in self.FOLD_SPANS:
            raise ValueError(
                f"MobileNetSmall3D fold_span={fold_span!r} not recognized "
                f"(valid: {self.FOLD_SPANS})")
        self._fold_span = fold_span
        B = Bottleneck3D
        lrelu = act.leaky_relu

        self.block1 = _ConvBNAct(3, 16, 3, stride=2, padding=1,
                                 space_to_depth=space_to_depth
                                 and not early_fold)
        self._early_plans = _early_fold_plans_small() if early_fold else None
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
        if self._early_plans is not None:
            from picklebot_tpu.ops.folded import fold_nd
            plans = self._early_plans
            z = fold_nd(x, plans["fold_in"])
            z = cx(self.block1, z, folded=plans["stem"])
            for i, key in enumerate(("b0", "b1", "b2")):
                z = cx(self.block2.layers[i], z, folded=plans[key])
            # block3[0] lands at fold 1: output is the dense layout
            if self._fold_span == "boundary":
                from picklebot_tpu.ops.folded import BoundaryFold
                x = cx(self.block3.layers[0], z,
                       folded=BoundaryFold(2, 1, 24, 40))
            else:
                x = cx(self.block3.layers[0], z, folded=plans["b3_0"])
            for layer in self.block3.layers[1:]:
                x = cx(layer, x)
        else:
            x = cx(self.block1, x)
            x = cx(self.block2, x)
            x = cx(self.block3, x)
        x = act.hardswish(cx(self.b4_bn, cx(self.b4_se, cx(self.b4_conv, x))))
        x = cx(self.pool, x)
        x = act.hardswish(cx(self.fc1, x))
        return cx(self.fc2, x)
