"""MobileNetV3-2D + LSTM video classifiers (Large2D / Small2D).

Capability parity with reference mobilenet.py:285-456 — a per-frame 2D CNN
feeding an LSTM, classifying from the last timestep. The reference loops over
frames in Python, writing each CNN output into a preallocated buffer
(mobilenet.py:355-366) — a serialization catastrophe on any accelerator. Here
the CNN runs ONCE over all frames batched as (B*T, H, W, C) — a pure
data-layout change with identical eval-mode math — and only the LSTM
recurrence is sequential (lax.scan with precomputed input projections).

Training-mode divergence (documented): BatchNorm statistics are computed over
all B*T frames at once rather than the reference's per-frame-batch sequential
updates; eval-mode logits convert weight-for-weight (tested).

Reference quirks NOT reproduced (documented): Large2D builds its layers
inside ``initialize_weights`` instead of ``__init__`` (mobilenet.py:291-348),
so the torch module is empty until that's called — we construct normally;
parity tests call it on the torch side first. These models are also
first-class in our registry though the reference never registers them
(train.py:156-161).

Param counts (verified): Large2D 3,119,168 / Small2D 1,243,536 (2-class).
"""

from __future__ import annotations

from picklebot_tpu.core.module import Ctx, Module, Sequential
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.bottleneck import Bottleneck2D
from picklebot_tpu.ops.conv import Conv2d
from picklebot_tpu.ops.linear import LSTM, AvgPool2d, Dense
from picklebot_tpu.ops.norm import BatchNorm


class _ConvBNAct2D(Module):
    def __init__(self, cin, cout, kernel_size, stride=1, padding=0,
                 space_to_depth=False):
        super().__init__()
        self.conv = Conv2d(cin, cout, kernel_size, stride=stride,
                           padding=padding, space_to_depth=space_to_depth)
        self.bn = BatchNorm(cout)

    def forward(self, cx: Ctx, x, folded=None):
        if folded is not None:
            return self._forward_folded(cx, x, folded)
        return act.hardswish(cx(self.bn, cx(self.conv, x)))

    def _forward_folded(self, cx: Ctx, x, plan):
        """Stem on a lane-folded input (ops/folded.py) — the 2D mirror of
        mobilenet3d._ConvBNAct._forward_folded: gather-scattered canonical
        weights, BN on a (..., F, C) reshape. Exact — golden-tested
        (tests/test_early_fold_2d.py)."""
        import math as _math
        h = cx(self.conv, x, folded=plan)
        F = _math.prod(plan.folds_out)
        h4 = h.reshape(h.shape[:-1] + (F, plan.cout))
        h4 = cx(self.bn, h4)
        h = h4.reshape(h.shape[:-1] + (F * plan.cout,))
        return act.hardswish(h)


class _FrameLSTMNet(Module):
    """Shared skeleton: batched frame CNN -> LSTM -> last-step classifier."""

    def __init__(self, feature_dim: int, hidden: int, layers: int,
                 num_classes: int):
        super().__init__()
        self.feature_dim = feature_dim
        self.lstm = LSTM(feature_dim, hidden, num_layers=layers)
        self.classifier = Dense(hidden, num_classes)

    def cnn(self, cx: Ctx, frames):
        raise NotImplementedError

    def forward(self, cx: Ctx, x, carry=None):
        """x: (B, T, H, W, C) -> (B, num_classes).

        Streaming (online) mode: pass ``carry`` — the per-layer LSTM
        (h, c) state from ``init_stream`` or a previous call — and the
        model processes x as the NEXT chunk of an ongoing clip, returning
        ``(logits, new_carry)``. The LSTM is inherently causal, so chunked
        evaluation equals the full pass exactly (tests/test_stream_2d.py);
        the reference has no online path for these models (it loops frames
        but always consumes whole clips, mobilenet.py:355-366)."""
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])
        feats = self.cnn(cx, frames)                 # (B*T, 1, 1, F) or (B*T,F)
        feats = feats.reshape(b, t, self.feature_dim)
        if carry is None:
            seq = cx(self.lstm, feats)               # (B, T, H)
            return cx(self.classifier, seq[:, -1, :])
        seq, carry = cx(self.lstm, feats, initial=carry, return_state=True)
        return cx(self.classifier, seq[:, -1, :]), carry

    def init_stream(self, batch: int):
        """Zero LSTM state for streaming: per-layer (h, c), host-side numpy
        (never touches the device at construction — see CLAUDE.md)."""
        import numpy as np
        shape = (self.lstm.num_layers, batch, self.lstm.hidden_size)
        return (np.zeros(shape, np.float32), np.zeros(shape, np.float32))


def _early_fold_plans_2d(small: bool):
    """Lane-fold plans for the 2D trunks (W-major, ops/folded.py) — the
    per-frame mirror of mobilenet3d's chains: the (B*T, H, W, C) frame batch
    carries the same C=16/24 early channels at 224²/112² and pays the same
    8x 128-lane padding; W phases pack into the channel minor (the in-fold
    is a pure reshape), H stays a plain conv dim. Folds halve across each
    stride-2 block. Channel tables match the 3D variants exactly
    (reference mobilenet.py:285-444 vs :133-265), so the measured 3D fold
    spans carry over as the defaults.

    Large2D: stem s2 -> b0 s1 -> b1 s2 -> b2 s1 (fold 16->8->8->4->4),
    unfold at C=24 @56² — or continue boundary-folded through block3 +
    block4[0] (fold_span='boundary').
    Small2D: stem s2 -> b0 s2 (SE, partial collapse to E=16) -> b1 s2 ->
    b2 s1 -> b3_0 s2 (SE k5, lands dense at fold 1).
    """
    from picklebot_tpu.ops.folded import folded_conv_map
    if small:
        return {
            "fold_in": (1, 16),
            "stem": folded_conv_map((3, 3), (2, 2), (1, 1),
                                    (1, 16), (1, 8), 3, 16),
            "b0": folded_conv_map((3, 3), (2, 2), (1, 1),
                                  (1, 8), (1, 4), 16, 16),    # SE -> E=16
            "b1": folded_conv_map((3, 3), (2, 2), (1, 1),
                                  (1, 4), (1, 2), 16, 24),
            "b2": folded_conv_map((3, 3), (1, 1), (1, 1),
                                  (1, 2), (1, 2), 24, 24),
            "b3_0": folded_conv_map((5, 5), (2, 2), (2, 2),
                                    (1, 2), (1, 1), 24, 96),  # SE -> E=96
        }
    return {
        "fold_in": (1, 16), "unfold": (1, 4),
        "stem": folded_conv_map((3, 3), (2, 2), (1, 1),
                                (1, 16), (1, 8), 3, 16),
        "b0": folded_conv_map((3, 3), (1, 1), (1, 1),
                              (1, 8), (1, 8), 16, 16),
        "b1": folded_conv_map((3, 3), (2, 2), (1, 1),
                              (1, 8), (1, 4), 16, 24),
        "b2": folded_conv_map((3, 3), (1, 1), (1, 1),
                              (1, 4), (1, 4), 24, 24),
    }


def _boundary_plans_2d_large():
    """fold_span='boundary' continuation: block3 + block4[0] run
    boundary-folded (canonical FLOPs, narrow C=24..80 boundaries packed),
    picking up from the collapsed block2's fold of 4 — same shape table as
    mobilenet3d._boundary_plans_large."""
    from picklebot_tpu.ops.folded import BoundaryFold
    return {
        "b3_0": BoundaryFold(4, 2, 24, 40),
        "b3_1": BoundaryFold(2, 2, 40, 40),
        "b3_2": BoundaryFold(2, 2, 40, 40),
        "b4_0": BoundaryFold(2, 1, 40, 80),
    }


class MobileNetLarge2D(_FrameLSTMNet):
    """Reference mobilenet.py:285-373."""

    FOLD_SPANS = ("block2", "boundary")

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False,
                 early_fold: bool = False, fold_span: str = "block2"):
        super().__init__(feature_dim=960, hidden=32, layers=5,
                         num_classes=num_classes)
        if fold_span not in self.FOLD_SPANS:
            raise ValueError(
                f"MobileNetLarge2D fold_span={fold_span!r} not recognized "
                f"(valid: {self.FOLD_SPANS})")
        self._fold_span = fold_span
        self._early_plans = _early_fold_plans_2d(False) if early_fold \
            else None
        B = Bottleneck2D
        relu = act.relu
        self.block1 = _ConvBNAct2D(3, 16, 3, stride=2, padding=1,
                                   space_to_depth=space_to_depth
                                   and not early_fold)
        self.block2 = Sequential(
            B(16, 16, 16, stride=1, nonlinearity=relu, dropout=0.2),
            B(16, 24, 64, stride=2, nonlinearity=relu),
            B(24, 24, 72, stride=1, nonlinearity=relu, dropout=0.2),
        )
        self.block3 = Sequential(
            B(24, 40, 72, stride=2, use_se=True, kernel_size=5,
              nonlinearity=relu, dropout=0.2),
            B(40, 40, 120, stride=1, use_se=True, kernel_size=5,
              nonlinearity=relu),
            B(40, 40, 120, stride=1, use_se=True, kernel_size=5,
              nonlinearity=relu, dropout=0.2),
        )
        self.block4 = Sequential(
            B(40, 80, 240, stride=2, dropout=0.2),
            B(80, 80, 240, stride=1),
            B(80, 80, 184, stride=1, dropout=0.2),
            B(80, 80, 184, stride=1),
            B(80, 112, 480, stride=1, use_se=True, dropout=0.2),
            B(112, 112, 672, stride=1, use_se=True, dropout=0.2),
        )
        self.block5 = Sequential(
            B(112, 160, 672, stride=2, use_se=True, kernel_size=5),
            B(160, 160, 960, stride=1, use_se=True, kernel_size=5),
            B(160, 160, 960, stride=1, use_se=True, kernel_size=5),
        )
        self.b6_conv = Conv2d(160, 960, 1)
        self.b6_bn = BatchNorm(960)
        self.b6_pool = AvgPool2d(7, 1)

    def cnn(self, cx: Ctx, x):
        if self._early_plans is not None:
            from picklebot_tpu.ops.folded import fold_nd, unfold_nd
            plans = self._early_plans
            z = fold_nd(x, plans["fold_in"])
            z = cx(self.block1, z, folded=plans["stem"])
            for i, key in enumerate(("b0", "b1", "b2")):
                z = cx(self.block2.layers[i], z, folded=plans[key])
            if self._fold_span == "boundary":
                bp = _boundary_plans_2d_large()
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
        x = act.hardswish(cx(self.b6_bn, cx(self.b6_conv, x)))
        return cx(self.b6_pool, x)


class MobileNetSmall2D(_FrameLSTMNet):
    """Reference mobilenet.py:378-444."""

    FOLD_SPANS = ("block3", "boundary")

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False,
                 early_fold: bool = False, fold_span: str = "block3"):
        super().__init__(feature_dim=576, hidden=64, layers=1,
                         num_classes=num_classes)
        # "block3": block3[0] joins the dense collapse chain; "boundary":
        # it runs boundary-folded (its k5/E=96 collapse carries ~15x
        # structural zeros) — same trade as MobileNetSmall3D
        if fold_span not in self.FOLD_SPANS:
            raise ValueError(
                f"MobileNetSmall2D fold_span={fold_span!r} not recognized "
                f"(valid: {self.FOLD_SPANS})")
        self._fold_span = fold_span
        self._early_plans = _early_fold_plans_2d(True) if early_fold \
            else None
        B = Bottleneck2D
        relu = act.relu
        self.block1 = _ConvBNAct2D(3, 16, 3, stride=2, padding=1,
                                   space_to_depth=space_to_depth
                                   and not early_fold)
        self.block2 = Sequential(
            B(16, 16, 16, stride=2, use_se=True, nonlinearity=relu,
              dropout=0.2),
            B(16, 24, 72, stride=2, nonlinearity=relu, dropout=0.2),
            B(24, 24, 88, stride=1, nonlinearity=relu, dropout=0.2),
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
        from picklebot_tpu.ops.se import SEBlock
        self.b4_conv = Conv2d(96, 576, 1)
        self.b4_se = SEBlock(576)
        self.b4_bn = BatchNorm(576)
        self.b4_pool = AvgPool2d(7, 1)

    def cnn(self, cx: Ctx, x):
        if self._early_plans is not None:
            from picklebot_tpu.ops.folded import BoundaryFold, fold_nd
            plans = self._early_plans
            z = fold_nd(x, plans["fold_in"])
            z = cx(self.block1, z, folded=plans["stem"])
            for i, key in enumerate(("b0", "b1", "b2")):
                z = cx(self.block2.layers[i], z, folded=plans[key])
            # block3[0] lands at fold 1: output is the dense layout
            if self._fold_span == "boundary":
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
        x = act.hardswish(cx(self.b4_bn, cx(self.b4_se, cx(self.b4_conv,
                                                           x))))
        return cx(self.b4_pool, x)
