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

    def forward(self, cx: Ctx, x):
        return act.hardswish(cx(self.bn, cx(self.conv, x)))


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

    def forward(self, cx: Ctx, x):
        """x: (B, T, H, W, C) -> (B, num_classes)."""
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])
        feats = self.cnn(cx, frames)                 # (B*T, 1, 1, F) or (B*T,F)
        feats = feats.reshape(b, t, self.feature_dim)
        seq = cx(self.lstm, feats)                   # (B, T, H)
        return cx(self.classifier, seq[:, -1, :])


class MobileNetLarge2D(_FrameLSTMNet):
    """Reference mobilenet.py:285-373."""

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False):
        super().__init__(feature_dim=960, hidden=32, layers=5,
                         num_classes=num_classes)
        B = Bottleneck2D
        relu = act.relu
        self.block1 = _ConvBNAct2D(3, 16, 3, stride=2, padding=1,
                                   space_to_depth=space_to_depth)
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
        x = cx(self.block1, x)
        x = cx(self.block2, x)
        x = cx(self.block3, x)
        x = cx(self.block4, x)
        x = cx(self.block5, x)
        x = act.hardswish(cx(self.b6_bn, cx(self.b6_conv, x)))
        return cx(self.b6_pool, x)


class MobileNetSmall2D(_FrameLSTMNet):
    """Reference mobilenet.py:378-444."""

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False):
        super().__init__(feature_dim=576, hidden=64, layers=1,
                         num_classes=num_classes)
        B = Bottleneck2D
        relu = act.relu
        self.block1 = _ConvBNAct2D(3, 16, 3, stride=2, padding=1,
                                   space_to_depth=space_to_depth)
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
        x = cx(self.block1, x)
        x = cx(self.block2, x)
        x = cx(self.block3, x)
        x = act.hardswish(cx(self.b4_bn, cx(self.b4_se, cx(self.b4_conv,
                                                           x))))
        return cx(self.b4_pool, x)
