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

    def forward(self, cx: Ctx, x):
        return self.nonlinearity(cx(self.bn, cx(self.conv, x)))


class MobileNetLarge3D(Module):
    """Reference mobilenet.py:133-201."""

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False):
        super().__init__()
        self.num_classes = num_classes
        B = Bottleneck3D
        relu = act.relu

        self.block1 = _ConvBNAct(3, 16, 3, stride=2, padding=1,
                                 space_to_depth=space_to_depth)
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

    def forward(self, cx: Ctx, x):
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
