"""MoViNet-A2 video classifier — offline (clip) and streaming (online) modes.

Offline parity with reference movinet.py:80-165: stem (1,3,3)/s(1,2,2) →
26 bottlenecks (expand → per-axis-kernel depthwise → SE → project → BN →
hardswish) → 1x1 conv to 640 → pool → 2048-dim head with BatchNorm1d.
Every block passes explicit symmetric padding, so shapes match torch exactly.
Parameter count 3,992,289 at num_classes=13 (verified in tests).

Streaming mode implements what the reference only scaffolds (its CausalConv3d
+ stream_buffer, movinet.py:7-39,87-88, is defined but never wired in): all
temporal convs become causal, their left context carried as explicit state,
so arbitrarily long video runs frame-chunk-by-frame-chunk through
``lax.scan``/repeated calls with O(1) memory — true online pitch calling.
Note the weights are shared with offline mode but padding semantics differ
(causal vs symmetric), so streaming is a capability extension, not a
logit-parity mode; cumulative global-average-pooling replaces clip pooling.

Init parity: kaiming_uniform(fan_in, relu) convs, zero biases, BN ones/zeros,
xavier_uniform linear (reference movinet.py:167-179 — this one is real).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module, Sequential
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.conv import CausalConv3d, Conv3d
from picklebot_tpu.ops.linear import ChannelDropout, Dense, Dropout, GlobalAvgPool
from picklebot_tpu.ops.norm import BatchNorm
from picklebot_tpu.ops.se import SEBlock

_CONV_INIT = pinit.kaiming_uniform(mode="fan_in", nonlinearity="relu")
_LINEAR_INIT = pinit.xavier_uniform()
_ZEROS = pinit.zeros()


class MoviNetBottleneck(Module):
    """Reference movinet.py:43-77. ``causal=True`` switches the depthwise
    conv's temporal padding to buffered-causal for streaming."""

    def __init__(self, in_channels, out_channels, expanded_channels,
                 kernel_size, stride=(1, 1, 1), padding=None,
                 use_se: bool = True, causal: bool = False):
        super().__init__()
        self.causal = causal
        self.expand = Conv3d(in_channels, expanded_channels, 1, bias=False,
                             w_init=_CONV_INIT)
        kt, kh, kw = kernel_size
        if causal:
            self.conv = CausalConv3d(expanded_channels, expanded_channels,
                                     kernel_size, stride=stride,
                                     groups=expanded_channels, bias=False,
                                     w_init=_CONV_INIT)
        else:
            pad = padding if padding is not None else (kt - 1, kh // 2, kw // 2)
            self.conv = Conv3d(expanded_channels, expanded_channels,
                               kernel_size, stride=stride, padding=pad,
                               groups=expanded_channels, bias=False,
                               w_init=_CONV_INIT)
        self.squeeze_excite = SEBlock(expanded_channels) if use_se else None
        self.project = Conv3d(expanded_channels, out_channels, 1, bias=False,
                              w_init=_CONV_INIT)
        self.batchnorm = BatchNorm(out_channels)

    def forward(self, cx: Ctx, x, buffer=None, folded=None):
        if folded is not None:
            from picklebot_tpu.ops.folded import BoundaryFold
            assert not self.causal, "folded path is offline-only"
            if isinstance(folded, BoundaryFold):
                return self._forward_boundary(cx, x, folded)
            return self._forward_folded(cx, x, folded)
        x = cx(self.expand, x)
        if self.causal:
            x, new_buffer = cx(self.conv, x, buffer)
        else:
            x = cx(self.conv, x)
            new_buffer = None
        if self.squeeze_excite is not None:
            x = cx(self.squeeze_excite, x)
        x = cx(self.project, x)
        x = cx(self.batchnorm, x)
        x = act.hardswish(x)
        if self.causal:
            return x, new_buffer
        return x

    def _forward_boundary(self, cx: Ctx, x, plan):
        """Boundary-folded execution (ops/folded.BoundaryFold): narrow
        input/output stay W-folded, expand is a per-phase matmul, the
        depthwise conv + SE run the standard modules on the canonical
        expanded layout (W-major fold<->unfold is a pure reshape), the
        projection refolds. Exactly canonical FLOPs — the right mode for
        A2's C=40..72 blocks whose temporal-kernel dense collapse measured
        uncompilable (docs/BENCH.md)."""
        p = cx.params
        dt = cx.policy.compute_dtype
        F, F2 = plan.f_in, plan.f_out
        w1 = p["expand"]["w"][0, 0, 0].astype(dt)     # (cin, E)
        w2 = p["project"]["w"][0, 0, 0].astype(dt)    # (E, cout)
        h6 = x.astype(dt).reshape(x.shape[:-1] + (F, plan.cin))
        h6 = jnp.einsum("...fc,ce->...fe", h6, w1)
        E = h6.shape[-1]
        h = h6.reshape(h6.shape[:-3] + (h6.shape[-3] * F, E))
        h = cx(self.conv, h)
        if self.squeeze_excite is not None:
            h = cx(self.squeeze_excite, h)
        h6 = h.reshape(h.shape[:-2] + (h.shape[-2] // F2, F2, E))
        h6 = jnp.einsum("...fe,eo->...fo", h6, w2)
        h6 = cx(self.batchnorm, h6)
        h6 = act.hardswish(h6)
        return h6.reshape(h6.shape[:-2] + (F2 * h6.shape[-1],))

    def _forward_folded(self, cx: Ctx, x, plan):
        """Lane-folded execution (ops/folded.py; plan maps cin -> E).

        Expand and depthwise collapse into one folded dense conv — the
        reference applies no norm or nonlinearity between them
        (movinet.py:43-77) — then SE runs the STANDARD module on a
        (..., F, E) reshape (its global pool reduces every axis but the
        last, so pooling over phases averages exactly the canonical element
        set per channel), the projection is a per-phase matmul (1x1 convs
        never mix phases), and BN runs on the (..., F, C) reshape.
        Exactness vs the plain path is golden-tested."""
        import math as _math
        from jax import lax
        from picklebot_tpu.ops.folded import gather_weights

        p = cx.params
        w1 = p["expand"]["w"]      # (1,1,1, cin, E)
        wdw = p["conv"]["w"]       # (kt,kh,kw, 1, E)
        w2 = p["project"]["w"]     # (1,1,1, E, cout)
        assert plan.cout == w1.shape[-1], "plan must map cin -> E"
        dt = cx.policy.compute_dtype
        # collapse in f32 (params dtype), cast once after the gather
        wc = jnp.einsum("ie,thwe->thwie", w1[0, 0, 0], wdw[:, :, :, 0])
        wf = gather_weights(plan, wc).astype(dt)
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, x.shape[-1]), wf.shape, ("NTHWC", "THWIO", "NTHWC"))
        h = lax.conv_general_dilated(
            x.astype(dt), wf, plan.strides, list(plan.pads),
            dimension_numbers=dn)
        F = _math.prod(plan.folds_out)
        h6 = h.reshape(h.shape[:-1] + (F, plan.cout))
        if self.squeeze_excite is not None:
            h6 = cx(self.squeeze_excite, h6)
        h6 = jnp.einsum("...fe,eo->...fo", h6, w2[0, 0, 0].astype(dt))
        h6 = cx(self.batchnorm, h6)
        h6 = act.hardswish(h6)
        return h6.reshape(h6.shape[:-2] + (F * h6.shape[-1],))


def _a2_blocks(causal: bool):
    """The A2 stage table (reference movinet.py:98-137)."""
    B = lambda *a, **k: MoviNetBottleneck(*a, causal=causal, **k)
    blocks2 = [
        B(16, 16, 40, (1, 5, 5), (1, 2, 2), (0, 2, 2)),
        B(16, 16, 40, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(16, 16, 64, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ]
    blocks3 = [
        B(16, 40, 96, (3, 3, 3), (1, 2, 2), (1, 1, 1)),
        B(40, 40, 120, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(40, 40, 96, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(40, 40, 96, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(40, 40, 120, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ]
    blocks4 = [
        B(40, 72, 240, (5, 3, 3), (1, 2, 2), (2, 1, 1)),
        B(72, 72, 160, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(72, 72, 240, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(72, 72, 192, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(72, 72, 240, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ]
    blocks5 = [
        B(72, 72, 240, (5, 3, 3), (1, 1, 1), (2, 1, 1)),
        B(72, 72, 240, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(72, 72, 240, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(72, 72, 240, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(72, 72, 144, (1, 5, 5), (1, 1, 1), (0, 2, 2)),
        B(72, 72, 240, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ]
    blocks6 = [
        B(72, 144, 480, (5, 3, 3), (1, 2, 2), (2, 1, 1)),
        B(144, 144, 384, (1, 5, 5), (1, 1, 1), (0, 2, 2)),
        B(144, 144, 384, (1, 5, 5), (1, 1, 1), (0, 2, 2)),
        B(144, 144, 480, (1, 5, 5), (1, 1, 1), (0, 2, 2)),
        B(144, 144, 480, (1, 5, 5), (1, 1, 1), (0, 2, 2)),
        B(144, 144, 480, (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        B(144, 144, 576, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
    ]
    return blocks2, blocks3, blocks4, blocks5, blocks6


def _early_fold_plans_a2():
    """A2 lane-fold chain (W-major; see ops/folded.py): the stride-(1,2,2)
    stem/blocks2[0]/blocks3[0] halve the W fold 8 -> 4 -> 2; blocks4[0]
    lands at fold 1 (dense, C=72). Every MoviNetBottleneck carries SE, so
    block plans map cin -> expanded channels (partial collapse)."""
    from picklebot_tpu.ops.folded import folded_conv_map
    return {
        "fold_in": (1, 1, 16),
        "stem": folded_conv_map((1, 3, 3), (1, 2, 2), (0, 1, 1),
                                (1, 1, 16), (1, 1, 8), 3, 16),
        "b2_0": folded_conv_map((1, 5, 5), (1, 2, 2), (0, 2, 2),
                                (1, 1, 8), (1, 1, 4), 16, 40),
        "b2_1": folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                (1, 1, 4), (1, 1, 4), 16, 40),
        "b2_2": folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                (1, 1, 4), (1, 1, 4), 16, 64),
        "b3_0": folded_conv_map((3, 3, 3), (1, 2, 2), (1, 1, 1),
                                (1, 1, 4), (1, 1, 2), 16, 96),
        "b3_1": folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                (1, 1, 2), (1, 1, 2), 40, 120),
        "b3_2": folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                (1, 1, 2), (1, 1, 2), 40, 96),
        "b3_3": folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                (1, 1, 2), (1, 1, 2), 40, 96),
        "b3_4": folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                (1, 1, 2), (1, 1, 2), 40, 120),
        "b4_0": folded_conv_map((5, 3, 3), (1, 2, 2), (2, 1, 1),
                                (1, 1, 2), (1, 1, 1), 40, 240),
    }


class MoViNetA2(Module):
    """Offline clip classifier (reference movinet.py:80-165)."""

    FOLD_SPANS = ("block2", "block4", "boundary", "stem")

    def __init__(self, num_classes: int = 2, causal: bool = False,
                 space_to_depth: bool = False, early_fold: bool = False,
                 fold_span: str = "block2"):
        super().__init__()
        self.num_classes = num_classes
        self.causal = causal
        # default span block2 (stem + the three C=16 bottlenecks): the full
        # chain's temporal-kernel collapses (k=(3,3,3)/(5,3,3), 30-40x MAC
        # inflation) did not finish a 25-min v5e compile — see docs/BENCH.md
        if fold_span not in self.FOLD_SPANS:
            raise ValueError(
                f"MoViNetA2 fold_span={fold_span!r} not recognized "
                f"(valid: {self.FOLD_SPANS})")
        self._fold_span = fold_span
        self._early_plans = (_early_fold_plans_a2()
                             if early_fold and not causal else None)

        self.stem_conv = Conv3d(3, 16, (1, 3, 3), stride=(1, 2, 2),
                                padding=(0, 1, 1), bias=False,
                                w_init=_CONV_INIT,
                                space_to_depth=space_to_depth
                                and not early_fold)
        self.stem_bn = BatchNorm(16)

        b2, b3, b4, b5, b6 = _a2_blocks(causal)
        self.block2 = Sequential(*b2)
        self.block3 = Sequential(*b3)
        self.block4 = Sequential(*b4)
        self.block5 = Sequential(*b5)
        self.block6 = Sequential(*b6)

        self.head_conv = Conv3d(144, 640, 1, bias=False, w_init=_CONV_INIT)
        self.head_bn = BatchNorm(640)
        self.head_dropout = ChannelDropout(0.2)
        self.pool = GlobalAvgPool()
        self.fc1 = Dense(640, 2048, w_init=_LINEAR_INIT, b_init=_ZEROS)
        self.fc1_bn = BatchNorm(2048)
        self.fc_dropout = Dropout(0.2)
        self.fc2 = Dense(2048, num_classes, w_init=_LINEAR_INIT,
                         b_init=_ZEROS)

    def _stages(self):
        return [self.block2, self.block3, self.block4, self.block5,
                self.block6]

    def forward(self, cx: Ctx, x):
        if self._early_plans is not None:
            import math as _math
            from picklebot_tpu.ops.folded import fold_nd
            plans = self._early_plans
            z = fold_nd(x, plans["fold_in"])
            z = cx(self.stem_conv, z, folded=plans["stem"])
            F = _math.prod(plans["stem"].folds_out)
            z6 = cx(self.stem_bn, z.reshape(z.shape[:-1] + (F, 16)))
            z = act.hardswish(z6).reshape(z.shape)
            if self._fold_span == "stem":
                # stem-only span: unfold (W-major -> pure reshape) and run
                # every bottleneck canonically — isolates the folded-conv
                # codegen wall to the stem (docs/BENCH.md MoViNet section)
                from picklebot_tpu.ops.folded import unfold_nd
                x = unfold_nd(z, (1, 1, 8), 16)
                for stage in self._stages():
                    x = cx(stage, x)
                return self._head(cx, x)
            for i, key in enumerate(("b2_0", "b2_1", "b2_2")):
                z = cx(self.block2.layers[i], z, folded=plans[key])
            if self._fold_span == "block4":
                for i, key in enumerate(("b3_0", "b3_1", "b3_2", "b3_3",
                                         "b3_4")):
                    z = cx(self.block3.layers[i], z, folded=plans[key])
                # blocks4[0] lands at fold 1: output is the dense layout
                x = cx(self.block4.layers[0], z, folded=plans["b4_0"])
                for layer in self.block4.layers[1:]:
                    x = cx(layer, x)
                stages = (self.block5, self.block6)
            elif self._fold_span == "boundary":
                from picklebot_tpu.ops.folded import BoundaryFold
                bp = [BoundaryFold(4, 2, 16, 40)] + \
                    [BoundaryFold(2, 2, 40, 40)] * 4
                for i in range(5):
                    z = cx(self.block3.layers[i], z, folded=bp[i])
                x = cx(self.block4.layers[0], z,
                       folded=BoundaryFold(2, 1, 40, 72))
                for layer in self.block4.layers[1:]:
                    x = cx(layer, x)
                stages = (self.block5, self.block6)
            else:
                from picklebot_tpu.ops.folded import unfold_nd
                x = unfold_nd(z, (1, 1, 4), 16)
                stages = (self.block3, self.block4, self.block5, self.block6)
            for stage in stages:
                x = cx(stage, x)
        else:
            x = act.hardswish(cx(self.stem_bn, cx(self.stem_conv, x)))
            for stage in self._stages():
                x = cx(stage, x)
        return self._head(cx, x)

    def _head(self, cx: Ctx, x):
        """The shared classifier head: head conv -> dropout -> global pool
        (B, 640) -> fc1 -> dropout -> fc2. One implementation for both
        forward exits (the stream variant re-orders only the pool, which
        is cumulative there)."""
        x = act.hardswish(cx(self.head_bn, cx(self.head_conv, x)))
        x = cx(self.head_dropout, x)
        x = cx(self.pool, x)                              # (B, 640)
        x = act.hardswish(cx(self.fc1_bn, cx(self.fc1, x)))
        x = cx(self.fc_dropout, x)
        return cx(self.fc2, x)


class MoViNetA2Stream(Module):
    """Online frame-chunk inference with carried stream buffers.

    Usage:
        model = MoViNetA2Stream(num_classes)
        variables = model.init(key)                      # or convert weights
        carry = model.init_stream(batch, h, w)           # zeros buffers
        for chunk in clips_of_shape(B, t_chunk, H, W, C):
            logits, carry = model.apply(variables, chunk, carry)[0]

    ``carry = (buffers, (pooled_sum, frame_count))``: temporal conv left
    contexts for every causal block plus a cumulative average pool, so logits
    after the last chunk equal a full causal clip pass. Spatial dims must be
    fixed per stream (static shapes under jit).
    """

    def __init__(self, num_classes: int = 2, space_to_depth: bool = False):
        super().__init__()
        self.net = MoViNetA2(num_classes, causal=True,
                             space_to_depth=space_to_depth)

    def _causal_blocks(self):
        for stage in self.net._stages():
            for block in stage:
                yield block

    def init_stream(self, batch: int, height: int, width: int,
                    dtype=jnp.float32):
        """Zero stream buffers for input frames of (height, width)."""
        # stem conv k3 p1 s2: out = ceil(h/2) (floor would mis-size buffers
        # for odd inputs)
        h, w = -(-height // 2), -(-width // 2)
        # host numpy, NOT jnp: ~28 jnp.zeros here = one tiny device RPC
        # per buffer through the remote-TPU tunnel (CLAUDE.md); the first
        # apply commits them in one transfer anyway (same convention as
        # _FrameLSTMNet.init_stream). jnp only for a SYMBOLIC batch dim
        # (jax.export lowering — export.py calls this inside the trace,
        # where numpy cannot size the array).
        zeros = (np.zeros if isinstance(batch, (int, np.integer))
                 else jnp.zeros)
        buffers = []
        for block in self._causal_blocks():
            conv = block.conv
            c = conv.conv.in_channels
            tctx = conv.t_context
            buffers.append(zeros((batch, tctx, h, w, c), dtype))
            st = conv.conv.stride
            h = -(-h // st[1])
            w = -(-w // st[2])
        pooled = (zeros((batch, 640), np.float32),
                  zeros((), np.float32))
        return tuple(buffers), pooled

    def forward(self, cx: Ctx, x, carry):
        buffers, (pool_sum, count) = carry
        net = self.net
        sub = Ctx(net, cx.params.get("net"), cx.state.get("net"), cx.train,
                  cx.rng, cx.policy)
        x = act.hardswish(sub(net.stem_bn, sub(net.stem_conv, x)))
        new_buffers = []
        i = 0
        for stage in net._stages():
            stage_cx = Ctx(stage, sub.params.get(stage_name := net._child_name(stage)),
                           sub.state.get(stage_name), cx.train, None, cx.policy)
            for j in range(len(stage.layers)):
                block = stage.layers[j]
                x, nb = stage_cx(block, x, buffers[i])
                new_buffers.append(nb)
                i += 1
            if stage_cx.collected_state() is not None:
                sub.new_state[stage_name] = stage_cx.collected_state()
        x = act.hardswish(sub(net.head_bn, sub(net.head_conv, x)))
        # same head regularization as the offline forward (_head): in eval
        # mode both dropouts no-op, so serving is unchanged — this keeps
        # TRAIN-mode outputs (fine-tuning through the stream path) from
        # silently diverging
        x = sub(net.head_dropout, x)
        # cumulative causal average-pool over all frames seen so far
        t = x.shape[1]
        frame_feats = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # (B,T,C)
        pool_sum = pool_sum + jnp.sum(frame_feats, axis=1)
        count = count + t
        pooled = (pool_sum / count).astype(x.dtype)
        y = act.hardswish(sub(net.fc1_bn, sub(net.fc1, pooled)))
        y = sub(net.fc_dropout, y)
        logits = sub(net.fc2, y)
        if sub.collected_state() is not None:
            cx.new_state["net"] = sub.collected_state()
        return logits, (tuple(new_buffers), (pool_sum, count))
