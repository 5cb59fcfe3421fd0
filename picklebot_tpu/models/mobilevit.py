"""MobileViT V1 for video (3D): local convs + unfold→transformer→fold.

Architecture parity with reference mobilevit.py:107-215: s2 conv stem →
4 Bottleneck3D → 3 trunk stages of (Bottleneck3D s2 + MobileViTBlock) →
1x1 conv → global mean → linear head. Each MobileViTBlock pads (T, H, W) to
multiples of the (2, 2, 2) patch, regroups into 8 patch-position sequences of
t·h·w tokens, runs a pre-LN transformer (8 heads × 16 dim_head), folds back,
crops, and fuses with a concat conv.

Known reference bug, intentionally diverged: the committed flash-attention
path never merges heads before the output projection (mobilevit.py:82-85 —
it crashes at runtime); we implement the evident intent, the head-merge from
profiling_mobilevit.py:102. Parity tests patch the reference accordingly.

Faithful quirks kept: the transformer's FeedForward has NO pre-norm (only
Attention normalizes, mobilevit.py:100-103); conv_nxn_bn uses padding=1
regardless of kernel size and its BatchNorm is affine=False
(mobilevit.py:12-24); stride-2 stem convs halve T as well.

Channels-last throughout; the unfold/fold are einops rearranges that XLA
lowers to transposes/reshapes fused around the attention matmuls. The
attention itself can run on the first-party Pallas flash kernel
(attention_backend='pallas'|'auto') — stage-1 sequences reach thousands of
tokens at full clip sizes, exactly the flash regime.

Init parity: every conv/dense weight ~ N(0, 0.02²), biases zero
(reference mobilevit.py:207-215); BN stays at defaults.

Param counts (verified in tests): xxs 2,030,368 / xs 3,483,984 / s 8,453,136.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from einops import rearrange

from picklebot_tpu.core import initializers as pinit
from picklebot_tpu.core.module import Ctx, Module, ModuleList, Sequential
from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.attention import MultiHeadAttention
from picklebot_tpu.ops.bottleneck import Bottleneck3D
from picklebot_tpu.ops.conv import Conv3d
from picklebot_tpu.ops.linear import Dense, Dropout
from picklebot_tpu.ops.norm import BatchNorm

_W_INIT = pinit.normal(std=0.02)
_ZEROS = pinit.zeros()


class _ConvBNSiLU(Module):
    """conv_1x1_bn / conv_nxn_bn (reference mobilevit.py:12-24):
    conv (bias=False) + BatchNorm(affine=False) + SiLU. nxn keeps the
    reference's fixed padding=1."""

    def __init__(self, cin, cout, kernel_size=1, stride=1, padding=0,
                 space_to_depth=False):
        super().__init__()
        self.conv = Conv3d(cin, cout, kernel_size, stride=stride,
                           padding=padding, bias=False, w_init=_W_INIT,
                           space_to_depth=space_to_depth)
        self.bn = BatchNorm(cout, affine=False)

    def forward(self, cx: Ctx, x, folded=None):
        if folded is not None:
            # lane-folded execution (ops/folded.py): conv via gathered
            # canonical weights; BN is the standard module on a (..., F, C)
            # reshape (same stats/state); SiLU is elementwise. Exact.
            import math as _math
            h = cx(self.conv, x, folded=folded)
            F = _math.prod(folded.folds_out)
            h6 = cx(self.bn, h.reshape(h.shape[:-1] + (F, folded.cout)))
            return act.silu(h6).reshape(h.shape)
        return act.silu(cx(self.bn, cx(self.conv, x)))


def conv_1x1_bn(cin, cout):
    return _ConvBNSiLU(cin, cout, 1, 1, 0)


def conv_nxn_bn(cin, cout, kernel_size=3, stride=1, space_to_depth=False):
    return _ConvBNSiLU(cin, cout, kernel_size, stride, 1,
                       space_to_depth=space_to_depth)


import jax

# Megatron f/g boundary operators (hoisted to parallel/megatron.py in round
# 3 so the MoE expert bank, ops/moe.py, shares them over the 'expert' axis)
from picklebot_tpu.parallel.megatron import (tp_copy_in as _tp_copy_in,
                                             tp_reduce_out as _tp_reduce_out)


class FeedForward(Module):
    """reference mobilevit.py:28-40 — note: no pre-norm.

    Tensor-parallel aware (Megatron MLP pattern): setting ``model_axis``
    REQUIRES running inside a shard_map whose param specs shard fc1
    column-wise (P(None, axis)) and fc2 row-wise (P(axis, None)). The
    f/g custom-VJP operators above give exact forward AND backward
    semantics: partial outputs psum forward with identity backward, and the
    residual-stream cotangent psums backward with identity forward."""

    def __init__(self, embed_dim, hidden_dim, dropout=0.0, model_axis=None):
        super().__init__()
        self.model_axis = model_axis
        self.fc1 = Dense(embed_dim, hidden_dim, bias=False, w_init=_W_INIT)
        self.drop1 = Dropout(dropout)
        self.fc2 = Dense(hidden_dim, embed_dim, bias=False, w_init=_W_INIT)
        self.drop2 = Dropout(dropout)

    def forward(self, cx: Ctx, x):
        if self.model_axis is not None:
            x = _tp_copy_in(x, self.model_axis)
        x = cx(self.drop1, act.silu(cx(self.fc1, x)))
        x = cx(self.fc2, x)
        if self.model_axis is not None:
            x = _tp_reduce_out(x, self.model_axis)
        return cx(self.drop2, x)


class MobileViTBlock(Module):
    """reference mobilevit.py:107-143."""

    def __init__(self, embed_dim, depth, channel, kernel_size=3,
                 patch_size=(2, 2, 2), ffw_dim=None, dropout=0.0,
                 backend="auto", model_axis=None, sequence_axis=None,
                 pipeline_axis=None, pipeline_microbatches=None,
                 moe_experts=0, moe_top_k=2, moe_capacity_factor=1.25,
                 expert_axis=None, moe_dispatch="replicated"):
        super().__init__()
        self.pt, self.ph, self.pw = patch_size
        self.conv1 = conv_nxn_bn(channel, channel, kernel_size)
        self.conv2 = conv_1x1_bn(channel, embed_dim)
        self.transformer = TransformerStack(embed_dim, depth, 8, 16, ffw_dim,
                                            dropout, backend, model_axis,
                                            sequence_axis, pipeline_axis,
                                            pipeline_microbatches,
                                            moe_experts, moe_top_k,
                                            moe_capacity_factor, expert_axis,
                                            moe_dispatch)
        self.conv3 = conv_1x1_bn(embed_dim, channel)
        self.conv4 = conv_nxn_bn(2 * channel, channel, kernel_size)

    def forward(self, cx: Ctx, x):
        y = x
        x = cx(self.conv1, x)
        x = cx(self.conv2, x)
        _, t, h, w, _ = x.shape
        t_pad = (self.pt - t % self.pt) % self.pt
        h_pad = (self.ph - h % self.ph) % self.ph
        w_pad = (self.pw - w % self.pw) % self.pw
        if t_pad or h_pad or w_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad), (0, h_pad), (0, w_pad),
                            (0, 0)))
        # unfold: (B, T, H, W, D) -> (B, pt*ph*pw, t*h*w, D)
        x = rearrange(x, "b (t pt) (h ph) (w pw) d -> b (pt ph pw) (t h w) d",
                      pt=self.pt, ph=self.ph, pw=self.pw)
        x = cx(self.transformer, x)
        x = rearrange(x, "b (pt ph pw) (t h w) d -> b (t pt) (h ph) (w pw) d",
                      pt=self.pt, ph=self.ph, pw=self.pw,
                      t=(t + t_pad) // self.pt, h=(h + h_pad) // self.ph,
                      w=(w + w_pad) // self.pw)
        x = x[:, :t, :h, :w, :]
        x = cx(self.conv3, x)
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
        return cx(self.conv4, x)


class TransformerStack(Module):
    """Depth × (pre-LN attention + residual, FF + residual).

    Sequence parallelism (``sequence_axis``): the stack's token axis is
    scattered over the mesh axis at entry and gathered at exit
    (parallel/sequence.py boundary operators — exact forward and backward);
    attention becomes ring attention over the shard; LayerNorm, FFN,
    residuals and dropout are per-token, so they run unchanged on the
    local block. Every parameter consumed inside the region is wrapped
    with sp_sync_param (psum-backward) so replicated (and TP-sharded)
    weights see the full-token gradient. Composes with tensor parallelism
    on a *different* axis (the FFN psum then mixes same-token partials
    within a 'seq' group). Engages only when the token count divides the
    axis size; otherwise the stack runs replicated — still correct, just
    not sharded (the wrap is skipped too, keeping gradients exact).

    Pipeline parallelism (``pipeline_axis``): the depth dimension splits
    into axis-size consecutive stages run as a GPipe microbatch pipeline
    (parallel/pipeline.py) — one lax.scan of ticks with ppermute stage
    hops. Engages when the axis size divides the depth AND the per-device
    batch divides ``pipeline_microbatches``; otherwise the plain layer
    loop runs (correct, just not pipelined). Composes with SP (tokens
    scatter first; ring attention runs inside each tick) and TP — all
    three axes must be distinct."""

    def __init__(self, embed_dim, depth, heads, dim_head, ffw_dim,
                 dropout=0.0, backend="auto", model_axis=None,
                 sequence_axis=None, pipeline_axis=None,
                 pipeline_microbatches=None, moe_experts=0, moe_top_k=2,
                 moe_capacity_factor=1.25, expert_axis=None,
                 moe_dispatch="replicated"):
        super().__init__()
        if sequence_axis is not None and sequence_axis == model_axis:
            raise ValueError(
                "sequence_axis and model_axis must be distinct mesh axes: "
                "token-sharded FFN inputs with hidden-sharded weights would "
                "psum partials of different token blocks together")
        if pipeline_axis is not None and pipeline_axis in (model_axis,
                                                           sequence_axis):
            raise ValueError(
                "pipeline_axis must be distinct from model_axis and "
                "sequence_axis: a stage hop over a TP/SP axis would rotate "
                "activations between ranks holding different weight/token "
                "shards")
        if moe_experts and (model_axis or sequence_axis or pipeline_axis):
            raise ValueError(
                "moe_experts composes with DP and expert parallelism only: "
                "TP shards the dense FFN the MoE replaces, SP would change "
                "routing/capacity semantics per token shard, and PP's "
                "stacked-stage params drop the aux-loss state channel")
        self.sequence_axis = sequence_axis
        self.pipeline_axis = pipeline_axis
        self.pipeline_microbatches = pipeline_microbatches
        self.attns = ModuleList([
            MultiHeadAttention(embed_dim, heads, dim_head, dropout,
                               backend=backend, sequence_axis=sequence_axis)
            for _ in range(depth)])
        if moe_experts:
            from picklebot_tpu.ops.moe import MoEFeedForward
            self.ffs = ModuleList([
                MoEFeedForward(embed_dim, ffw_dim, moe_experts, moe_top_k,
                               moe_capacity_factor, dropout,
                               expert_axis=expert_axis,
                               dispatch=moe_dispatch)
                for _ in range(depth)])
        else:
            self.ffs = ModuleList([
                FeedForward(embed_dim, ffw_dim, dropout,
                            model_axis=model_axis)
                for _ in range(depth)])

    def forward(self, cx: Ctx, x):
        axis = self.sequence_axis
        sp = False
        if axis is not None:
            size = jax.lax.axis_size(axis)
            sp = size > 1 and x.shape[-2] % size == 0
        pp_axis = self.pipeline_axis
        pp, n_micro = False, 0
        if pp_axis is not None:
            n_stages = jax.lax.axis_size(pp_axis)
            n_micro = self.pipeline_microbatches or n_stages
            pp = (n_stages > 1 and len(self.attns) % n_stages == 0
                  and x.shape[0] % n_micro == 0)
        if sp:
            from picklebot_tpu.parallel.sequence import (sp_gather_tokens,
                                                         sp_scatter_tokens,
                                                         sp_wrap_params)
            cx.params = sp_wrap_params(cx.params, axis)
            if cx.rng is not None:
                # per-rank dropout masks over the local token block
                # (divergence from the unsharded rng stream, like DP's
                # per-replica fold_in — masks stay independent per token)
                cx.rng = jax.random.fold_in(cx.rng,
                                            jax.lax.axis_index(axis))
            x = sp_scatter_tokens(x, axis)
        if pp:
            x = self._pipelined(cx, x, pp_axis, n_micro, sp)
        else:
            for i in range(len(self.attns)):
                x = cx(self.attns[i], x, sp_active=sp) + x
                x = cx(self.ffs[i], x) + x
        if sp:
            x = sp_gather_tokens(x, axis)
        return x

    def _pipelined(self, cx: Ctx, x, pp_axis, n_micro, sp):
        """GPipe schedule over the depth (parallel/pipeline.py): stack the
        homogeneous per-layer param trees, slice this rank's stage, scan
        ticks. Every leaf gets the identity-fwd/psum-bwd wrap so each
        stage's layer gradients (nonzero only on the rank that ran them)
        sum to the full gradient on every 'pipe' rank."""
        from picklebot_tpu.parallel.pipeline import (gpipe_apply,
                                                     pp_wrap_params)
        cx.params = pp_wrap_params(cx.params, pp_axis)
        depth = len(self.attns)
        layers = [(cx.params["attns"][str(i)], cx.params["ffs"][str(i)])
                  for i in range(depth)]
        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)
        attn_mod, ff_mod = self.attns[0], self.ffs[0]
        base_rng, train, policy = cx.rng, cx.train, cx.policy

        def layer_fn(params_i, layer_idx, mb_idx, h):
            attn_p, ff_p = params_i
            ka = kf = None
            if base_rng is not None:
                # (layer, microbatch)-keyed dropout stream — documented
                # divergence from the unsharded layer-ordered stream, same
                # class as DP's per-replica / SP's per-rank fold_in
                lk = jax.random.fold_in(base_rng, layer_idx)
                ka = jax.random.fold_in(lk, 2 * mb_idx)
                kf = jax.random.fold_in(lk, 2 * mb_idx + 1)
            sub = Ctx(attn_mod, attn_p, {}, train, ka, policy)
            h = attn_mod.forward(sub, h, sp_active=sp) + h
            sub = Ctx(ff_mod, ff_p, {}, train, kf, policy)
            h = ff_mod.forward(sub, h) + h
            return h

        return gpipe_apply(layer_fn, stacked, x, pp_axis, n_micro)


def _early_fold_plans_vit(ch, kernel_size):
    """MobileViT lane-fold chain (W-major; ops/folded.py): conv1 + the four
    stem Bottleneck3Ds — the C=16/24 @112^2 layers paying 8x lane padding.
    The stem blocks are the same reference-quirk Bottleneck3D (BN+act after
    projection only, no SE), so they collapse fully. W in-fold 16 on the
    stem conv is a pure reshape (no H fold — see mobilenet3d's plans).
    The plans depend only on the channel table and kernel size (the
    expansion ratio vanishes inside the collapsed expand->dw->project)."""
    from picklebot_tpu.ops.folded import folded_conv_map
    k, p = kernel_size, 1   # reference fixes conv padding at 1
    return {
        "fold_in": (1, 1, 16), "unfold": (1, 1, 4),
        "conv1": folded_conv_map((k, k, k), (2, 2, 2), (p, p, p),
                                 (1, 1, 16), (1, 1, 8), 3, ch[0]),
        "s0": folded_conv_map((1, k, k), (1, 1, 1), (p, p, p),
                              (1, 1, 8), (1, 1, 8), ch[0], ch[1]),
        "s1": folded_conv_map((1, k, k), (2, 2, 2), (p, p, p),
                              (1, 1, 8), (1, 1, 4), ch[1], ch[2]),
        "s2": folded_conv_map((1, k, k), (1, 1, 1), (p, p, p),
                              (1, 1, 4), (1, 1, 4), ch[2], ch[3]),
        "s3": folded_conv_map((1, k, k), (1, 1, 1), (p, p, p),
                              (1, 1, 4), (1, 1, 4), ch[2], ch[3]),
    }


class MobileViT(Module):
    """reference mobilevit.py:146-205."""

    FOLD_SPANS = ("stem", "trunk")

    def __init__(self, dims: Sequence[int], channels: Sequence[int],
                 num_classes: int, expansion: int = 4,
                 kernel_size: int = 3,
                 patch_size: Tuple[int, int, int] = (2, 2, 2),
                 depths: Tuple[int, int, int] = (2, 4, 3),
                 attention_backend: str = "auto",
                 model_axis=None, sequence_axis=None,
                 pipeline_axis=None, pipeline_microbatches=None,
                 moe_experts: int = 0, moe_top_k: int = 2,
                 moe_capacity_factor: float = 1.25, expert_axis=None,
                 moe_dispatch: str = "replicated",
                 space_to_depth: bool = False,
                 early_fold: bool = False, fold_span: str = "stem"):
        super().__init__()
        assert len(dims) == 3 and len(depths) == 3
        if fold_span not in self.FOLD_SPANS:
            raise ValueError(
                f"MobileViT fold_span={fold_span!r} not recognized "
                f"(valid: {self.FOLD_SPANS})")
        self._fold_span = fold_span
        ch = list(channels)
        self._ch = ch
        init_dim, last_dim = ch[0], ch[-1]
        be = attention_backend
        ma = model_axis
        sa = sequence_axis
        pa, pm = pipeline_axis, pipeline_microbatches
        moe = dict(moe_experts=moe_experts, moe_top_k=moe_top_k,
                   moe_capacity_factor=moe_capacity_factor,
                   expert_axis=expert_axis, moe_dispatch=moe_dispatch)
        self._early_plans = (_early_fold_plans_vit(ch, kernel_size)
                             if early_fold else None)

        self.conv1 = conv_nxn_bn(3, init_dim, stride=2,
                                 space_to_depth=space_to_depth
                                 and not early_fold)
        B = Bottleneck3D
        self.stem = ModuleList([
            B(ch[0], ch[1], expanded_channels=ch[0] * expansion, stride=1),
            B(ch[1], ch[2], expanded_channels=ch[1] * expansion, stride=2),
            B(ch[2], ch[3], expanded_channels=ch[2] * expansion, stride=1),
            B(ch[2], ch[3], expanded_channels=ch[2] * expansion, stride=1),
        ])
        self.trunk = ModuleList([
            Sequential(
                B(ch[3], ch[4], expanded_channels=ch[3] * expansion,
                  stride=2),
                MobileViTBlock(dims[0], depths[0], ch[5], kernel_size,
                               patch_size, int(dims[0] * 2), backend=be,
                               model_axis=ma, sequence_axis=sa,
                               pipeline_axis=pa,
                               pipeline_microbatches=pm, **moe)),
            Sequential(
                # reference quirk (mobilevit.py:180): trunk[1]'s expansion
                # is computed from channels[7] (the NEXT stage's width),
                # not its own in-channels channels[5] — load-bearing for
                # checkpoint/logit parity, do NOT "fix"
                B(ch[5], ch[6], expanded_channels=ch[7] * expansion,
                  stride=2),
                MobileViTBlock(dims[1], depths[1], ch[7], kernel_size,
                               patch_size, int(dims[1] * 4), backend=be,
                               model_axis=ma, sequence_axis=sa,
                               pipeline_axis=pa,
                               pipeline_microbatches=pm, **moe)),
            Sequential(
                # reference quirk (mobilevit.py:185): literal *4 here, NOT
                # *expansion — diverges for any non-default expansion;
                # parity depends on keeping it literal
                B(ch[7], ch[8], expanded_channels=ch[7] * 4, stride=2),
                MobileViTBlock(dims[2], depths[2], ch[9], kernel_size,
                               patch_size, int(dims[2] * 4), backend=be,
                               model_axis=ma, sequence_axis=sa,
                               pipeline_axis=pa,
                               pipeline_microbatches=pm, **moe)),
        ])
        self.to_logits_conv = conv_1x1_bn(ch[-2], last_dim)
        self.head = Dense(last_dim, num_classes, bias=False, w_init=_W_INIT)

    def forward(self, cx: Ctx, x):
        if self._early_plans is not None:
            from picklebot_tpu.ops.folded import (BoundaryFold, fold_nd,
                                                  unfold_nd)
            plans = self._early_plans
            ch = self._ch
            z = fold_nd(x, plans["fold_in"])
            z = cx(self.conv1, z, folded=plans["conv1"])
            for i, key in enumerate(("s0", "s1", "s2", "s3")):
                z = cx(self.stem[i], z, folded=plans[key])
            if self._fold_span == "trunk":
                # each trunk bottleneck runs boundary-folded (canonical
                # FLOPs, narrow boundaries lane-packed); the ViT blocks run
                # canonical — the W-major fold/unfold around them are pure
                # reshapes
                z = cx(self.trunk[0].layers[0], z,
                       folded=BoundaryFold(4, 2, ch[3], ch[4]))
                x = unfold_nd(z, (1, 1, 2), ch[4])
                x = cx(self.trunk[0].layers[1], x)
                z = fold_nd(x, (1, 1, 2))
                x = cx(self.trunk[1].layers[0], z,
                       folded=BoundaryFold(2, 1, ch[5], ch[6]))
                x = cx(self.trunk[1].layers[1], x)
                z = fold_nd(x, (1, 1, 2))
                x = cx(self.trunk[2].layers[0], z,
                       folded=BoundaryFold(2, 1, ch[7], ch[8]))
                x = cx(self.trunk[2].layers[1], x)
            else:
                x = unfold_nd(z, plans["unfold"], plans["s3"].cout)
                for i in range(len(self.trunk)):
                    x = cx(self.trunk[i], x)
        else:
            x = cx(self.conv1, x)
            for i in range(len(self.stem)):
                x = cx(self.stem[i], x)
            for i in range(len(self.trunk)):
                x = cx(self.trunk[i], x)
        x = cx(self.to_logits_conv, x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3)).astype(x.dtype)
        return cx(self.head, x)

    def init_params(self, seed):
        """Reference initialize_weights re-inits EVERY conv/linear weight to
        N(0, 0.02²) and zeroes their biases (mobilevit.py:207-215) — that
        includes the bottleneck and SE weights, so apply it tree-wide."""
        from picklebot_tpu.core.module import as_seed
        seed = as_seed(seed)
        return pinit.reinit_normal_002(super().init_params(seed), seed)


# configs from reference config/mobilevit_{xxs,xs,s}.json
MOBILEVIT_CONFIGS = {
    "xxs": dict(dims=[64, 80, 96],
                channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320]),
    "xs": dict(dims=[96, 120, 144],
               channels=[16, 32, 48, 48, 64, 64, 80, 80, 96, 96, 384]),
    "s": dict(dims=[144, 192, 240],
              channels=[16, 32, 64, 64, 96, 96, 128, 128, 160, 160, 640]),
}
