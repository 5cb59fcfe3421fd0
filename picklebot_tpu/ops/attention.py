"""Attention primitives: multi-head SDPA and separable linear attention.

MultiHeadAttention replaces the reference MobileViT ``Attention``
(mobilevit.py:43-86): pre-LN (no affine), fused qkv projection, 8 heads x 16
dim_head, scaled dot-product, output projection. The reference's flash path
is broken as committed (it never merges heads back before ``to_out`` —
mobilevit.py:82-85); we implement the evident intent (the head-merge present
in profiling_mobilevit.py:102) — a documented divergence.

Backends:
  * 'auto'   — head-packed Pallas flash kernel (ops/pallas/flash_packed.py)
               when the shape qualifies (all heads fit the 128-lane minor
               dim and the sequence is long enough that it beats XLA —
               measured on v5e, see _PACKED_MIN_SEQ); XLA otherwise.
  * 'xla'    — plain einsum softmax attention.
  * 'packed' — force the head-packed Pallas kernel.
  * 'pallas' — the generic per-head blockwise flash kernel
               (ops/pallas/flash_attention.py); kept for head dims that
               don't pack into 128 lanes and for comparison benches.

Sequence parallelism: with ``sequence_axis`` set and ``sp_active=True``
(TransformerStack token-scattered the input), attention runs over the
sharded sequence — ring attention (ops/ring_attention.py) normally, or
gathered-K/V SDPA when attention dropout is active.

LinearSelfAttention is MobileViT V2's O(n) separable attention
(mobilevitv2.py:9-55), reformulated channels-last: scores softmax over the
patch axis from a 1-dim query projection, context = sum(k * scores),
out = relu(v) * context.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import Ctx, Module
from picklebot_tpu.ops.linear import Dense, Dropout
from picklebot_tpu.ops.norm import LayerNorm

# Below this many tokens XLA's fused softmax attention matches or beats the
# head-packed kernel (v5e, bf16, 8x16 heads: N=200 tie 1.5ms, N=1568 kernel
# wins 2.40 vs 3.33ms fwd / 3.42 vs 6.23ms fwd+bwd — probe_flash_packed.py)
_PACKED_MIN_SEQ = 512


def sdpa_xla(q, k, v, scale: float, dropout_p: float = 0.0,
             rng: Optional[jax.Array] = None):
    """Softmax attention over (..., N, D) with f32 softmax accumulation."""
    logits = jnp.einsum("...nd,...md->...nm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_p > 0.0 and rng is not None:
        keep = 1.0 - dropout_p
        mask = jax.random.bernoulli(rng, keep, probs.shape)
        probs = jnp.where(mask, probs / keep, 0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("...nm,...md->...nd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class MultiHeadAttention(Module):
    """Pre-LN MHA with fused qkv, as used inside MobileViT blocks.

    Input: (..., N, embed_dim) — leading dims are batch-like (MobileViT passes
    (B, P, N, D) with P=8 patch-position groups).
    """

    def __init__(self, embed_dim: int, heads: int = 8, dim_head: int = 16,
                 dropout: float = 0.0, backend: str = "auto",
                 sequence_axis: Optional[str] = None):
        super().__init__()
        self.embed_dim = embed_dim
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = heads * dim_head
        self.scale = dim_head ** -0.5
        self.dropout_p = dropout
        self.backend = backend
        self.sequence_axis = sequence_axis
        self.norm = LayerNorm(embed_dim, affine=False)
        self.to_qkv = Dense(embed_dim, self.inner_dim * 3, bias=False)
        self.to_out = Dense(self.inner_dim, embed_dim, bias=False)
        self.out_dropout = Dropout(dropout)

    def _attend(self, cx: Ctx, q, k, v):
        backend = self.backend
        dropout_active = cx.train and self.dropout_p > 0
        if backend == "auto":
            # the head-packed kernel is selected earlier (forward, on the
            # unsplit qkv); reaching here on 'auto' means the shape didn't
            # qualify, so XLA it is
            backend = "xla"
        if dropout_active:
            # the flash kernel has no dropout path; silently dropping the
            # configured attention dropout would change training behavior
            backend = "xla"
        if backend == "pallas":
            from picklebot_tpu.ops.pallas.flash_attention import flash_attention
            return flash_attention(q, k, v, scale=self.scale)
        rng = cx.next_rng() if (cx.train and self.dropout_p > 0) else None
        return sdpa_xla(q, k, v, self.scale,
                        self.dropout_p if cx.train else 0.0, rng)

    def _use_head_packed(self, cx: Ctx, n: int) -> bool:
        """Head-packed kernel eligibility: every head must pack into the
        128-lane minor dim (MobileViT: 8 x 16 = 128 exactly), the kernel
        has no dropout path, and below ~_PACKED_MIN_SEQ tokens XLA's fused
        attention is at parity or better (measured on v5e — see
        docs/kernel_evidence.json)."""
        if cx.train and self.dropout_p > 0:
            # no dropout path in the kernel: fall back to XLA rather than
            # silently changing training regularization (same policy as
            # _attend's guard for every other backend)
            return False
        if self.backend == "packed":
            return True
        if self.backend != "auto":
            return False
        return self.inner_dim <= 128 and n >= _PACKED_MIN_SEQ

    def _split_heads(self, t):  # (..., N, H*D) -> (..., H, N, D)
        t = t.reshape(t.shape[:-1] + (self.heads, self.dim_head))
        return jnp.swapaxes(t, -2, -3)

    def _forward_sp(self, cx: Ctx, x):
        """Sequence-parallel attention: x is the LOCAL token block of a
        sequence sharded over ``self.sequence_axis`` (TransformerStack
        scattered it). Exact: ring attention (ops/ring_attention.py) when
        dropout is inactive; with attention dropout, K/V are all-gathered
        and the local queries attend with a per-rank-independent mask (the
        stack folds the rank into the rng)."""
        x = cx(self.norm, x)
        qkv = cx(self.to_qkv, x)
        q, k, v = map(self._split_heads, jnp.split(qkv, 3, axis=-1))
        if cx.train and self.dropout_p > 0:
            # probs-dropout needs the full score row; gather K/V (plain
            # all_gather: k/v are genuinely sharded, its psum-scatter
            # transpose is the correct cotangent here)
            k = jax.lax.all_gather(k, self.sequence_axis, axis=-2, tiled=True)
            v = jax.lax.all_gather(v, self.sequence_axis, axis=-2, tiled=True)
            out = sdpa_xla(q, k, v, self.scale, self.dropout_p, cx.next_rng())
        else:
            from picklebot_tpu.ops.ring_attention import ring_attention
            out = ring_attention(q, k, v, self.sequence_axis, self.scale)
        out = jnp.swapaxes(out, -2, -3)
        out = out.reshape(out.shape[:-2] + (self.inner_dim,))
        return cx(self.out_dropout, cx(self.to_out, out))

    def forward(self, cx: Ctx, x, sp_active: bool = False):
        if sp_active:
            return self._forward_sp(cx, x)
        x = cx(self.norm, x)
        qkv = cx(self.to_qkv, x)                       # (..., N, 3*inner)

        if self._use_head_packed(cx, x.shape[-2]):
            # heads never split: the packed kernel consumes the fused
            # projection's (..., N, H*D) layout directly
            from picklebot_tpu.ops.pallas.flash_packed import (
                flash_attention_packed)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = flash_attention_packed(q, k, v, self.heads,
                                         scale=self.scale)
            return cx(self.out_dropout, cx(self.to_out, out))

        if self.backend == "pallas_packed" and not (
                cx.train and self.dropout_p > 0):
            # packed-qkv flash entry (reference flash_attn_qkvpacked_func,
            # profiling_mobilevit.py:9,82): keep the fused projection's
            # (..., N, 3, H, D) layout all the way into the kernel
            from picklebot_tpu.ops.pallas.flash_attention import (
                flash_attention_qkvpacked)
            packed = qkv.reshape(qkv.shape[:-1]
                                 + (3, self.heads, self.dim_head))
            out = flash_attention_qkvpacked(packed, scale=self.scale)
            out = out.reshape(out.shape[:-2] + (self.inner_dim,))
            return cx(self.out_dropout, cx(self.to_out, out))

        q, k, v = map(self._split_heads, jnp.split(qkv, 3, axis=-1))
        out = self._attend(cx, q, k, v)
        out = jnp.swapaxes(out, -2, -3)                # (..., N, H, D)
        out = out.reshape(out.shape[:-2] + (self.inner_dim,))  # head merge
        out = cx(self.to_out, out)
        return cx(self.out_dropout, out)


class LinearSelfAttention(Module):
    """MobileViT V2 separable linear attention, channels-last.

    Input: (B, P, N, C) where P = pixels-per-patch, N = num patches,
    C = embed_dim (the reference keeps (B, C, P, N); we keep channels last).
    qkv is a single 1x1 conv to 1 + 2C channels (a dense over C here).
    """

    def __init__(self, embed_dim: int, dropout: float = 0.0):
        super().__init__()
        self.embed_dim = embed_dim
        self.qkv_proj = Dense(embed_dim, 1 + 2 * embed_dim, bias=True)
        self.attn_dropout = Dropout(dropout)
        self.out_proj = Dense(embed_dim, embed_dim, bias=True)

    def forward(self, cx: Ctx, x):
        c = self.embed_dim
        qkv = cx(self.qkv_proj, x)                      # (B, P, N, 1+2C)
        query = qkv[..., :1]                            # (B, P, N, 1)
        key = qkv[..., 1:1 + c]
        value = qkv[..., 1 + c:]
        # softmax over the patch axis N (reference softmaxes dim=-1 of
        # (B, 1, P, N), mobilevitv2.py:41)
        scores = jax.nn.softmax(query.astype(jnp.float32), axis=-2
                                ).astype(x.dtype)
        scores = cx(self.attn_dropout, scores)
        context = jnp.sum(key * scores, axis=-2, keepdims=True)  # (B,P,1,C)
        out = jnp.maximum(value, 0) * context           # broadcast over N
        return cx(self.out_proj, out)
