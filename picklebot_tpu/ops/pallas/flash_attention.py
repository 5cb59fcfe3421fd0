"""First-party Pallas TPU flash attention (blockwise, online softmax).

Replaces the cuDNN/SDPA-Flash kernel the reference leans on inside MobileViT
(reference mobilevit.py:63-74) and the packed-qkv flash-attn experiment
(profiling_mobilevit.py:9,82). The kernel streams K/V blocks through VMEM
with a running-max/running-sum softmax, so attention memory is O(block²)
regardless of sequence length — at the full clip shape MobileViT's stage-1
sequences reach thousands of tokens, exactly the regime where materializing
the (N, N) score matrix stops fitting and flash wins.

Forward is the Pallas kernel; backward is a custom VJP that recomputes
attention with XLA ops in f32 (standard rematerialized backward — a fused
Pallas backward is a later optimization; correctness and fwd-bandwidth are
what matter at these head dims).

Shapes: q, k, v (..., N, D) with any leading batch dims (MobileViT passes
(B, P, H, N, D)). Grid is (batch, q-blocks, k-blocks) with the k dimension
innermost-sequential, accumulating into VMEM scratch.

Falls back to interpret mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            scale: float, n_valid: int, block_k: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # (bq, d)
    k = k_ref[0]                       # (bk, d)
    v = v_ref[0]                       # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (bq, bk) f32

    # mask out padded key positions (N padded up to a block multiple)
    k_ids = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1)
    s = jnp.where(k_ids < n_valid, s, _NEG_INF)

    m_prev = m_ref[:]                                   # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    m_ref[:] = m_new
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                              # (bq, bk)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (bq, d)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale: float, block_q: int, block_k: int,
                   interpret: bool):
    orig_shape = q.shape
    n, d = q.shape[-2], q.shape[-1]
    batch = math.prod(q.shape[:-2])
    q3 = q.reshape(batch, n, d)
    k3 = k.reshape(batch, n, d)
    v3 = v.reshape(batch, n, d)

    bq = min(block_q, max(8, 1 << (n - 1).bit_length()))  # pow2 <= block_q
    bq = min(bq, block_q)
    bk = min(block_k, bq) if n < block_k else block_k
    nq = -(-n // bq)
    nk = -(-n // bk)
    n_pad_q = nq * bq - n
    n_pad_k = nk * bk - n
    if n_pad_q or n_pad_k:
        q3 = jnp.pad(q3, ((0, 0), (0, n_pad_q), (0, 0)))
        k3 = jnp.pad(k3, ((0, 0), (0, n_pad_k), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, n_pad_k), (0, 0)))

    grid = (batch, nq, nk)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_valid=n, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, nq * bq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running sum
            pltpu.VMEM((bq, d), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q3, k3, v3)
    return out[:, :n, :].reshape(orig_shape)


def _sdpa_reference(q, k, v, scale):
    s = jnp.einsum("...nd,...md->...nm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("...nm,...md->...nd", p,
                         v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, block_q, block_k):
    interpret = jax.default_backend() != "tpu"
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, scale, block_q, block_k):
    return _flash(q, k, v, scale, block_q, block_k), (q, k, v)


def _flash_bwd(scale, block_q, block_k, residuals, g):
    """Rematerialized XLA backward in f32 (O(N²) memory per q-row-block is
    avoided by XLA's own fusion; exactness beats the fwd kernel's needs)."""
    q, k, v = residuals
    p, out = _sdpa_reference(q, k, v, scale)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("...nd,...md->...nm", gf, vf)
    dv = jnp.einsum("...nm,...nd->...md", p, gf)
    # softmax backward: dS = P * (dP - rowsum(dP * P))
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row)
    dq = jnp.einsum("...nm,...md->...nd", ds,
                    k.astype(jnp.float32)) * scale
    dk = jnp.einsum("...nm,...nd->...md", ds,
                    q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """Blockwise flash attention over (..., N, D). Differentiable."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale), block_q, block_k)
