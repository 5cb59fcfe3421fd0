"""First-party Pallas TPU flash attention: blockwise forward AND backward.

Replaces the cuDNN/SDPA-Flash kernel the reference leans on inside MobileViT
(reference mobilevit.py:63-74) and the packed-qkv flash-attn experiment
(profiling_mobilevit.py:9,82). The forward streams K/V blocks through VMEM
with a running-max/running-sum softmax, so attention memory is O(block²)
regardless of sequence length — at the full clip shape MobileViT's stage-1
sequences reach thousands of tokens, exactly the regime where materializing
the (N, N) score matrix stops fitting.

Backward (FlashAttention paper, alg. 4): the forward additionally saves the
per-row logsumexp L = m + log(l); the backward recomputes P = exp(S - L)
blockwise in two Pallas kernels —

  dQ kernel:  grid (batch, q-blocks, k-blocks), k innermost;
              dQ_i = scale * Σ_j [P_ij ∘ (dO_i V_jᵀ - D_i)] K_j
  dKV kernel: grid (batch, k-blocks, q-blocks), q innermost;
              dV_j = Σ_i P_ijᵀ dO_i,  dK_j = scale * Σ_i dS_ijᵀ Q_i

with D = rowsum(dO ∘ O) precomputed in XLA. No masking is needed in the
backward: padded K/V rows are zero (their dQ contribution multiplies K = 0)
and padded query rows carry dO = 0 (killing their dK/dV and dS terms).

Shapes: q, k, v (..., N, D) with any leading batch dims (MobileViT passes
(B, P, H, N, D)). ``backward='xla'`` selects the rematerialized O(N²) XLA
backward instead (the round-1 behavior, kept for comparison/benchmarks).

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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                *, scale: float, n_valid: int, block_k: int):
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
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _block_sizes(n: int, block_q: int, block_k: int):
    bq = min(block_q, max(8, 1 << (n - 1).bit_length()))  # pow2 <= block_q
    bq = min(bq, block_q)
    bk = min(block_k, bq) if n < block_k else block_k
    return bq, bk


def _pad_nd(x, n_pad):
    if n_pad:
        return jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
    return x


def _flash_forward(q, k, v, scale: float, block_q: int, block_k: int,
                   interpret: bool):
    """Returns (out, lse) with out in q's shape and lse (batch, nq*bq, 1)
    f32 (padded rows included — the backward slices what it needs)."""
    orig_shape = q.shape
    n, d = q.shape[-2], q.shape[-1]
    batch = math.prod(q.shape[:-2])
    q3 = q.reshape(batch, n, d)
    k3 = k.reshape(batch, n, d)
    v3 = v.reshape(batch, n, d)

    bq, bk = _block_sizes(n, block_q, block_k)
    nq = -(-n // bq)
    nk = -(-n // bk)
    q3 = _pad_nd(q3, nq * bq - n)
    k3 = _pad_nd(k3, nk * bk - n)
    v3 = _pad_nd(v3, nk * bk - n)

    grid = (batch, nq, nk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, nq * bq, d), q.dtype),
            jax.ShapeDtypeStruct((batch, nq * bq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running sum
            pltpu.VMEM((bq, d), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q3, k3, v3)
    return out[:, :n, :].reshape(orig_shape), lse


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref,
               *, scale: float):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (bq, bk)
    p = jnp.exp(s - lse_ref[0])                          # (bq, bk) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bq, bk)
    ds = p * (dp - dd_ref[0])                            # (bq, bk) f32
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bq, d)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (bq, bk)
    p = jnp.exp(s - lse_ref[0])                          # (bq, bk)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bk, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bq, bk)
    ds = p * (dp - dd_ref[0])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bk, d)

    @pl.when(i == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale: float, block_q: int,
                    block_k: int, interpret: bool):
    orig_shape = q.shape
    n, d = q.shape[-2], q.shape[-1]
    batch = math.prod(q.shape[:-2])
    q3 = q.reshape(batch, n, d)
    k3 = k.reshape(batch, n, d)
    v3 = v.reshape(batch, n, d)
    o3 = out.reshape(batch, n, d)
    g3 = g.reshape(batch, n, d)

    bq, bk = _block_sizes(n, block_q, block_k)
    nq = -(-n // bq)
    nk = -(-n // bk)
    # padded q rows get dO = 0 (zeroing their dS/dKV terms); padded k rows
    # are zero so their dQ contribution vanishes through K = 0
    q3 = _pad_nd(q3, nq * bq - n)
    g3 = _pad_nd(g3, nq * bq - n)
    o3 = _pad_nd(o3, nq * bq - n)
    k3 = _pad_nd(k3, nk * bk - n)
    v3 = _pad_nd(v3, nk * bk - n)

    # D = rowsum(dO * O), f32 — tiny elementwise+reduce, leave it to XLA
    dd = jnp.sum(g3.astype(jnp.float32) * o3.astype(jnp.float32),
                 axis=-1, keepdims=True)                 # (batch, nq*bq, 1)
    # lse from forward is already padded to nq*bq rows

    q_spec = pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0))
    k_spec = pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0))
    r_spec = pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(batch, nq, nk),
        in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((batch, nq * bq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(q3, k3, v3, g3, lse, dd)

    # dKV: k-block outermost, q-blocks innermost-sequential
    qi_spec = pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0))
    kj_spec = pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0))
    ri_spec = pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(batch, nk, nq),
        in_specs=[qi_spec, kj_spec, kj_spec, qi_spec, ri_spec, ri_spec],
        out_specs=[kj_spec, kj_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, nk * bk, d), k.dtype),
            jax.ShapeDtypeStruct((batch, nk * bk, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        interpret=interpret,
    )(q3, k3, v3, g3, lse, dd)

    dq = dq[:, :n, :].reshape(orig_shape)
    dk = dk[:, :n, :].reshape(orig_shape)
    dv = dv[:, :n, :].reshape(orig_shape)
    return dq, dk, dv


def _sdpa_reference(q, k, v, scale):
    s = jnp.einsum("...nd,...md->...nm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("...nm,...md->...nd", p,
                         v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, backward):
    interpret = jax.default_backend() != "tpu"
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, scale, block_q, block_k, backward):
    interpret = jax.default_backend() != "tpu"
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, backward, residuals, g):
    q, k, v, out, lse = residuals
    if backward == "pallas":
        interpret = jax.default_backend() != "tpu"
        return _flash_backward(q, k, v, out, lse, g, scale,
                               block_q, block_k, interpret)
    # rematerialized XLA backward in f32 (O(N²) memory; round-1 behavior)
    p, _ = _sdpa_reference(q, k, v, scale)
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
                    block_k: int = DEFAULT_BLOCK_K,
                    backward: str = "pallas"):
    """Blockwise flash attention over (..., N, D). Differentiable; the
    backward is a fused Pallas kernel pair (``backward='xla'`` selects the
    O(N²) rematerialized XLA VJP instead)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    assert backward in ("pallas", "xla"), backward
    return _flash(q, k, v, float(scale), block_q, block_k, backward)


def flash_attention_qkvpacked(qkv, scale: Optional[float] = None,
                              block_q: int = DEFAULT_BLOCK_Q,
                              block_k: int = DEFAULT_BLOCK_K,
                              backward: str = "pallas"):
    """Packed-qkv entry point (flash-attn package layout,
    reference profiling_mobilevit.py:9,82): qkv (..., N, 3, H, D) ->
    (..., N, H, D)."""
    assert qkv.shape[-3] == 3, f"expected (..., N, 3, H, D), got {qkv.shape}"
    q = jnp.moveaxis(qkv[..., 0, :, :], -2, -3)   # (..., H, N, D)
    k = jnp.moveaxis(qkv[..., 1, :, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :, :], -2, -3)
    out = flash_attention(q, k, v, scale=scale, block_q=block_q,
                          block_k=block_k, backward=backward)
    return jnp.moveaxis(out, -3, -2)              # (..., N, H, D)
