"""Head-packed Pallas flash attention: all heads share the 128-lane minor dim.

The generic kernel (ops/pallas/flash_attention.py) processes one head per
grid block, so at MobileViT's dim_head=16 (reference mobilevit.py:116) every
Q/K/V block is 16 lanes wide — 7/8 of the 128-lane minor dim is padding, in
VMEM *and* in the HBM tile layout the blocks stream from. That is why it
loses to XLA at every reference shape (docs/kernel_evidence.json, round 2).

This kernel keeps q, k, v in their natural packed layout (..., N, H*D) —
exactly what the fused qkv projection produces (reference mobilevit.py:68:
one Linear to inner_dim, split 3-ways; heads are only ever a *view*). With
H*D = 128 the layout is lane-dense end to end and the caller performs zero
head-split/merge transposes.

Per-head scores come from ONE wide MXU contraction per block, not H small
ones: tile K^T H times along the lane dim, zeroing the rows outside each
copy's head —

    KT_big[:, h*bk : (h+1)*bk] = K^T ∘ row_mask_h      (128, H*bk)
    S_all = Q @ KT_big                                  (bq, H*bk)

so column chunk h holds exactly S_h = Q_h K_h^T (the masked rows kill the
cross-head terms). The online softmax runs on (bq, H*bk) with per-head
running max / sum kept replicated across each head's D lanes in (bq, H*D)
scratch (slices are static, lane-contiguous). P @ V is the mirror image:

    V_big[h*bk : (h+1)*bk, :] = V ∘ lane_mask_h        (H*bk, H*D)
    O  = P_all @ V_big                                  (bq, H*D)

whose masked rows make each output lane receive only its own head's
contribution. Each wide matmul does H x the useful FLOPs — the same
inflation XLA pays for a 16-wide contraction dim — but with no (N, N)
score materialization in HBM, no 8x-padded tiles, and 2 MXU ops per block
instead of 2H.

The forward emits per-head logsumexp replicated to (batch, N', H*D) for the
fused backward pair (dQ kernel + dKV kernel), which recomputes P blockwise
(same algebra as the generic kernel's backward; see its docstring). dQ needs
no extraction mask at all: dQ = dS_all @ K_big with K_big's rows pre-masked
routes every head to its own lanes in one contraction. dK/dV come from
full-lane (H*bk, H*D) products folded back by masked accumulation over the
H row chunks.

Replaces: reference SDPA-Flash (mobilevit.py:63-74) and the flash-attn
packed-qkv experiment (profiling_mobilevit.py:9,82) on the default path.
Falls back to interpret mode off-TPU so CPU tests run the same code.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_INF = -1e30


def _row_mask(h: int, dim_head: int, shape):
    """True where the SECOND-minor index belongs to head h."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    return (rows // dim_head) == h


def _lane_mask(h: int, dim_head: int, shape):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return (lane // dim_head) == h


def _kt_big(k, heads: int, dim_head: int):
    """(bk, H*D) -> (H*D, H*bk): K^T tiled per head with off-head rows
    zeroed, so Q @ KT_big computes every head's scores in one contraction."""
    kt = k.T                                       # (H*D, bk)
    return jnp.concatenate(
        [jnp.where(_row_mask(h, dim_head, kt.shape), kt, 0)
         for h in range(heads)], axis=1)           # (H*D, H*bk)


def _v_big(v, heads: int, dim_head: int):
    """(bk, H*D) -> (H*bk, H*D): V tiled per head with off-head lanes
    zeroed, so P_all @ V_big lands each head on its own output lanes."""
    return jnp.concatenate(
        [jnp.where(_lane_mask(h, dim_head, v.shape), v, 0)
         for h in range(heads)], axis=0)           # (H*bk, H*D)


def _chunk_bcast(parts, width: int):
    """[(bq, 1)] * H -> (bq, H*width), each part broadcast to its chunk."""
    bq = parts[0].shape[0]
    return jnp.concatenate(
        [jnp.broadcast_to(p, (bq, width)) for p in parts], axis=1)


def _seg_max(s, heads: int, bk: int):
    return [jnp.max(s[:, h * bk:(h + 1) * bk], axis=1, keepdims=True)
            for h in range(heads)]


def _seg_sum(s, heads: int, bk: int):
    return [jnp.sum(s[:, h * bk:(h + 1) * bk], axis=1, keepdims=True)
            for h in range(heads)]


def _key_pad_mask(j, heads: int, bq: int, bk: int, n_valid: int):
    """(bq, H*bk) True where the column's key position is padding."""
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, heads * bk), 1)
    return (j * bk + col % bk) >= n_valid


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                *, heads: int, scale: float, n_valid: int):
    _fwd_compute(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                 heads=heads, scale=scale, n_valid=n_valid)


def _fwd_kernel_nolse(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                      *, heads: int, scale: float, n_valid: int):
    """Inference-path variant: no lse output. The lse array is only a
    backward residual, but pallas_call writes every declared output to
    HBM — on the no-gradient path that was a dead f32 (batch, nq*bq,
    inner) store per call, ~doubling the kernel's output bytes on a
    bandwidth-bound chip."""
    _fwd_compute(q_ref, k_ref, v_ref, o_ref, None, m_ref, l_ref, acc_ref,
                 heads=heads, scale=scale, n_valid=n_valid)


def _fwd_compute(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                 *, heads: int, scale: float, n_valid: int):
    j = pl.program_id(2)
    inner = q_ref.shape[-1]
    dim_head = inner // heads

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # (bq, H*D)
    k = k_ref[0]                      # (bk, H*D)
    v = v_ref[0]                      # (bk, H*D)
    bq, bk = q.shape[0], k.shape[0]

    s = jax.lax.dot_general(
        q, _kt_big(k, heads, dim_head), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # (bq, H*bk)
    s = jnp.where(_key_pad_mask(j, heads, bq, bk, n_valid), _NEG_INF, s)

    # per-head running softmax; m/l live replicated across each head's D
    # lanes so the rescales and the final divide are single wide VPU ops
    m_prev = m_ref[:]                                      # (bq, H*D)
    m_cur = _chunk_bcast(_seg_max(s, heads, bk), dim_head)
    m_new = jnp.maximum(m_prev, m_cur)
    m_ref[:] = m_new
    alpha = jnp.exp(m_prev - m_new)                        # (bq, H*D)

    m_cols = _chunk_bcast(
        [m_new[:, h * dim_head:h * dim_head + 1] for h in range(heads)], bk)
    p = jnp.exp(s - m_cols)                                # (bq, H*bk) f32
    l_cur = _chunk_bcast(_seg_sum(p, heads, bk), dim_head)
    l_ref[:] = l_ref[:] * alpha + l_cur

    pv = jax.lax.dot_general(
        p.astype(v.dtype), _v_big(v, heads, dim_head),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (bq, H*D)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if lse_ref is not None:          # static: nolse variant omits it
            lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _block_sizes(n: int, block_q: int, block_k: int):
    bq = min(block_q, max(8, 1 << (n - 1).bit_length()))
    bk = min(block_k, bq) if n < block_k else block_k
    return bq, bk


def _pad_nd(x, n_pad):
    if n_pad:
        return jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
    return x


def _packed_forward(q, k, v, heads, scale, block_q, block_k, interpret,
                    with_lse=True):
    orig_shape = q.shape
    n, inner = q.shape[-2], q.shape[-1]
    batch = math.prod(q.shape[:-2])
    q3 = q.reshape(batch, n, inner)
    k3 = k.reshape(batch, n, inner)
    v3 = v.reshape(batch, n, inner)

    bq, bk = _block_sizes(n, block_q, block_k)
    nq = -(-n // bq)
    nk = -(-n // bk)
    q3 = _pad_nd(q3, nq * bq - n)
    k3 = _pad_nd(k3, nk * bk - n)
    v3 = _pad_nd(v3, nk * bk - n)

    grid = (batch, nq, nk)
    qi_spec = pl.BlockSpec((1, bq, inner), lambda b, i, j: (b, i, 0))
    kernel = _fwd_kernel if with_lse else _fwd_kernel_nolse
    outs = pl.pallas_call(
        functools.partial(kernel, heads=heads, scale=scale, n_valid=n),
        grid=grid,
        in_specs=[
            qi_spec,
            pl.BlockSpec((1, bk, inner), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, inner), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[qi_spec] + ([qi_spec] if with_lse else []),
        out_shape=[
            jax.ShapeDtypeStruct((batch, nq * bq, inner), q.dtype),
        ] + ([jax.ShapeDtypeStruct((batch, nq * bq, inner), jnp.float32)]
             if with_lse else []),
        scratch_shapes=[
            pltpu.VMEM((bq, inner), jnp.float32),   # running max (replicated)
            pltpu.VMEM((bq, inner), jnp.float32),   # running sum (replicated)
            pltpu.VMEM((bq, inner), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q3, k3, v3)
    out = outs[0]                       # out_shape is a list either way
    lse = outs[1] if with_lse else None
    return out[:, :n, :].reshape(orig_shape), lse


def _k_big(k, heads: int, dim_head: int):
    """(bk, H*D) -> (H*bk, H*D): K tiled per head with off-head lanes
    zeroed (same shape logic as _v_big) — dS_all @ K_big IS dQ, no
    extraction mask needed."""
    return _v_big(k, heads, dim_head)


def _vt_big(v, heads: int, dim_head: int):
    """(bk, H*D) -> (H*D, H*bk): dO @ VT_big computes every head's dP in
    one contraction (same shape logic as _kt_big)."""
    return _kt_big(v, heads, dim_head)


def _recompute_p_ds(q, k, v, do, lse, dd, j, heads, dim_head, scale,
                    n_valid):
    """Shared backward algebra: blockwise P and dS on (bq, H*bk)."""
    bq, bk = q.shape[0], k.shape[0]
    s = jax.lax.dot_general(
        q, _kt_big(k, heads, dim_head), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.where(_key_pad_mask(j, heads, bq, bk, n_valid), _NEG_INF, s)
    lse_cols = _chunk_bcast(
        [lse[:, h * dim_head:h * dim_head + 1] for h in range(heads)], bk)
    p = jnp.exp(s - lse_cols)                              # (bq, H*bk)
    dp = jax.lax.dot_general(
        do, _vt_big(v, heads, dim_head), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (bq, H*bk)
    dd_cols = _chunk_bcast(
        [dd[:, h * dim_head:h * dim_head + 1] for h in range(heads)], bk)
    ds = p * (dp - dd_cols)
    return p, ds


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref,
               *, heads: int, scale: float, n_valid: int):
    j = pl.program_id(2)
    dim_head = q_ref.shape[-1] // heads

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    _, ds = _recompute_p_ds(q, k, v, do_ref[0], lse_ref[0], dd_ref[0],
                            j, heads, dim_head, scale, n_valid)
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), _k_big(k, heads, dim_head),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (bq, H*D)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _fold_rows(x, heads: int, dim_head: int, bk: int):
    """(H*bk, H*D) -> (bk, H*D): keep each row chunk's own head lanes and
    sum the chunks (the cross-head lanes are garbage by construction)."""
    out = None
    for h in range(heads):
        part = jnp.where(_lane_mask(h, dim_head, (bk, heads * dim_head)),
                         x[h * bk:(h + 1) * bk, :], 0)
        out = part if out is None else out + part
    return out


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, heads: int, scale: float, n_valid: int):
    i = pl.program_id(2)
    j = pl.program_id(1)
    dim_head = q_ref.shape[-1] // heads

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    bk = k.shape[0]
    p, ds = _recompute_p_ds(q, k, v, do, lse_ref[0], dd_ref[0],
                            j, heads, dim_head, scale, n_valid)
    dv_full = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (H*bk, H*D)
    dv_acc[:] += _fold_rows(dv_full, heads, dim_head, bk)
    dk_full = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (H*bk, H*D)
    dk_acc[:] += _fold_rows(dk_full, heads, dim_head, bk)

    @pl.when(i == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _packed_backward(q, k, v, lse, dd, g, heads, scale, block_q, block_k,
                     interpret):
    orig_shape = q.shape
    n, inner = q.shape[-2], q.shape[-1]
    batch = math.prod(q.shape[:-2])
    q3 = q.reshape(batch, n, inner)
    k3 = k.reshape(batch, n, inner)
    v3 = v.reshape(batch, n, inner)
    g3 = g.reshape(batch, n, inner)

    bq, bk = _block_sizes(n, block_q, block_k)
    nq = -(-n // bq)
    nk = -(-n // bk)
    q3 = _pad_nd(q3, nq * bq - n)
    g3 = _pad_nd(g3, nq * bq - n)
    k3 = _pad_nd(k3, nk * bk - n)
    v3 = _pad_nd(v3, nk * bk - n)
    # lse/dd from the forward wrapper are already (batch, nq*bq, H*D)

    q_spec = pl.BlockSpec((1, bq, inner), lambda b, i, j: (b, i, 0))
    k_spec = pl.BlockSpec((1, bk, inner), lambda b, i, j: (b, j, 0))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, heads=heads, scale=scale,
                          n_valid=n),
        grid=(batch, nq, nk),
        in_specs=[q_spec, k_spec, k_spec, q_spec, q_spec, q_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((batch, nq * bq, inner), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, inner), jnp.float32)],
        interpret=interpret,
    )(q3, k3, v3, g3, lse, dd)

    qi_spec = pl.BlockSpec((1, bq, inner), lambda b, j, i: (b, i, 0))
    kj_spec = pl.BlockSpec((1, bk, inner), lambda b, j, i: (b, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, heads=heads, scale=scale,
                          n_valid=n),
        grid=(batch, nk, nq),
        in_specs=[qi_spec, kj_spec, kj_spec, qi_spec, qi_spec, qi_spec],
        out_specs=[kj_spec, kj_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, nk * bk, inner), k.dtype),
            jax.ShapeDtypeStruct((batch, nk * bk, inner), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, inner), jnp.float32),
                        pltpu.VMEM((bk, inner), jnp.float32)],
        interpret=interpret,
    )(q3, k3, v3, g3, lse, dd)

    dq = dq[:, :n, :].reshape(orig_shape)
    dk = dk[:, :n, :].reshape(orig_shape)
    dv = dv[:, :n, :].reshape(orig_shape)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_packed(q, k, v, heads, scale, block_q, block_k):
    # primal (no-gradient) path: skip the lse output entirely — it is
    # only a backward residual (_flash_packed_fwd keeps it)
    interpret = jax.default_backend() != "tpu"
    out, _ = _packed_forward(q, k, v, heads, scale, block_q, block_k,
                             interpret, with_lse=False)
    return out


def _flash_packed_fwd(q, k, v, heads, scale, block_q, block_k):
    interpret = jax.default_backend() != "tpu"
    out, lse = _packed_forward(q, k, v, heads, scale, block_q, block_k,
                               interpret)
    return out, (q, k, v, out, lse)


def _flash_packed_bwd(heads, scale, block_q, block_k, residuals, g):
    q, k, v, out, lse = residuals
    interpret = jax.default_backend() != "tpu"
    n, inner = q.shape[-2], q.shape[-1]
    batch = math.prod(q.shape[:-2])
    dim_head = inner // heads
    # per-head D_i = rowsum(dO_h ∘ O_h), replicated across each head's D
    # lanes to match the lse layout — tiny elementwise+reduce, XLA
    g3 = g.reshape(batch, n, heads, dim_head).astype(jnp.float32)
    o3 = out.reshape(batch, n, heads, dim_head).astype(jnp.float32)
    dd = jnp.sum(g3 * o3, axis=-1, keepdims=True)          # (batch, n, H, 1)
    dd = jnp.broadcast_to(dd, (batch, n, heads, dim_head)
                          ).reshape(batch, n, inner)
    dd = jnp.pad(dd, ((0, 0), (0, lse.shape[1] - n), (0, 0)))
    return _packed_backward(q, k, v, lse, dd, g, heads, scale,
                            block_q, block_k, interpret)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(q, k, v, heads: int,
                           scale: Optional[float] = None,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K):
    """Head-packed blockwise flash attention.

    q, k, v: (..., N, H*D) — heads stay packed in the minor dim (the fused
    qkv projection's natural layout; H*D = 128 makes it lane-dense).
    Returns (..., N, H*D). Differentiable (fused Pallas dQ/dKV backward).
    """
    inner = q.shape[-1]
    assert inner % heads == 0, (inner, heads)
    if scale is None:
        scale = (inner // heads) ** -0.5
    return _flash_packed(q, k, v, heads, float(scale), block_q, block_k)
