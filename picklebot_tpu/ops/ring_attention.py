"""Ring attention: exact softmax attention over a sequence sharded across
a mesh axis.

The sequence-parallel analog of the reference's SDPA-Flash attention
(/root/reference/mobilevit.py:63-74): each device holds an equal token
shard of Q/K/V; K/V blocks rotate around the mesh axis with
``lax.ppermute`` (one ICI hop per step — the TPU torus makes
neighbor-permute bandwidth-optimal), and every device accumulates its
queries' attention over each visiting block with the online-softmax
recurrence (running max / denominator / numerator), exactly like flash
attention tiles — so the result is bit-for-tolerance identical to full
softmax attention while no device ever materializes the (N, N) score
matrix or the full K/V.

Autodiff: the loop is a ``lax.scan`` and ``ppermute`` is linear, so
reverse-mode differentiation yields the correct counter-rotating ring for
dK/dV for free — no custom VJP needed (the collective's transpose is the
inverse permutation).

Communication: 2·(size−1) ppermute hops of the local K/V blocks forward
(K and V each), and the mirrored amount in backward — all nearest-neighbor
on the 'seq' ring, riding ICI, overlapping the per-block einsums.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ring_attention(q, k, v, axis_name: str, scale: Optional[float] = None):
    """Exact softmax attention with Q/K/V token-sharded over ``axis_name``.

    q, k, v: (..., n_local, d) — the local token shard; every rank must hold
    the same n_local (equal shards). Must run inside ``shard_map`` with
    ``axis_name`` in the mesh. Returns (..., n_local, d) in q.dtype: rank r's
    rows equal rows [r*n_local, (r+1)*n_local) of full-sequence attention.

    Accumulation is float32 (running max/denominator/numerator); the per-
    block P·V product is computed in v.dtype so the MXU still runs bf16
    under the bf16 policy.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    size = jax.lax.axis_size(axis_name)
    if size == 1:
        from picklebot_tpu.ops.attention import sdpa_xla
        return sdpa_xla(q, k, v, scale)
    perm = [(i, (i + 1) % size) for i in range(size)]

    m0 = jnp.full(q.shape[:-1] + (1,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros(q.shape[:-1] + (1,), jnp.float32)
    acc0 = jnp.zeros(q.shape[:-1] + (q.shape[-1],), jnp.float32)

    def accumulate(k_cur, v_cur, m, l, acc):
        s = jnp.einsum("...nd,...md->...nm", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)           # exp(-inf - finite) = 0 at init
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "...nm,...md->...nd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    # resident block first (no rotation), then rotate-and-accumulate
    # size-1 times: a rotate-AFTER-accumulate scan of length size would
    # emit one final wasted full K/V ppermute pair that XLA cannot DCE
    # inside the uniform loop body — pure ICI traffic returning blocks to
    # a home position nobody reads
    m, l, acc = accumulate(k, v, m0, l0, acc0)

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        m, l, acc = accumulate(k_cur, v_cur, m, l, acc)
        return (k_cur, v_cur, m, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, m, l, acc), None, length=size - 1)
    return (acc / l).astype(q.dtype)
