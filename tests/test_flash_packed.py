"""Head-packed flash attention kernel tests (interpret mode on CPU; the
same code compiles on TPU). Reference: plain XLA softmax attention run on
the split-head view of the same packed tensors."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.ops.attention import sdpa_xla
from picklebot_tpu.ops.pallas.flash_packed import flash_attention_packed


def _sdpa_packed_ref(q, k, v, heads, scale):
    """Split (..., N, H*D) -> per-head sdpa -> merge back."""
    def split(t):
        t = t.reshape(t.shape[:-1] + (heads, t.shape[-1] // heads))
        return jnp.swapaxes(t, -2, -3)
    out = sdpa_xla(split(q), split(k), split(v), scale)
    out = jnp.swapaxes(out, -2, -3)
    return out.reshape(out.shape[:-2] + (q.shape[-1],))


@pytest.mark.parametrize("n", [16, 128, 200, 384])
@pytest.mark.parametrize("heads", [1, 4, 8])
def test_packed_matches_xla(rng, n, heads):
    inner = 128
    scale = (inner // heads) ** -0.5
    q = jnp.asarray(rng.randn(2, n, inner).astype(np.float32))
    k = jnp.asarray(rng.randn(2, n, inner).astype(np.float32))
    v = jnp.asarray(rng.randn(2, n, inner).astype(np.float32))
    want = _sdpa_packed_ref(q, k, v, heads, scale)
    got = flash_attention_packed(q, k, v, heads, scale,
                                 block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_packed_leading_batch_dims(rng):
    """MobileViT passes (B, P, N, inner) — leading dims are batch-like."""
    q = jnp.asarray(rng.randn(2, 3, 40, 128).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 3, 40, 128).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 3, 40, 128).astype(np.float32))
    want = _sdpa_packed_ref(q, k, v, 8, 16 ** -0.5)
    got = flash_attention_packed(q, k, v, 8)
    assert got.shape == q.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n", [96, 128, 200])
def test_packed_gradients_match_xla(rng, n):
    """Fused packed dQ/dKV kernels vs plain softmax-attention gradients,
    including ragged N (padded q rows / masked k columns)."""
    heads, inner = 8, 128
    scale = 16 ** -0.5
    q = jnp.asarray(rng.randn(2, n, inner).astype(np.float32))
    k = jnp.asarray(rng.randn(2, n, inner).astype(np.float32))
    v = jnp.asarray(rng.randn(2, n, inner).astype(np.float32))

    def loss_packed(q, k, v):
        return jnp.sum(flash_attention_packed(
            q, k, v, heads, scale, block_q=32, block_k=32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_sdpa_packed_ref(q, k, v, heads, scale) ** 2)

    g1 = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_packed_bf16(rng):
    n = 128
    q = jnp.asarray(rng.randn(2, n, 128), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, n, 128), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, n, 128), jnp.bfloat16)
    want = _sdpa_packed_ref(q, k, v, 8, 16 ** -0.5)
    got = flash_attention_packed(q, k, v, 8)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_packed_backward_bf16(rng):
    n = 128
    q = jnp.asarray(rng.randn(2, n, 128), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, n, 128), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, n, 128), jnp.bfloat16)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss(lambda q, k, v: flash_attention_packed(q, k, v, 8)),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda q, k, v: _sdpa_packed_ref(q, k, v, 8,
                                                        16 ** -0.5)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)
