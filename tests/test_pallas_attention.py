"""Flash-attention kernel tests (interpret mode on CPU; same code compiles
on TPU). Checked against the plain XLA softmax attention."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.ops.attention import sdpa_xla
from picklebot_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("n", [16, 128, 200, 384])
def test_flash_matches_xla(rng, n):
    d, scale = 16, 16 ** -0.5
    q = jnp.asarray(rng.randn(2, 3, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 3, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 3, n, d).astype(np.float32))
    want = sdpa_xla(q, k, v, scale)
    got = flash_attention(q, k, v, scale, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backward", ["pallas", "xla"])
@pytest.mark.parametrize("n", [96, 128, 200])
def test_flash_gradients_match_xla(rng, backward, n):
    """Both the fused Pallas backward kernels (dQ + dKV) and the
    rematerialized XLA VJP must match plain softmax-attention gradients —
    including ragged N (padded q rows / k columns)."""
    d, scale = 16, 16 ** -0.5
    q = jnp.asarray(rng.randn(1, 2, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, n, d).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, block_q=32,
                                       block_k=32, backward=backward) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_flash_backward_bf16(rng):
    """The Pallas backward must hold up in the training dtype."""
    n, d = 128, 16
    q = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)

    def loss(fn):
        return lambda q, k, v: jnp.sum(
            fn(q, k, v).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss(lambda q, k, v: flash_attention(q, k, v)),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda q, k, v: sdpa_xla(q, k, v, d ** -0.5)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_mha_pallas_packed_backend_matches_xla(rng):
    """MultiHeadAttention(backend='pallas_packed') — the packed-qkv wiring —
    must reproduce the xla backend's output on the same params."""
    from picklebot_tpu.ops.attention import MultiHeadAttention
    a = MultiHeadAttention(32, heads=4, dim_head=16, backend="xla")
    b = MultiHeadAttention(32, heads=4, dim_head=16, backend="pallas_packed")
    v = a.init(0)
    x = jnp.asarray(rng.randn(2, 3, 40, 32).astype(np.float32))
    want, _ = a.apply(v, x)
    got, _ = b.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_flash_qkvpacked_matches_split(rng):
    """Packed-qkv entry point (flash-attn package layout, reference
    profiling_mobilevit.py:82): (..., N, 3, H, D) in, (..., N, H, D) out."""
    from picklebot_tpu.ops.pallas.flash_attention import (
        flash_attention_qkvpacked)
    b, n, h, d = 2, 64, 3, 16
    qkv = jnp.asarray(rng.randn(b, n, 3, h, d).astype(np.float32))
    got = flash_attention_qkvpacked(qkv)
    q = jnp.moveaxis(qkv[..., 0, :, :], -2, -3)
    k = jnp.moveaxis(qkv[..., 1, :, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :, :], -2, -3)
    want = jnp.moveaxis(sdpa_xla(q, k, v, d ** -0.5), -3, -2)
    assert got.shape == (b, n, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_flash_bf16(rng):
    n, d = 128, 16
    q = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)
    want = sdpa_xla(q, k, v, d ** -0.5)
    got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
