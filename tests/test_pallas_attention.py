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


def test_flash_gradients_match_xla(rng):
    n, d, scale = 96, 16, 16 ** -0.5
    q = jnp.asarray(rng.randn(1, 2, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, n, d).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale,
                                       block_q=32, block_k=32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


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
