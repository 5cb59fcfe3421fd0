"""MultiHeadAttention head-packed backend wiring tests."""

import numpy as np
import jax.numpy as jnp

from picklebot_tpu.ops import attention as attn_mod
from picklebot_tpu.ops.attention import MultiHeadAttention


def test_mha_packed_backend_matches_xla(rng):
    """backend='packed' (forced head-packed kernel) must reproduce the xla
    backend's output on the same params."""
    a = MultiHeadAttention(32, heads=8, dim_head=16, backend="xla")
    b = MultiHeadAttention(32, heads=8, dim_head=16, backend="packed")
    v = a.init(0)
    x = jnp.asarray(rng.randn(2, 3, 40, 32).astype(np.float32))
    want, _ = a.apply(v, x)
    got, _ = b.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_mha_auto_selects_packed_above_threshold(rng, monkeypatch):
    """'auto' routes long sequences to the head-packed kernel and short
    ones to XLA; both must agree with the explicit xla backend."""
    monkeypatch.setattr(attn_mod, "_PACKED_MIN_SEQ", 64)
    a = MultiHeadAttention(32, heads=8, dim_head=16, backend="auto")
    ref = MultiHeadAttention(32, heads=8, dim_head=16, backend="xla")
    v = a.init(0)
    for n in (40, 96):    # below / above the (patched) threshold
        x = jnp.asarray(rng.randn(1, 2, n, 32).astype(np.float32))
        want, _ = ref.apply(v, x)
        got, _ = a.apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"n={n}")


def test_mha_auto_with_dropout_still_trains(rng):
    """Training with attention dropout must fall back to XLA (the kernel
    has no dropout path) without error."""
    m = MultiHeadAttention(32, heads=8, dim_head=16, dropout=0.1,
                           backend="auto")
    v = m.init(0)
    x = jnp.asarray(rng.randn(1, 2, 600, 32).astype(np.float32))
    import jax
    out, _ = m.apply(v, x, train=True, rng=jax.random.PRNGKey(0))
    assert out.shape == x.shape
