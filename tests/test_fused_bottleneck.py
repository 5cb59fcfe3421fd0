"""Fused bottleneck kernel vs the Bottleneck3D module (XLA path)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.ops import activations as act
from picklebot_tpu.ops.bottleneck import Bottleneck3D
from picklebot_tpu.ops.pallas.fused_bottleneck import fused_bottleneck


def _weights(rng, c, e, co, k, use_se):
    w1 = jnp.asarray(rng.randn(1, 1, 1, c, e).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.randn(1, k, k, 1, e).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(1, 1, 1, e, co).astype(np.float32) * 0.1)
    r = e // 4
    se_w1 = jnp.asarray(rng.randn(e, r).astype(np.float32) * 0.1)
    se_b1 = jnp.asarray(rng.randn(r).astype(np.float32) * 0.1)
    se_w2 = jnp.asarray(rng.randn(r, e).astype(np.float32) * 0.1)
    se_b2 = jnp.asarray(rng.randn(e).astype(np.float32) * 0.1)
    return w1, wd, w2, se_w1, se_b1, se_w2, se_b2


def _via_module(rng, x, weights, c, e, co, k, s, use_se):
    """Ground truth through the production Bottleneck3D (BN/act disabled)."""
    w1, wd, w2, se_w1, se_b1, se_w2, se_b2 = weights
    m = Bottleneck3D(c, co, e, stride=s, use_se=use_se, kernel_size=k,
                     nonlinearity=act.identity, batchnorm=False)
    v = m.init(0)
    v["params"]["pointwise_conv1"]["w"] = w1
    v["params"]["depthwise_conv"]["w"] = wd
    v["params"]["pointwise_conv2"]["w"] = w2
    if use_se:
        v["params"]["squeeze_excite"]["w1"] = se_w1
        v["params"]["squeeze_excite"]["b1"] = se_b1
        v["params"]["squeeze_excite"]["w2"] = se_w2
        v["params"]["squeeze_excite"]["b2"] = se_b2
    out, _ = m.apply(v, x, train=False)
    return out


@pytest.mark.parametrize("k,s,use_se", [
    (3, 1, False), (3, 2, False), (5, 2, False),
    (3, 1, True), (5, 1, True),
])
def test_fused_bottleneck_matches_module(rng, k, s, use_se):
    c, e, co = 8, 24, 16
    x = jnp.asarray(rng.rand(2, 5, 16, 16, c).astype(np.float32))
    weights = _weights(rng, c, e, co, k, use_se)
    want = _via_module(rng, x, weights, c, e, co, k, s, use_se)
    got = fused_bottleneck(x, *weights, k, s, use_se, 8)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bottleneck_gradients(rng):
    c, e, co, k, s = 4, 8, 4, 3, 1
    x = jnp.asarray(rng.rand(1, 3, 8, 8, c).astype(np.float32))
    weights = _weights(rng, c, e, co, k, True)

    def loss_fused(x, w1, wd, w2):
        return jnp.sum(fused_bottleneck(
            x, w1, wd, w2, *weights[3:], k, s, True, 8) ** 2)

    def loss_ref(x, w1, wd, w2):
        out = _via_module(rng, x, (w1, wd, w2) + weights[3:],
                          c, e, co, k, s, True)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, *weights[:3])
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, *weights[:3])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_kernel_with_bn_tail_matches_module(rng):
    """apply_fused_bottleneck (the retired-from-Bottleneck3D direct entry)
    + eval-mode BN/hardswish must equal the module's XLA path — the same
    comparison the evidence scripts record."""
    import jax
    from picklebot_tpu.ops import activations as act
    from picklebot_tpu.ops.pallas.fused_bottleneck import (
        apply_fused_bottleneck)
    m_ref = Bottleneck3D(8, 16, 24, stride=1, use_se=True, kernel_size=3)
    v = m_ref.init(0)
    x = jnp.asarray(rng.rand(2, 4, 16, 16, 8).astype(np.float32))
    want, _ = m_ref.apply(v, x, train=False)
    out = apply_fused_bottleneck(v["params"], x, 3, 1, True, jnp.float32)
    bn_p, bn_s = v["params"]["batchnorm"], v["state"]["batchnorm"]
    inv = jax.lax.rsqrt(jnp.asarray(bn_s["var"], jnp.float32) + 1e-5)
    got = act.hardswish((out - bn_s["mean"]) * inv
                        * bn_p["scale"] + bn_p["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
