"""Stride-1 folded-conv Pallas kernel tests (interpret mode on CPU; same
code compiles on TPU). Reference: lax.conv_general_dilated on the 5D
folded layout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.ops.pallas.folded_conv import (
    _ref_conv, folded_conv_s1, folded_conv_s1_eligible)


def _pads(k):
    kt, kh, kw = k
    return (((kt - 1) // 2,) * 2, ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)


@pytest.mark.parametrize("shape,co,k", [
    ((1, 4, 6, 5, 32), 48, (3, 3, 3)),   # MoViNet b2_1 geometry (small)
    ((2, 3, 4, 4, 64), 32, (1, 3, 3)),   # kt=1 (MobileNet-style)
    ((1, 5, 4, 3, 32), 32, (3, 3, 1)),   # kw=1 (no wb taps)
    ((1, 3, 5, 4, 32), 32, (1, 5, 3)),   # kh=5
])
def test_folded_conv_s1_matches_xla(rng, shape, co, k):
    pads = _pads(k)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(*k, shape[-1], co).astype(np.float32) * 0.1)
    assert folded_conv_s1_eligible(x.shape, w.shape, (1, 1, 1), pads)
    want = _ref_conv(x, w, pads)
    got = folded_conv_s1(x, w, pads, shape[3])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_folded_conv_s1_gradients(rng):
    shape, co, k = (1, 4, 6, 5, 32), 48, (3, 3, 3)
    pads = _pads(k)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(*k, shape[-1], co).astype(np.float32) * 0.1)

    def lp(x, w):
        return jnp.sum(folded_conv_s1(x, w, pads, shape[3]) ** 2)

    def lr(x, w):
        return jnp.sum(_ref_conv(x, w, pads) ** 2)

    g1 = jax.grad(lp, argnums=(0, 1))(x, w)
    g2 = jax.grad(lr, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_folded_conv_s1_bf16(rng):
    shape, co, k = (2, 3, 4, 4, 64), 64, (3, 3, 3)
    pads = _pads(k)
    x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    w = jnp.asarray(rng.randn(*k, shape[-1], co) * 0.1, jnp.bfloat16)
    want = np.asarray(_ref_conv(x, w, pads), np.float32)
    got = np.asarray(folded_conv_s1(x, w, pads, shape[3]), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_eligibility_gate():
    w_shape = (3, 3, 3, 64, 160)
    ok_pads = _pads((3, 3, 3))
    assert folded_conv_s1_eligible((1, 2, 4, 4, 64), w_shape, (1, 1, 1),
                                   ok_pads)
    # strided, asymmetric, or narrow-channel cases must be rejected
    assert not folded_conv_s1_eligible((1, 2, 4, 4, 64), w_shape, (1, 2, 1),
                                       ok_pads)
    assert not folded_conv_s1_eligible(
        (1, 2, 4, 4, 64), w_shape, (1, 1, 1),
        ((2, 0), (1, 1), (1, 1)))       # reference temporal-inflation pads
    assert not folded_conv_s1_eligible((1, 2, 4, 4, 16),
                                       (3, 3, 3, 16, 160), (1, 1, 1),
                                       ok_pads)
