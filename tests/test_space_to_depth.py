"""Space-to-depth stem: exact-rewrite guarantees.

config.space_to_depth folds the stem conv's stride-2 dims (k=3, s=2, p=1)
2x into channels at apply time — parameters are untouched, so the transform
must be logit-exact against the plain path for the same param pytree, for
both forward and gradients. Matches the reference stem it rewrites
(/root/reference/mobilenet.py:140-144); the rewrite itself is TPU-layout
motivated (3 of 128 lanes used at 224^2 -> 24 lanes at 112^2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picklebot_tpu.core.module import Ctx
from picklebot_tpu.models.mobilenet3d import (MobileNetLarge3D,
                                              MobileNetSmall3D)
from picklebot_tpu.ops.conv import Conv3d


def _logits_fn(model):
    return jax.jit(lambda p, x: model.apply(p, x, train=False)[0])


@pytest.mark.parametrize("cls", [MobileNetLarge3D, MobileNetSmall3D])
def test_s2d_logits_match_plain_stem(cls):
    plain = cls(num_classes=13)
    s2d = cls(num_classes=13, space_to_depth=True)
    params = plain.init(0)  # same spec: params are interchangeable
    x = np.random.RandomState(1).randn(2, 8, 64, 64, 3).astype(np.float32)
    y0 = _logits_fn(plain)(params, x)
    y1 = _logits_fn(s2d)(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)


def test_s2d_param_spec_unchanged():
    plain = MobileNetLarge3D(num_classes=13)
    s2d = MobileNetLarge3D(num_classes=13, space_to_depth=True)
    p0, p1 = plain.init(0), s2d.init(0)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)


def test_s2d_gradients_match_plain_stem():
    plain = MobileNetSmall3D(num_classes=3)
    s2d = MobileNetSmall3D(num_classes=3, space_to_depth=True)
    params = plain.init(0)
    x = np.random.RandomState(2).randn(1, 4, 32, 32, 3).astype(np.float32)

    def loss(model, p):
        return jnp.sum(model.apply(p, x, train=False)[0] ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(plain, p)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(s2d, p)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_s2d_conv_matches_plain_conv_directly():
    """Unit-level: the folded conv == lax stride-2 conv on random weights,
    including the temporal dim (all three dims fold for the 3D stem)."""
    conv_p = Conv3d(3, 16, 3, stride=2, padding=1, bias=True)
    conv_f = Conv3d(3, 16, 3, stride=2, padding=1, bias=True,
                    space_to_depth=True)
    assert conv_f.fold_dims == (0, 1, 2)
    params = conv_p.init(7)
    x = np.random.RandomState(3).randn(2, 6, 10, 14, 3).astype(np.float32)
    y0 = conv_p.apply(params, x, train=False)[0]
    y1 = conv_f.apply(params, x, train=False)[0]
    assert y0.shape == (2, 3, 5, 7, 16)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)


def test_s2d_mixed_stride_folds_only_eligible_dims():
    """MoViNet-style stem: (1,3,3) kernel, (1,2,2) stride folds H,W only."""
    conv_p = Conv3d(3, 16, (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1),
                    bias=False)
    conv_f = Conv3d(3, 16, (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1),
                    bias=False, space_to_depth=True)
    assert conv_f.fold_dims == (1, 2)
    params = conv_p.init(9)
    x = np.random.RandomState(4).randn(1, 5, 12, 16, 3).astype(np.float32)
    y0 = conv_p.apply(params, x, train=False)[0]
    y1 = conv_f.apply(params, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)


def test_s2d_movinet_logits_match():
    from picklebot_tpu.models.movinet import MoViNetA2
    plain = MoViNetA2(num_classes=13)
    s2d = MoViNetA2(num_classes=13, space_to_depth=True)
    params = plain.init(0)
    x = np.random.RandomState(5).rand(1, 8, 64, 64, 3).astype(np.float32)
    y0 = _logits_fn(plain)(params, x)
    y1 = _logits_fn(s2d)(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)


def test_s2d_mobilevit_logits_match():
    from picklebot_tpu.models.mobilevit import MobileViT
    kw = dict(dims=[32, 32, 32],
              channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],
              num_classes=13, depths=(1, 1, 1), attention_backend="xla")
    plain = MobileViT(**kw)
    s2d = MobileViT(**kw, space_to_depth=True)
    params = plain.init(0)
    x = np.random.RandomState(6).rand(1, 4, 32, 32, 3).astype(np.float32)
    y0 = _logits_fn(plain)(params, x)
    y1 = _logits_fn(s2d)(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)


def test_s2d_odd_input_raises():
    conv_f = Conv3d(3, 16, 3, stride=2, padding=1, space_to_depth=True)
    params = conv_f.init(0)
    x = np.zeros((1, 4, 7, 8, 3), np.float32)  # odd H
    with pytest.raises(ValueError, match="even input"):
        conv_f.apply(params, x, train=False)
