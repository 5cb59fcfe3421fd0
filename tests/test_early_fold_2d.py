"""early_fold for the 2D+LSTM trunks must be an exact rewrite.

The 2D frame batch (B*T, H, W, C) carries the same C=16/24 early channels
as the 3D models — and the same 8x 128-lane padding — so the lane-folding
engine (ops/folded.py) applies per frame. These tests mirror
tests/test_early_fold.py: identical param trees, eval logits, train-mode
BN-state updates and gradients between the plain and folded executions.

Inputs are 224x224: the reference hardcodes AvgPool2d(7) for 7x7 maps
(mobilenet.py:347,441), so smaller frames don't reach the pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picklebot_tpu.models.mobilenet2d_lstm import (MobileNetLarge2D,
                                                   MobileNetSmall2D)

CASES = [
    ("large-block2", lambda f, s: MobileNetLarge2D(13, early_fold=f,
                                                   fold_span=s or "block2")),
    ("large-boundary", lambda f, s: MobileNetLarge2D(13, early_fold=f,
                                                     fold_span=s
                                                     or "boundary")),
    ("small-block3", lambda f, s: MobileNetSmall2D(13, early_fold=f,
                                                   fold_span=s or "block3")),
    ("small-boundary", lambda f, s: MobileNetSmall2D(13, early_fold=f,
                                                     fold_span=s
                                                     or "boundary")),
]


@pytest.fixture(scope="module", params=[c[0] for c in CASES])
def pair(request):
    ctor = dict(CASES)[request.param]
    plain = ctor(False, None)
    fold = ctor(True, None)
    params = plain.init(0)
    return plain, fold, params


def test_param_tree_identical(pair):
    plain, fold, _ = pair
    p0, p1 = plain.init(0), fold.init(0)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)


def test_eval_logits_match(pair):
    plain, fold, params = pair
    x = np.random.RandomState(1).randn(1, 2, 224, 224, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_train_mode_bn_state_matches(pair):
    plain, fold, params = pair
    x = np.random.RandomState(2).randn(1, 2, 224, 224, 3).astype(np.float32)
    rng = jax.random.key(7)
    y0, s0 = plain.apply(params, x, train=True, rng=rng)
    y1, s1 = fold.apply(params, x, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_gradients_match(pair):
    plain, fold, params = pair
    x = np.random.RandomState(3).randn(1, 1, 224, 224, 3).astype(np.float32)

    def loss(model, p):
        return jnp.sum(model.apply(p, x, train=False)[0] ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(plain, p)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(fold, p)))(params)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k0))
