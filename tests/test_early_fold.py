"""early_fold: collapsed + lane-folded stem/block2 must be an exact rewrite.

The flag (config.early_fold / MobileNetLarge3D(early_fold=True)) routes the
stem and block2 through ops/folded.py: space-to-depth-style channel folding
with static gather maps plus the expand->depthwise->project linear collapse
(valid because reference mobilenet.py:47-96 puts BN+activation only after
the projection). Parameters, checkpoints, BN state paths and dropout rng
paths are identical to the plain model, so everything below demands
(near-)bit equality.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
from picklebot_tpu.ops.folded import (fold_nd, folded_conv_map,
                                      gather_weights, unfold_nd)


@pytest.fixture(scope="module")
def pair():
    plain = MobileNetLarge3D(num_classes=13)
    fold = MobileNetLarge3D(num_classes=13, early_fold=True)
    params = plain.init(0)
    return plain, fold, params


def test_param_tree_identical(pair):
    plain, fold, _ = pair
    p0, p1 = plain.init(0), fold.init(0)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)


def test_eval_logits_bit_equal_structure(pair):
    plain, fold, params = pair
    x = np.random.RandomState(1).randn(2, 8, 64, 64, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_train_mode_matches_including_dropout_and_bn_state(pair):
    """Same rng => bit-identical dropout masks (path-scoped keys) and the
    same BatchNorm running-stat updates."""
    plain, fold, params = pair
    x = np.random.RandomState(2).randn(2, 8, 64, 64, 3).astype(np.float32)
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
    x = np.random.RandomState(3).randn(1, 4, 32, 32, 3).astype(np.float32)

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


@pytest.fixture(scope="module")
def pair_small():
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D
    plain = MobileNetSmall3D(num_classes=13)
    fold = MobileNetSmall3D(num_classes=13, early_fold=True)
    params = plain.init(0)
    return plain, fold, params


def test_small_param_tree_identical(pair_small):
    plain, fold, _ = pair_small
    p0, p1 = plain.init(0), fold.init(0)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)


def test_small_eval_logits_match(pair_small):
    """Exercises the folded-SE partial-collapse path (block2[0], block3[0]
    carry SE) plus full collapses, vs the plain model."""
    plain, fold, params = pair_small
    x = np.random.RandomState(11).randn(2, 8, 64, 64, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_small_train_mode_and_gradients(pair_small):
    plain, fold, params = pair_small
    x = np.random.RandomState(12).randn(1, 4, 32, 32, 3).astype(np.float32)
    rng = jax.random.key(3)
    y0, s0 = plain.apply(params, x, train=True, rng=rng)
    y1, s1 = fold.apply(params, x, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

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


def test_movinet_eval_logits_match():
    """A2's every bottleneck carries SE and true 3D depthwise kernels —
    exercises the temporal-kernel partial collapse."""
    from picklebot_tpu.models.movinet import MoViNetA2
    plain = MoViNetA2(num_classes=13)
    fold = MoViNetA2(num_classes=13, early_fold=True)
    params = plain.init(0)
    p1 = fold.init(0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p1))
    x = np.random.RandomState(21).randn(2, 8, 64, 64, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_movinet_block4_span_logits_match():
    from picklebot_tpu.models.movinet import MoViNetA2
    plain = MoViNetA2(num_classes=5)
    fold = MoViNetA2(num_classes=5, early_fold=True, fold_span="block4")
    params = plain.init(0)
    x = np.random.RandomState(23).randn(1, 4, 32, 32, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_movinet_boundary_span_logits_match():
    from picklebot_tpu.models.movinet import MoViNetA2
    plain = MoViNetA2(num_classes=5)
    fold = MoViNetA2(num_classes=5, early_fold=True, fold_span="boundary")
    params = plain.init(0)
    x = np.random.RandomState(24).randn(1, 4, 32, 32, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_movinet_stem_span_logits_match():
    """fold_span='stem': only the stem conv runs folded; the unfold back
    to canonical is a pure W-major reshape."""
    from picklebot_tpu.models.movinet import MoViNetA2
    plain = MoViNetA2(num_classes=5)
    fold = MoViNetA2(num_classes=5, early_fold=True, fold_span="stem")
    params = plain.init(0)
    x = np.random.RandomState(25).randn(1, 4, 32, 32, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_movinet_gradients_match():
    from picklebot_tpu.models.movinet import MoViNetA2
    plain = MoViNetA2(num_classes=5)
    fold = MoViNetA2(num_classes=5, early_fold=True)
    params = plain.init(0)
    x = np.random.RandomState(22).randn(1, 4, 32, 32, 3).astype(np.float32)

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


@pytest.mark.parametrize("variant", ["xxs", "xs"])
def test_mobilevit_fold_logits_and_grads_match(variant):
    """conv1 (_ConvBNSiLU) + the four stem Bottleneck3Ds fold; transformer
    trunk untouched. Parametrized over size variants — the plans are built
    from each config's channel table."""
    from picklebot_tpu.models.mobilevit import MOBILEVIT_CONFIGS, MobileViT
    kw = dict(num_classes=7, depths=(1, 1, 1), attention_backend="xla",
              **MOBILEVIT_CONFIGS[variant])
    plain = MobileViT(**kw)
    fold = MobileViT(early_fold=True, **kw)
    params = plain.init(0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fold.init(0)))
    x = np.random.RandomState(31).randn(1, 4, 32, 32, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)

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


def test_mobilevit_trunk_span_matches():
    """fold_span='trunk': the three trunk bottlenecks run boundary-folded
    around canonical ViT blocks."""
    from picklebot_tpu.models.mobilevit import MOBILEVIT_CONFIGS, MobileViT
    kw = dict(num_classes=7, depths=(1, 1, 1), attention_backend="xla",
              **MOBILEVIT_CONFIGS["xxs"])
    plain = MobileViT(**kw)
    fold = MobileViT(early_fold=True, fold_span="trunk", **kw)
    params = plain.init(0)
    x = np.random.RandomState(32).randn(1, 4, 32, 32, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_small_boundary_span_matches(pair_small):
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D
    plain, _, params = pair_small
    fold = MobileNetSmall3D(num_classes=13, early_fold=True,
                            fold_span="boundary")
    x = np.random.RandomState(13).randn(2, 8, 64, 64, 3).astype(np.float32)
    y0 = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    y1 = jax.jit(lambda p, x: fold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-4)


def test_fold_unfold_roundtrip():
    x = np.random.RandomState(4).rand(2, 5, 32, 14, 24).astype(np.float32)
    z = fold_nd(jnp.asarray(x), (1, 4, 2))
    assert z.shape == (2, 5, 8, 7, 4 * 2 * 24)
    back = unfold_nd(z, (1, 4, 2), 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_folded_conv_map_matches_lax_conv():
    """The general builder reproduces a strided conv exactly for a
    nontrivial (in-fold, out-fold) pair on random weights."""
    from jax import lax
    rng = np.random.RandomState(5)
    cin, cout = 3, 5
    kernel, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    x = rng.rand(2, 6, 32, 8, cin).astype(np.float32)
    w = rng.randn(*kernel, cin, cout).astype(np.float32) * 0.2

    dn = lax.conv_dimension_numbers((1, 1, 1, 1, cin), w.shape,
                                    ("NTHWC", "THWIO", "NTHWC"))
    want = lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(w),
                                    stride, [(1, 1)] * 3,
                                    dimension_numbers=dn)

    plan = folded_conv_map(kernel, stride, padding, (1, 16, 2), (1, 8, 1),
                           cin, cout)
    z = fold_nd(jnp.asarray(x), (1, 16, 2))
    wf = gather_weights(plan, jnp.asarray(w))
    dnf = lax.conv_dimension_numbers((1, 1, 1, 1, z.shape[-1]), wf.shape,
                                     ("NTHWC", "THWIO", "NTHWC"))
    got = lax.conv_general_dilated(z, wf, plan.strides, list(plan.pads),
                                   dimension_numbers=dnf)
    F = math.prod(plan.folds_out)
    got = unfold_nd(got, plan.folds_out, cout)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("kernel,stride,folds_in,folds_out,shape", [
    # k1 pointwise, W-only fold
    ((1, 1, 1), (1, 1, 1), (1, 1, 8), (1, 1, 8), (2, 3, 8, 16, 4)),
    # k3 stride-1, H+W folds
    ((3, 3, 3), (1, 1, 1), (1, 4, 4), (1, 4, 4), (1, 4, 16, 16, 3)),
    # k3 stride-2, mixed folds (in = stride * out per dim)
    ((3, 3, 3), (2, 2, 2), (1, 8, 4), (1, 4, 2), (2, 6, 16, 16, 3)),
    # k5 stride-2, W-only (the Large3D block3 geometry class)
    ((1, 5, 5), (1, 2, 2), (1, 1, 8), (1, 1, 4), (1, 4, 12, 16, 6)),
    # k5 stride-1 deep fold
    ((1, 5, 5), (1, 1, 1), (1, 1, 16), (1, 1, 16), (1, 3, 12, 16, 2)),
    # 2D rank (the 2D+LSTM trunks): k3 stride-2 W fold
    ((3, 3), (2, 2), (1, 8), (1, 4), (5, 12, 16, 3)),
])
def test_folded_conv_geometry_sweep(kernel, stride, folds_in, folds_out,
                                    shape):
    """The general builder is exact across the geometry space the per-model
    plans sample from: every valid (kernel, stride, in-fold, out-fold)
    combination — 'same'-identity padding, rank 2 and 3, deep and mixed
    folds — must reproduce lax.conv on random weights."""
    from jax import lax
    rng = np.random.RandomState(11)
    cin, cout = shape[-1], 5
    rank = len(kernel)
    padding = tuple(k // 2 for k in kernel)
    x = rng.rand(*shape).astype(np.float32)
    w = (rng.randn(*kernel, cin, cout) * 0.2).astype(np.float32)

    spec = ("NTHWC", "THWIO", "NTHWC") if rank == 3 else \
        ("NHWC", "HWIO", "NHWC")
    dn = lax.conv_dimension_numbers((1,) * (rank + 1) + (cin,), w.shape,
                                    spec)
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), stride,
        [(p, p) for p in padding], dimension_numbers=dn)

    plan = folded_conv_map(kernel, stride, padding, folds_in, folds_out,
                           cin, cout)
    z = fold_nd(jnp.asarray(x), folds_in)
    wf = gather_weights(plan, jnp.asarray(w))
    dnf = lax.conv_dimension_numbers((1,) * (rank + 1) + (z.shape[-1],),
                                     wf.shape, spec)
    got = lax.conv_general_dilated(z, wf, plan.strides, list(plan.pads),
                                   dimension_numbers=dnf)
    got = unfold_nd(got, plan.folds_out, cout)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_folded_conv_map_rejects_bad_geometry():
    """Geometry violating the out=N/stride identity (k5 s2 p1:
    2p-k+s = -1 < 0) must fail loudly at build time, not produce wrong
    shapes (ADVICE round 2)."""
    with pytest.raises(ValueError, match="fold plan"):
        folded_conv_map((1, 5, 5), (1, 2, 2), (1, 1, 1),
                        (1, 8, 8), (1, 4, 4), 3, 5)


def test_early_fold_rejects_bad_spatial():
    fold = MobileNetLarge3D(num_classes=3, early_fold=True)
    params = fold.init(0)
    x = np.zeros((1, 4, 32, 40, 3), np.float32)  # W=40 % 16 != 0
    with pytest.raises(ValueError, match="fold"):
        fold.apply(params, x, train=False)


def test_fold_span_block4_matches(pair):
    """The extended span (block3 SE + block4[0] folded; measured slower on
    v5e but kept for other hardware) stays exact."""
    plain, _, params = pair
    ext = MobileNetLarge3D(num_classes=13, early_fold=True,
                           fold_span="block4")
    x = np.random.RandomState(7).randn(2, 8, 64, 64, 3).astype(np.float32)
    want = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    got = jax.jit(lambda p, x: ext.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_fold_span_boundary_matches(pair):
    """Boundary-folded block3/block4[0] (per-phase matmuls + canonical
    depthwise/SE; zero FLOP inflation) stays exact, including train-mode
    dropout masks and gradients."""
    plain, _, params = pair
    ext = MobileNetLarge3D(num_classes=13, early_fold=True,
                           fold_span="boundary")
    x = np.random.RandomState(8).randn(2, 8, 64, 64, 3).astype(np.float32)
    want = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    got = jax.jit(lambda p, x: ext.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    rng = jax.random.key(9)
    y0, s0 = plain.apply(params, x, train=True, rng=rng)
    y1, s1 = ext.apply(params, x, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-4, rtol=1e-3)

    def loss(model, p):
        return jnp.sum(model.apply(p, x, train=False)[0] ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(plain, p)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(ext, p)))(params)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k0))


def test_fold_variants_agree(pair):
    """The H-major and W-major phase assignments are the same math."""
    from picklebot_tpu.models.mobilenet3d import _early_fold_plans
    plain, fold, params = pair
    x = np.random.RandomState(6).randn(2, 8, 64, 64, 3).astype(np.float32)
    want = jax.jit(lambda p, x: plain.apply(p, x, train=False)[0])(params, x)
    hfold = MobileNetLarge3D(num_classes=13, early_fold=True)
    hfold._early_plans = _early_fold_plans("h")
    got = jax.jit(lambda p, x: hfold.apply(p, x, train=False)[0])(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_early_fold_through_registry_and_train_step():
    """Smoke: the config flag reaches the model and a train step runs."""
    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import create_train_state, make_train_step
    from picklebot_tpu.utils.config import Config

    cfg = Config(model_name="MobileNetLarge3D", num_classes=5,
                 early_fold=True)
    model = initialize_model(cfg)
    assert model._early_plans is not None
    opt = AdamW8bit(weight_decay=5e-4)
    step = make_train_step(model, opt, "CE", cosine_annealing_lr(1e-3, 10),
                           policy=DtypePolicy.f32(), donate=False)
    state = create_train_state(model, opt, 0)
    rng = np.random.RandomState(0)
    feats = rng.randint(0, 255, (1, 2, 4, 32, 32, 3)).astype(np.uint8)
    labels = rng.randint(0, 5, (1, 2)).astype(np.int32)
    state, metrics = step(state, feats, labels, jax.random.key(0))
    assert np.isfinite(float(np.mean(metrics["loss"])))
