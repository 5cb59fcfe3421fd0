"""Label smoothing (train/losses.py smoothed_* + the step wiring).

Parity oracle: torch's own label_smoothing semantics. Zero smoothing must
leave the step bit-identical to the default build.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.train.losses import (bce_with_logits, cross_entropy,
                                        smoothed_bce,
                                        smoothed_cross_entropy)
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step

from tests.test_train_step import TinyNoBNNet, _data


def test_smoothed_ce_matches_torch(rng):
    import torch

    logits = rng.randn(32, 13).astype(np.float32) * 3
    labels = rng.randint(0, 13, (32,)).astype(np.int64)
    for eps in (0.05, 0.1, 0.3):
        ours = float(smoothed_cross_entropy(eps)(
            jnp.asarray(logits), jnp.asarray(labels)))
        want = float(torch.nn.CrossEntropyLoss(label_smoothing=eps)(
            torch.from_numpy(logits), torch.from_numpy(labels)))
        np.testing.assert_allclose(ours, want, rtol=1e-6)
    # eps=0 degenerates to plain CE
    np.testing.assert_allclose(
        float(smoothed_cross_entropy(0.0)(jnp.asarray(logits),
                                          jnp.asarray(labels))),
        float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels))),
        rtol=1e-7)


def test_smoothed_bce_matches_torch(rng):
    import torch

    logits = rng.randn(32, 1).astype(np.float32) * 3
    labels = rng.randint(0, 2, (32, 1)).astype(np.float32)
    for eps in (0.1, 0.2):
        ours = float(smoothed_bce(eps)(jnp.asarray(logits),
                                       jnp.asarray(labels)))
        sm = torch.from_numpy(labels) * (1 - eps) + eps / 2
        want = float(torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(logits), sm))
        np.testing.assert_allclose(ours, want, rtol=1e-6)
    np.testing.assert_allclose(
        float(smoothed_bce(0.0)(jnp.asarray(logits), jnp.asarray(labels))),
        float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels))),
        rtol=1e-7)


def test_zero_smoothing_is_bit_identical(rng):
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng, accum=2, batch=4)

    s0 = create_train_state(model, opt, jax.random.key(0))
    plain = make_train_step(model, opt, "CE", sched,
                            policy=DtypePolicy.f32(), donate=False)
    s1 = create_train_state(model, opt, jax.random.key(0))
    zero = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), donate=False,
                           label_smoothing=0.0)
    s0, m0 = plain(s0, feats, labels, jax.random.key(1))
    s1, m1 = zero(s1, feats, labels, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(m0["loss"]),
                                  np.asarray(m1["loss"]))


def test_smoothing_changes_loss_keeps_accuracy_counting(rng):
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng, accum=1, batch=8)

    def run(eps):
        st = create_train_state(model, opt, jax.random.key(0))
        step = make_train_step(model, opt, "CE", sched,
                               policy=DtypePolicy.f32(), donate=False,
                               label_smoothing=eps)
        st, m = step(st, feats, labels, jax.random.key(1))
        return (float(np.asarray(m["loss"])[0]),
                float(np.asarray(m["correct"]).sum()))

    l0, c0 = run(0.0)
    l1, c1 = run(0.1)
    assert l1 != l0          # the objective moved
    assert c1 == c0          # accuracy counting stays on hard labels


def test_config_validation():
    from picklebot_tpu.utils.config import Config

    Config(model_name="MobileNetSmall3D", label_smoothing=0.1).validate()
    with pytest.raises(ValueError, match="label_smoothing"):
        Config(model_name="MobileNetSmall3D", label_smoothing=1.0).validate()
