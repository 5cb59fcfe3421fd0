"""In-graph training augmentation (data/augment.py + the step wiring).

Contract: per-sample flip/crop/brightness on the preprocessed batch;
keys salted off the micro rng so the DISABLED path is bit-identical to a
step built without augmentation; eval never augments; shapes static.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.data.augment import Augment, apply_augment
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step

from tests.test_train_step import TinyNoBNNet, _data


def _x(rng, b=8, t=4, h=16, w=16, c=3):
    return jnp.asarray(rng.rand(b, t, h, w, c), jnp.float32)


def test_flip_is_per_sample_width_reversal(rng):
    x = _x(rng)
    out = jax.jit(lambda x: apply_augment(
        x, Augment(flip=True), jax.random.key(0)))(x)
    out = np.asarray(out)
    xin = np.asarray(x)
    flipped = xin[:, :, :, ::-1, :]
    per_sample = []
    for i in range(x.shape[0]):
        if np.array_equal(out[i], xin[i]):
            per_sample.append(0)
        elif np.array_equal(out[i], flipped[i]):
            per_sample.append(1)
        else:
            raise AssertionError(f"sample {i} is neither identity nor flip")
    # p=0.5 over 8 samples: both outcomes should appear for this seed
    assert 0 < sum(per_sample) < len(per_sample), per_sample


def test_crop_is_padded_translation(rng):
    x = _x(rng)
    p = 2
    out = jax.jit(lambda x: apply_augment(
        x, Augment(crop=p), jax.random.key(1)))(x)
    out = np.asarray(out)
    assert out.shape == x.shape
    xp = np.pad(np.asarray(x), ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
    h, w = x.shape[2], x.shape[3]
    offsets = set()
    for i in range(x.shape[0]):
        found = None
        for oy in range(2 * p + 1):
            for ox in range(2 * p + 1):
                if np.array_equal(out[i], xp[i, :, oy:oy + h, ox:ox + w, :]):
                    found = (oy, ox)
                    break
            if found:
                break
        assert found is not None, f"sample {i}: no offset reproduces output"
        offsets.add(found)
    assert len(offsets) > 1, "offsets should vary across samples"


def test_brightness_is_per_sample_scale(rng):
    x = _x(rng)
    b = 0.3
    out = np.asarray(jax.jit(lambda x: apply_augment(
        x, Augment(brightness=b), jax.random.key(2)))(x))
    xin = np.asarray(x)
    scales = []
    for i in range(x.shape[0]):
        ratio = out[i] / np.maximum(xin[i], 1e-9)
        s = float(np.median(ratio))
        np.testing.assert_allclose(ratio, s, rtol=1e-4)
        assert 1 - b <= s <= 1 + b
        scales.append(round(s, 4))
    assert len(set(scales)) > 1, "scales should vary across samples"


def test_disabled_augment_is_bit_identical(rng):
    """A step built with Augment() (all defaults) must produce bit-equal
    results to a step built with augment=None — the dropout/aug key split
    never runs when disabled."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng, accum=2, batch=4)

    s0 = create_train_state(model, opt, jax.random.key(0))
    plain = make_train_step(model, opt, "CE", sched,
                            policy=DtypePolicy.f32(), donate=False)
    s1 = create_train_state(model, opt, jax.random.key(0))
    with_off = make_train_step(model, opt, "CE", sched,
                               policy=DtypePolicy.f32(), donate=False,
                               augment=Augment())

    s0, m0 = plain(s0, feats, labels, jax.random.key(3))
    s1, m1 = with_off(s1, feats, labels, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(m0["loss"]),
                                  np.asarray(m1["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augmented_step_changes_grads_not_dropout(rng):
    """With augmentation ON the loss changes (different pixels) but the
    same seed still yields deterministic results (position-keyed)."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng, accum=2, batch=4)
    aug = Augment(flip=True, crop=2, brightness=0.2)

    def run():
        st = create_train_state(model, opt, jax.random.key(0))
        step = make_train_step(model, opt, "CE", sched,
                               policy=DtypePolicy.f32(), donate=False,
                               augment=aug)
        st, m = step(st, feats, labels, jax.random.key(3))
        return np.asarray(m["loss"])

    l1, l2 = run(), run()
    np.testing.assert_array_equal(l1, l2)  # deterministic

    st = create_train_state(model, opt, jax.random.key(0))
    plain = make_train_step(model, opt, "CE", sched,
                            policy=DtypePolicy.f32(), donate=False)
    _, m_plain = plain(st, feats, labels, jax.random.key(3))
    assert not np.array_equal(l1, np.asarray(m_plain["loss"]))


def test_config_validation():
    from picklebot_tpu.utils.config import Config

    Config(model_name="MobileNetSmall3D", augment_flip=True,
           augment_crop=4, augment_brightness=0.2).validate()
    with pytest.raises(ValueError, match="augment_crop"):
        Config(model_name="MobileNetSmall3D", augment_crop=-1).validate()
    with pytest.raises(ValueError, match="augment_brightness"):
        Config(model_name="MobileNetSmall3D",
               augment_brightness=1.5).validate()


@pytest.mark.slow
def test_train_loop_with_augmentation(tmp_path, monkeypatch):
    """train(config) end-to-end with all three augmentations on the
    8-device mesh: runs, losses finite."""
    from picklebot_tpu.train.loop import train
    from picklebot_tpu.utils.config import Config

    monkeypatch.chdir(tmp_path)
    cfg = Config(
        model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=1,
        max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
        criterion="CE", num_classes=13, effective_batch_size=2,
        data_backend="synthetic", synthetic_len=16,
        synthetic_shape=(8, 32, 32), t_bucket=8, max_frames=8,
        num_workers=2, optimizer="adamw8bit", data_parallel=8,
        augment_flip=True, augment_crop=2, augment_brightness=0.1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"),
    ).validate()
    summary = train(cfg)
    assert np.isfinite(summary["final_val_loss"])
