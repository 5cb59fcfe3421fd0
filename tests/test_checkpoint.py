"""Checkpoint tests: Orbax round-trip, resume continuity, latest-lookup."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.train import checkpoint as ckpt
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import (TrainState, create_train_state,
                                      make_train_step)
from tests.test_train_step import TinyVideoNet, _data


def test_orbax_roundtrip(tmp_path):
    model = TinyVideoNet()
    opt = AdamW()
    state = create_train_state(model, opt, 0)
    payload = jax.device_get(state)._asdict()
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 3, payload)
    assert os.path.isdir(path)
    restored = ckpt.restore_checkpoint(path, payload)
    for a, b in zip(jax.tree_util.tree_leaves(payload),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.latest_checkpoint(str(tmp_path / "ck")) == path


def test_resume_continues_training(rng, tmp_path):
    """Save mid-training, restore, continue: trajectories must match a
    run that never stopped (full state incl. optimizer moments + epoch —
    the reference cannot do this, train.py:230-235 restores weights only)."""
    model = TinyVideoNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    step = make_train_step(model, opt, "CE", sched, donate=False)
    feats, labels = _data(rng)

    state = create_train_state(model, opt, 0)
    for i in range(3):
        state, _ = step(state, feats, labels, jax.random.key(i))
    payload = jax.device_get(state)._asdict()
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 3, payload)

    # continue directly
    direct = state
    for i in range(3, 6):
        direct, _ = step(direct, feats, labels, jax.random.key(i))

    # restore and continue
    restored = TrainState(**ckpt.restore_checkpoint(path, payload))
    resumed = restored
    for i in range(3, 6):
        resumed, _ = step(resumed, feats, labels, jax.random.key(i))

    for a, b in zip(jax.tree_util.tree_leaves(direct.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_strip_compile_prefix():
    sd = {"_orig_mod.block1.0.weight": 1, "block2.bias": 2}
    out = ckpt.strip_compile_prefix(sd)
    assert out == {"block1.0.weight": 1, "block2.bias": 2}


def test_prune_epochs(tmp_path):
    """keep_checkpoints retention: only the newest N end-of-epoch
    snapshots survive; mid-epoch snapshots are untouched."""
    from picklebot_tpu.train.checkpoint import prune_epochs

    d = tmp_path / "ck"
    d.mkdir()
    for name in ("step_0", "step_1", "step_2", "step_10", "step_3_5",
                 "not_a_step"):
        (d / name).mkdir()
    prune_epochs(str(d), keep=2)
    left = sorted(p.name for p in d.iterdir())
    assert left == ["not_a_step", "step_10", "step_2", "step_3_5"], left
    # keep=0 disables (never deletes)
    prune_epochs(str(d), keep=0)
    assert sorted(p.name for p in d.iterdir()) == left


def test_train_loop_keep_checkpoints(tmp_path, monkeypatch):
    """train(config) with keep_checkpoints=2 over 3 epochs retains only
    the newest two step_<e> snapshots (plus the finished dir)."""
    import glob

    from picklebot_tpu.train.loop import train
    from picklebot_tpu.utils.config import Config

    monkeypatch.chdir(tmp_path)
    cfg = Config(
        model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=2,
        max_iters=3, eval_interval=1, weight_decay=5e-4, use_autocast=False,
        criterion="CE", num_classes=13, effective_batch_size=2,
        data_backend="synthetic", synthetic_len=8,
        synthetic_shape=(8, 32, 32), t_bucket=8, max_frames=8,
        num_workers=2, optimizer="adamw8bit", data_parallel=1,
        keep_checkpoints=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"),
    ).validate()
    train(cfg)
    snaps = sorted(os.path.basename(p) for p in glob.glob(
        str(tmp_path / "ckpt" / "MobileNetSmall3D" / "step_*")))
    assert snaps == ["step_1", "step_2"], snaps
    assert glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*"))
