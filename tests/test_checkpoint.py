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
