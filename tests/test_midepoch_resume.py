"""Step-interval checkpointing + exact mid-epoch resume
(config checkpoint_every_steps; train/loop.py, train/checkpoint.py,
data/loader.py skip()).

The reference restarts whole epochs on any failure (its "resume" assigns
the checkpoint *path* to start_epoch, train.py:234). Here a mid-epoch
snapshot records the loop position and the loader fast-forwards through
the epoch permutation (no decode cost), with position-keyed dropout rng —
so an interrupted-and-resumed run is BIT-IDENTICAL to an uninterrupted
one."""

import glob
import os

import numpy as np
import pytest

import jax

from picklebot_tpu.train import checkpoint as ckpt
from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config


def _cfg(tmp_path, tag, **kw):
    base = dict(
        model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=2,
        max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
        criterion="CE", num_classes=13, effective_batch_size=2,
        data_backend="synthetic", synthetic_len=12,
        synthetic_shape=(8, 32, 32), t_bucket=8, max_frames=8,
        num_workers=2, optimizer="adamw", data_parallel=1,
        checkpoint_dir=str(tmp_path / tag / "ckpt"),
        log_dir=str(tmp_path / tag / "runs"))
    base.update(kw)
    return Config(**base).validate()


def test_latest_checkpoint_ordering(tmp_path):
    """step_<e> (end of epoch e) dominates step_<e>_<n>; later epochs
    dominate earlier ones."""
    d = tmp_path / "snaps"
    for name in ["step_0_2", "step_0", "step_1_2", "step_1_4"]:
        (d / name).mkdir(parents=True)
    assert ckpt.latest_checkpoint(str(d)).endswith("step_1_4")
    (d / "step_1").mkdir()
    assert ckpt.latest_checkpoint(str(d)).endswith("step_1")
    (d / "step_2_1").mkdir()
    assert ckpt.latest_checkpoint(str(d)).endswith("step_2_1")


def test_prune_midepoch(tmp_path):
    d = tmp_path / "snaps"
    for name in ["step_0_2", "step_0_4", "step_0", "step_1_2"]:
        (d / name).mkdir(parents=True)
    ckpt.prune_midepoch(str(d), keep=1)
    left = sorted(os.listdir(d))
    assert left == ["step_0", "step_1_2"]  # end-of-epoch never touched


def test_loader_skip_matches_tail(rng):
    """skip(n) yields exactly the batches an unskipped epoch produces
    from position n (same permutation, zero decode for the skipped part)."""
    from picklebot_tpu.data.dataset import ClipDataset
    from picklebot_tpu.data.loader import DataLoader
    ds = ClipDataset("", "", backend="synthetic", synthetic_len=10,
                     synthetic_shape=(4, 16, 16))
    dl = DataLoader(ds, 2, shuffle=True, num_workers=2, t_bucket=4,
                    max_frames=4, seed=7, drop_last=True)
    dl.set_epoch(3)
    full = list(dl)
    dl.set_epoch(3)
    dl.skip(2)
    tail = list(dl)
    assert len(tail) == len(full) - 2
    for (f_a, l_a), (f_b, l_b) in zip(full[2:], tail):
        np.testing.assert_array_equal(f_a, f_b)
        np.testing.assert_array_equal(l_a, l_b)
    # one-shot: the next iteration is full again
    dl.set_epoch(3)
    assert len(list(dl)) == len(full)


def _interrupt_after(monkeypatch_ctx, n_supers):
    """Patch the loop's make_train_step so the (n_supers+1)-th optimizer
    step raises KeyboardInterrupt — a deterministic preemption exactly
    where SIGTERM would land, independent of the device_prefetch depth."""
    import picklebot_tpu.train.loop as loop_mod
    real_make = loop_mod.make_train_step
    counter = {"n": 0}

    def make(*a, **k):
        fn = real_make(*a, **k)

        def wrapped(*args):
            if counter["n"] >= n_supers:
                raise KeyboardInterrupt("injected preemption")
            counter["n"] += 1
            return fn(*args)

        return wrapped

    monkeypatch_ctx.setattr(loop_mod, "make_train_step", make)


@pytest.mark.slow
def test_midepoch_resume_bit_identical(tmp_path, monkeypatch):
    """Preempt after 2 optimizer steps, auto-resume from the mid-epoch
    snapshot, finish the epoch: losses and final params/opt-state/BN are
    bit-identical to the uninterrupted run (same data order via loader
    fast-forward, same dropout via position-keyed rng, same optimizer
    trajectory via the full snapshot)."""
    monkeypatch.chdir(tmp_path)
    # A: uninterrupted (6 optimizer steps: 12 clips / batch 2)
    a = train(_cfg(tmp_path, "a"))
    fin_a = sorted(glob.glob(str(tmp_path / "a" / "ckpt" / "*_finished"
                                 / "step_*")))[-1]

    # B, phase 1: same run, snapshot every 2 steps, preempted after step 2
    with monkeypatch.context() as m:
        _interrupt_after(m, 2)
        train(_cfg(tmp_path, "b", checkpoint_every_steps=2))
    snap = str(tmp_path / "b" / "ckpt" / "MobileNetSmall3D" / "step_0_2")
    assert os.path.isdir(snap)

    # B, phase 2: auto-resume finds the mid-epoch snapshot, finishes
    b = train(_cfg(tmp_path, "b", checkpoint_every_steps=2,
                   auto_resume=True))
    fin_b = sorted(glob.glob(str(tmp_path / "b" / "ckpt" / "*_finished"
                                 / "step_*")))[-1]
    # it ran only the remaining 4 optimizer steps
    assert len(b["train_losses"]) == len(a["train_losses"]) - 2
    # and the tail losses are the uninterrupted run's tail, bit-for-bit
    np.testing.assert_array_equal(np.asarray(b["train_losses"]),
                                  np.asarray(a["train_losses"])[2:])

    pa = ckpt.restore_checkpoint(fin_a)
    pb = ckpt.restore_checkpoint(fin_b)
    for key in ("params", "model_state", "opt_state"):
        la = jax.tree_util.tree_leaves(pa[key])
        lb = jax.tree_util.tree_leaves(pb[key])
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # TB-step continuity: the resumed run's loop_state ends where A's does
    np.testing.assert_array_equal(np.asarray(pa["loop_state"]),
                                  np.asarray(pb["loop_state"]))


@pytest.mark.slow
def test_auto_resume_prefers_midepoch_snapshot(tmp_path, monkeypatch):
    """A mid-epoch snapshot of epoch 1 outranks the end-of-epoch snapshot
    of epoch 0; auto_resume continues inside epoch 1."""
    monkeypatch.chdir(tmp_path)
    # preempt 2 steps into epoch 1 (6 supers/epoch + 2)
    with monkeypatch.context() as m:
        _interrupt_after(m, 8)
        train(_cfg(tmp_path, "r", max_iters=2, checkpoint_every_steps=2))
    d = str(tmp_path / "r" / "ckpt" / "MobileNetSmall3D")
    latest = ckpt.latest_checkpoint(d)
    assert latest.endswith("step_1_2"), latest
    out = train(_cfg(tmp_path, "r", max_iters=2, auto_resume=True))
    # resumed inside epoch 1: only its remaining 4 steps ran
    assert len(out["train_losses"]) == 4
