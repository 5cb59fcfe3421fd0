"""Best-checkpoint tracking (config save_best) and early stopping
(config early_stop_patience).

Determinism trick: learning_rate=0 keeps params fixed (only BN running
stats drift, moving val loss by tiny amounts), and early_stop_min_delta=10
makes those jiggles never count as improvement — so eval 0 improves
(anything beats inf) and every later eval does not: patience P stops the
run after exactly 1 + P evals.
"""

import glob
import os

import numpy as np
import pytest

from picklebot_tpu.train.loop import train
from tests.test_train_loop import _smoke_config


@pytest.mark.slow
def test_early_stop_halts_after_patience(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _smoke_config(tmp_path, learning_rate=0.0, max_iters=10,
                        early_stop_patience=2, early_stop_min_delta=10.0)
    summary = train(cfg)
    assert summary["stopped_early"] is True
    # evals at epochs 0 (improve), 1, 2 (patience exhausted) -> 3 evals
    assert len(summary["val_losses"]) == 3
    # near-constant loss sanity: params never moved at lr=0 (only BN
    # running stats drift between epochs)
    np.testing.assert_allclose(summary["val_losses"][0],
                               summary["val_losses"][-1], rtol=0.2)
    # the graceful finish still wrote the final checkpoint + statistics
    assert glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*"))
    assert glob.glob(str(tmp_path / "statistics" / "*_val_losses.npy"))


@pytest.mark.slow
def test_save_best_writes_and_prunes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _smoke_config(tmp_path, max_iters=3, save_best=True)
    summary = train(cfg)
    assert summary["stopped_early"] is False
    best_dirs = glob.glob(
        str(tmp_path / "ckpt" / "MobileNetSmall3D_best" / "step_*"))
    assert best_dirs, "save_best wrote no snapshot"
    # keep-1 retention pattern: at most the newest old best + the new one
    assert len(best_dirs) <= 2
    # the newest best snapshot corresponds to the argmin of the val curve
    epochs = sorted(int(os.path.basename(d).split("_")[1])
                    for d in best_dirs)
    vl = summary["val_losses"]
    assert epochs[-1] == int(np.argmin(vl))
    assert summary["best_val_loss"] == min(vl)
    # it restores as a full training snapshot
    from picklebot_tpu.train.checkpoint import (latest_checkpoint,
                                                restore_checkpoint)
    path = latest_checkpoint(str(tmp_path / "ckpt" / "MobileNetSmall3D_best"))
    payload = restore_checkpoint(path)
    assert "params" in payload and "opt_state" in payload


@pytest.mark.slow
def test_early_stop_state_survives_resume(tmp_path, monkeypatch):
    """best/patience are checkpointed: an interrupted+resumed run stops at
    the same eval an uninterrupted one would. Without the restore, the
    first post-resume eval always "improves" (best resets to inf) and
    patience restarts, so the resumed run below would need 3 more evals
    instead of 1 (ADVICE round 3, medium)."""
    monkeypatch.chdir(tmp_path)
    kw = dict(learning_rate=0.0, early_stop_patience=2,
              early_stop_min_delta=10.0)
    # run A: evals at epoch 0 (improves: anything beats inf) and epoch 1
    # (lr=0 jiggle < min_delta -> evals_since_improve=1 in the snapshot)
    cfg = _smoke_config(tmp_path, max_iters=2, **kw)
    sa = train(cfg)
    assert sa["stopped_early"] is False and len(sa["val_losses"]) == 2
    from picklebot_tpu.train.checkpoint import latest_checkpoint
    snap = latest_checkpoint(str(tmp_path / "ckpt" / "MobileNetSmall3D"))
    # run B resumes: epoch 2's eval exhausts patience immediately (1 eval),
    # exactly like an uninterrupted max_iters=10 run (3 evals total)
    cfg2 = _smoke_config(tmp_path, max_iters=10, checkpoint=snap, **kw)
    sb = train(cfg2)
    assert sb["stopped_early"] is True
    assert len(sb["val_losses"]) == 1
    # the restored best carries through to the summary
    assert np.isclose(sb["best_val_loss"], min(sa["val_losses"]), rtol=0.2)


def test_config_validates_early_stop():
    from picklebot_tpu.utils.config import Config
    with pytest.raises(ValueError, match="early_stop_patience"):
        Config(model_name="MobileNetSmall3D",
               early_stop_patience=-1).validate()


@pytest.mark.slow
def test_warm_start_resets_run_state(tmp_path, monkeypatch):
    """config warm_start: an explicit checkpoint is a fine-tune DONOR —
    weights + BN stats load, but epoch, optimizer, TB step and the
    early-stop/best state start fresh. Without it, a warm start from a
    converged run inherits its best_val_loss (save_best never fires) and
    its patience counter (early stop kills an improving fine-tune)."""
    monkeypatch.chdir(tmp_path)
    kw = dict(learning_rate=0.0, early_stop_patience=2,
              early_stop_min_delta=10.0)
    # donor: 2 epochs, snapshot holds epoch=2, evals_since_improve=1
    sa = train(_smoke_config(tmp_path, max_iters=2, **kw))
    from picklebot_tpu.train.checkpoint import latest_checkpoint
    snap = latest_checkpoint(str(tmp_path / "ckpt" / "MobileNetSmall3D"))

    # warm start into a fresh dir: full 2-epoch run from epoch 0 (a
    # resume would have continued at epoch 2), and the early-stop state
    # did NOT carry (a resume under these knobs stops after ONE eval —
    # test_early_stop_state_survives_resume pins that)
    ft = tmp_path / "ft"
    ft.mkdir()
    monkeypatch.chdir(ft)
    cfg = _smoke_config(ft, max_iters=2, checkpoint=snap,
                        warm_start=True, **kw)
    sb = train(cfg)
    assert sb["stopped_early"] is False
    assert len(sb["val_losses"]) == 2   # epochs 0 and 1 both ran
    # loss sanity (at lr=0 the donor's params equal its init, so this is
    # a loaded-BN-stats sanity check, not a weight-transfer proof — the
    # freeze-path tests cover real transfer)
    np.testing.assert_allclose(sb["val_losses"][0], sa["val_losses"][-1],
                               rtol=0.2)


def test_config_validates_warm_start():
    from picklebot_tpu.utils.config import Config
    with pytest.raises(ValueError, match="warm_start"):
        Config(model_name="MobileNetSmall3D", warm_start=True).validate()


@pytest.mark.slow
def test_warm_start_with_freeze_end_to_end(tmp_path, monkeypatch):
    """The canonical fine-tune flow — checkpoint + warm_start +
    freeze_params — runs end-to-end: frozen leaves stay bit-identical to
    the donor's weights while the head trains."""
    monkeypatch.chdir(tmp_path)
    sa = train(_smoke_config(tmp_path, max_iters=1))
    assert sa["val_losses"]
    from picklebot_tpu.train.checkpoint import (latest_checkpoint,
                                                restore_checkpoint)
    snap = latest_checkpoint(str(tmp_path / "ckpt" / "MobileNetSmall3D"))
    donor = restore_checkpoint(snap)

    ft = tmp_path / "ft"
    ft.mkdir()
    monkeypatch.chdir(ft)
    sb = train(_smoke_config(ft, max_iters=1, checkpoint=snap,
                             warm_start=True, learning_rate=1e-2,
                             freeze_params=["block*"]))
    assert sb["val_losses"]
    ft_snap = latest_checkpoint(str(ft / "ckpt" / "MobileNetSmall3D"))
    tuned = restore_checkpoint(ft_snap)

    before = _leaves(donor["params"])
    after = _leaves(tuned["params"])
    froze = moved = 0
    for path in sorted(before):
        if path.split("/")[0].startswith("block"):   # block1/2/3 frozen
            np.testing.assert_array_equal(before[path], after[path],
                                          err_msg=path)
            froze += 1
        elif not np.array_equal(before[path], after[path]):
            moved += 1   # b4_*/fc head leaves actually trained
    assert froze > 0 and moved > 0


def _leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out[p] = np.asarray(v)
    return out
