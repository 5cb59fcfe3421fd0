"""Preemption-safe training: auto_resume, SIGTERM graceful finish, async
checkpoint writes (train/loop.py + train/checkpoint.py).

The reference's only resilience is catching KeyboardInterrupt
(train.py:330-343); TPU-VM maintenance events deliver SIGTERM and its
"resume" assigns the checkpoint path to start_epoch (train.py:234). Here:
SIGTERM routes into the same graceful-finish path, auto_resume restarts
from the newest periodic snapshot, and async saves overlap orbax I/O with
training.
"""

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config


def _cfg(tmp_path, **kw):
    base = dict(
        model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=2,
        max_iters=2, eval_interval=1, weight_decay=5e-4, use_autocast=False,
        criterion="CE", num_classes=13, effective_batch_size=4,
        data_backend="synthetic", synthetic_len=12,
        synthetic_shape=(8, 32, 32), t_bucket=8, max_frames=8,
        num_workers=2, optimizer="adamw8bit", data_parallel=1,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
    )
    base.update(kw)
    return Config(**base).validate()


@pytest.mark.slow
def test_auto_resume_continues_from_snapshot(tmp_path, monkeypatch):
    """Second train() with auto_resume picks up the newest periodic
    snapshot: it runs only the remaining epochs and writes their
    checkpoints."""
    monkeypatch.chdir(tmp_path)
    first = train(_cfg(tmp_path, max_iters=2))
    steps_per_epoch = len(first["train_losses"]) // 2
    assert os.path.isdir(tmp_path / "ckpt" / "MobileNetSmall3D" / "step_1")

    second = train(_cfg(tmp_path, max_iters=3, auto_resume=True))
    # resumed at epoch 2 (snapshot step_1 stores epoch=2): one epoch ran
    assert len(second["train_losses"]) == steps_per_epoch, (
        len(second["train_losses"]), steps_per_epoch)
    assert os.path.isdir(tmp_path / "ckpt" / "MobileNetSmall3D" / "step_2")


@pytest.mark.slow
def test_async_checkpoint_roundtrip(tmp_path, monkeypatch):
    """async_checkpoint=True: training completes, every periodic snapshot
    is fully written (drained before the final blocking save) and
    restorable."""
    from picklebot_tpu.train.checkpoint import restore_checkpoint

    monkeypatch.chdir(tmp_path)
    train(_cfg(tmp_path, max_iters=2, async_checkpoint=True))
    snaps = sorted(glob.glob(str(tmp_path / "ckpt" / "MobileNetSmall3D"
                                 / "step_*")))
    assert len(snaps) == 2, snaps
    payload = restore_checkpoint(snaps[-1])
    assert int(np.asarray(payload["epoch"])) == 2
    finished = glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*"))
    assert finished


_SIGTERM_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")

from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config

cfg = Config(
    model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=2,
    max_iters=1000, eval_interval=1, weight_decay=5e-4, use_autocast=False,
    criterion="CE", num_classes=13, effective_batch_size=4,
    data_backend="synthetic", synthetic_len=12, synthetic_shape=(8, 32, 32),
    t_bucket=8, max_frames=8, num_workers=2, optimizer="adamw8bit",
    data_parallel=1, checkpoint_dir=sys.argv[1] + "/ckpt",
    log_dir=sys.argv[1] + "/runs").validate()
train(cfg)
print("TRAIN RETURNED CLEANLY")
"""


@pytest.mark.slow
def test_sigterm_graceful_finish(tmp_path):
    """SIGTERM mid-training (the TPU preemption signal) lands in the
    graceful-finish path: exit code 0 and a final '_finished' snapshot."""
    script = tmp_path / "worker.py"
    script.write_text(_SIGTERM_WORKER)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.environ.get("PYTHONPATH", "") + ":" +
               os.getcwd())
    proc = subprocess.Popen(
        [sys.executable, str(script), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=tmp_path, env=env)
    # wait for the first periodic snapshot, then preempt
    deadline = time.time() + 300
    snap_glob = str(tmp_path / "ckpt" / "MobileNetSmall3D" / "step_*")
    while time.time() < deadline and not glob.glob(snap_glob):
        if proc.poll() is not None:
            out, _ = proc.communicate()
            raise AssertionError(f"worker died early:\n{out[-3000:]}")
        time.sleep(1.0)
    assert glob.glob(snap_glob), "no periodic snapshot before deadline"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=240)
    assert proc.returncode == 0, out[-3000:]
    assert "TRAIN RETURNED CLEANLY" in out, out[-2000:]
    assert glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*")), out
