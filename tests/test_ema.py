"""Parameter EMA (config ema_decay): math, layout invariance, checkpoints.

The reference has no EMA (train.py keeps only the live weights); this is a
picklebot-tpu production-serving extension. The contract under test:
  * ema = d*ema + (1-d)*params after every optimizer step, seeded at init;
  * identical across DP/ZeRO layouts (EMA runs on post-update replicated or
    all-gathered params);
  * checkpoints carry the stream; pre-EMA snapshots resume by seeding from
    the restored params; ema_decay=0 keeps the state structure unchanged.
"""

import glob

import jax
import numpy as np
import pytest

from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train.optim import OPTIMIZERS
from picklebot_tpu.train.step import (create_train_state, make_eval_step,
                                      make_train_step)

DECAY = 0.9


def _setup(optimizer="adamw", ema=True, zero_degree=0):
    model = MobileNetSmall3D(num_classes=5)
    opt = OPTIMIZERS[optimizer](weight_decay=1e-2)
    state = create_train_state(model, opt, seed=0, ema=ema,
                               zero_degree=zero_degree)
    return model, opt, state


def _batch(rng, accum=1, batch=2, t=4, s=32):
    feats = rng.randint(0, 255, (accum, batch, t, s, s, 3), dtype=np.uint8)
    labels = rng.randint(0, 5, (accum, batch)).astype(np.int32)
    return feats, labels


def test_ema_matches_manual_recurrence(rng):
    model, opt, state = _setup()
    step = make_train_step(model, opt, "CE", lambda e: 1e-3,
                           ema_decay=DECAY)
    expected = jax.tree_util.tree_map(np.array, state.params)
    key = jax.random.key(0)
    for i in range(3):
        feats, labels = _batch(rng)
        state, _ = step(state, feats, labels, jax.random.fold_in(key, i))
        params = jax.device_get(state.params)
        expected = jax.tree_util.tree_map(
            lambda e, p: DECAY * e + (1 - DECAY) * np.asarray(p, np.float32),
            expected, params)
    got = jax.device_get(state.ema_params)
    for g, e in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(g, np.float32), e,
                                   rtol=1e-5, atol=1e-6)


def test_ema_disabled_keeps_structure():
    model, opt, state = _setup(ema=False)
    assert state.ema_params is None
    step = make_train_step(model, opt, "CE", lambda e: 1e-3)
    feats, labels = _batch(np.random.RandomState(0))
    state, _ = step(state, feats, labels, jax.random.key(0))
    assert state.ema_params is None


@pytest.mark.parametrize("zero", [False, True])
def test_ema_layouts_match_single_device(rng, zero):
    """8-way DP (and ZeRO-DP) EMA == single-device EMA on the same data
    (TinyNoBNNet + f32: deterministic grads, exact layout parity like
    tests/test_zero.py)."""
    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.train.optim import AdamW
    from tests.test_train_step import TinyNoBNNet, _data

    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng, accum=2, batch=16)
    key = jax.random.key(7)

    state1 = create_train_state(model, opt, jax.random.key(0), ema=True)
    step1 = make_train_step(model, opt, "CE", lambda e: 1e-3, policy=policy,
                            donate=False, ema_decay=DECAY)

    mesh = make_mesh(data=8)
    if zero:
        from picklebot_tpu.parallel.zero import zero_state_specs
        stateN = create_train_state(model, opt, jax.random.key(0),
                                    zero_degree=8, ema=True)
        specs = zero_state_specs(stateN)
        zd = 8
    else:
        stateN = create_train_state(model, opt, jax.random.key(0), ema=True)
        specs, zd = None, 0
    stepN = make_train_step(model, opt, "CE", lambda e: 1e-3, policy=policy,
                            donate=False, mesh=mesh, state_specs=specs,
                            zero_degree=zd, ema_decay=DECAY)

    for i in range(3):
        state1, _ = step1(state1, feats, labels, jax.random.fold_in(key, i))
        stateN, _ = stepN(stateN, feats, labels, jax.random.fold_in(key, i))
    e1 = jax.tree_util.tree_leaves(jax.device_get(state1.ema_params))
    eN = jax.tree_util.tree_leaves(jax.device_get(stateN.ema_params))
    for a, b in zip(e1, eN):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_train_loop_ema_checkpoint_and_eval(tmp_path, monkeypatch, rng):
    """train() with ema_decay: snapshots carry ema_params, eval runs on the
    EMA weights, and a pre-EMA checkpoint resumes by seeding from params."""
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.train.loop import train
    from picklebot_tpu.utils.config import Config

    base = dict(
        model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=2,
        max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
        criterion="CE", num_classes=13, effective_batch_size=2,
        data_backend="synthetic", synthetic_len=8,
        synthetic_shape=(8, 32, 32), t_bucket=8, max_frames=8,
        num_workers=2, optimizer="adamw8bit", data_parallel=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"))

    # 1) a run WITHOUT ema writes a pre-EMA snapshot
    cfg0 = Config(**base).validate()
    train(cfg0)
    snaps = sorted(glob.glob(str(tmp_path / "ckpt" / "MobileNetSmall3D"
                                 / "step_*")))
    assert snaps
    payload = ckpt.restore_checkpoint(snaps[-1])
    assert payload.get("ema_params") is None

    # 2) resume it WITH ema: seeds from restored params, saves the stream
    cfg1 = Config(**{**base, "ema_decay": 0.99, "checkpoint": snaps[-1],
                     "max_iters": 2}).validate()
    summary = train(cfg1)
    assert np.isfinite(summary["final_val_loss"])
    fin = sorted(glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*")))
    payload = ckpt.restore_checkpoint(fin[-1])
    assert payload.get("ema_params") is not None
    # the EMA stream tracks params: same tree structure, close but not
    # (in general) equal values
    p = jax.tree_util.tree_leaves(payload["params"])
    e = jax.tree_util.tree_leaves(payload["ema_params"])
    assert len(p) == len(e)

    # 3) resuming that EMA snapshot with ema_decay=0 drops the stream
    # (finished snapshot holds epoch=2, so give it one more epoch to run)
    cfg2 = Config(**{**base, "checkpoint": fin[-1],
                     "max_iters": 3}).validate()
    summary = train(cfg2, max_steps=1)
    assert np.isfinite(summary["final_val_loss"])


def test_eval_step_accepts_ema_swapped_state(rng):
    """run_eval swaps params<-ema_params via _replace: the same compiled
    eval program must accept the swapped state (structure is unchanged)."""
    model, opt, state = _setup()
    eval_step = make_eval_step(model, "CE")
    feats, labels = _batch(rng)
    mask = np.ones((2,), np.float32)
    swapped = state._replace(params=state.ema_params)
    out = eval_step(swapped, feats[0], labels[0], mask)
    assert np.isfinite(float(out["loss"]))


def test_config_rejects_bad_decay():
    from picklebot_tpu.utils.config import Config
    with pytest.raises(ValueError):
        Config(ema_decay=1.0).validate()
    with pytest.raises(ValueError):
        Config(ema_decay=-0.1).validate()
