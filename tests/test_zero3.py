"""ZeRO stage 3 — parameter sharding (parallel/zero.py zero3_*).

Invariants: stage 3 == stage 1 == replicated DP exactly (the param
all-gather moves from after the update to before the forward; everything
else is the same arithmetic); the rank stacks round-trip to full leaves
exactly; EMA composes (chunk-level update == full-leaf update); eval
gathers correctly; checkpoints store FULL params so a stage-3 run's
snapshot restores anywhere.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.parallel.zero import (param_templates, zero3_shard_params,
                                         zero3_state_specs,
                                         zero3_unshard_params,
                                         zero_state_specs, _chunk)
from picklebot_tpu.train.optim import AdamW, AdamW8bit, cosine_annealing_lr
from picklebot_tpu.train.step import (create_train_state, make_eval_step,
                                      make_train_step)

from tests.test_train_step import TinyNoBNNet, _data


def _zero3_state(model, opt, seed, n, ema=False):
    state = create_train_state(model, opt, jax.random.key(seed),
                               zero_degree=n, ema=ema)
    tmpl = param_templates(state.params)
    specs = zero3_state_specs(state)
    state = state._replace(
        params=zero3_shard_params(state.params, n),
        ema_params=(zero3_shard_params(state.ema_params, n)
                    if state.ema_params is not None else None))
    return state, tmpl, specs


def _run(step, state, feats, labels, steps=3):
    for i in range(steps):
        state, metrics = step(state, feats, labels, jax.random.key(i))
    return state, metrics


def test_shard_unshard_roundtrip(rng):
    params = {"w": rng.randn(13, 7).astype(np.float32),
              "b": rng.randn(5).astype(np.float32)}
    tmpl = param_templates(params)
    for n in (2, 4, 8):
        stacked = zero3_shard_params(params, n)
        assert stacked["w"].shape == (n, _chunk(91, n))
        back = zero3_unshard_params(stacked, tmpl)
        for k in params:
            np.testing.assert_array_equal(back[k], params[k])


def test_zero3_matches_replicated_dp(rng):
    """ZeRO-3 over 8 ranks == plain DP8: identical losses and (unsharded)
    params after several steps, fp32 AdamW."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=2, batch=16)

    state_dp = create_train_state(model, opt, jax.random.key(0))
    dp = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False)
    state_z, tmpl, specs = _zero3_state(model, opt, 0, 8)
    z3 = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False, state_specs=specs, zero_degree=8,
                         zero_stage=3, zero3_templates=tmpl)

    state_dp, m_dp = _run(dp, state_dp, feats, labels)
    state_z, m_z = _run(z3, state_z, feats, labels)

    np.testing.assert_allclose(np.asarray(m_dp["loss"]),
                               np.asarray(m_z["loss"]), rtol=1e-6, atol=1e-7)
    full = zero3_unshard_params(jax.device_get(state_z.params), tmpl)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_zero3_matches_stage1(rng):
    """Stage 3 == stage 1 bit-for-bit on params AND moments (the gather
    move is pure data movement), 8-bit optimizer."""
    model = TinyNoBNNet()
    opt = AdamW8bit(weight_decay=1e-4, min_8bit_size=64)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=2, batch=16)

    s1 = create_train_state(model, opt, jax.random.key(0), zero_degree=8)
    step1 = make_train_step(model, opt, "CE", sched, policy=policy,
                            mesh=mesh, donate=False,
                            state_specs=zero_state_specs(s1), zero_degree=8)
    s3, tmpl, specs = _zero3_state(model, opt, 0, 8)
    step3 = make_train_step(model, opt, "CE", sched, policy=policy,
                            mesh=mesh, donate=False, state_specs=specs,
                            zero_degree=8, zero_stage=3,
                            zero3_templates=tmpl)

    s1, _ = _run(step1, s1, feats, labels, steps=4)
    s3, _ = _run(step3, s3, feats, labels, steps=4)

    full3 = zero3_unshard_params(jax.device_get(s3.params), tmpl)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(full3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.opt_state),
                    jax.tree_util.tree_leaves(s3.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero3_ema_composes(rng):
    """EMA under stage 3 updates the chunks; unsharded it equals the
    replicated-DP EMA stream exactly."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=2, batch=16)

    state_dp = create_train_state(model, opt, jax.random.key(0), ema=True)
    dp = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False, ema_decay=0.9)
    state_z, tmpl, specs = _zero3_state(model, opt, 0, 8, ema=True)
    z3 = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False, state_specs=specs, zero_degree=8,
                         zero_stage=3, zero3_templates=tmpl, ema_decay=0.9)

    state_dp, _ = _run(dp, state_dp, feats, labels)
    state_z, _ = _run(z3, state_z, feats, labels)

    ema3 = zero3_unshard_params(jax.device_get(state_z.ema_params), tmpl)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.ema_params),
                    jax.tree_util.tree_leaves(ema3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_zero3_eval_matches_replicated(rng):
    """make_eval_step with zero3_templates gathers the rank stacks; its
    metrics equal the replicated eval's."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=1, batch=16)
    feats, labels = feats[0], labels[0]
    mask = np.ones((feats.shape[0],), np.float32)

    state = create_train_state(model, opt, jax.random.key(0))
    ev = make_eval_step(model, "CE", policy=policy, mesh=mesh)
    ref = ev(state, feats, labels, mask)

    s3, tmpl, specs = _zero3_state(model, opt, 0, 8)
    ev3 = make_eval_step(model, "CE", policy=policy, mesh=mesh,
                         state_specs=specs, zero3_templates=tmpl)
    got = ev3(s3, feats, labels, mask)
    for k in ("loss", "correct", "samples"):
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=1e-6, atol=1e-7)


def test_zero3_grad_clipping_matches(rng):
    """Global-norm clipping under stage 3 == single-device clipped step."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=2, batch=16)

    ref_state = create_train_state(model, opt, jax.random.key(0))
    ref = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                          donate=False, max_grad_norm=0.05)
    s3, tmpl, specs = _zero3_state(model, opt, 0, 8)
    z3 = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False, state_specs=specs, zero_degree=8,
                         zero_stage=3, zero3_templates=tmpl,
                         max_grad_norm=0.05)

    ref_state, m_ref = _run(ref, ref_state, feats, labels, steps=2)
    s3, m3 = _run(z3, s3, feats, labels, steps=2)
    np.testing.assert_allclose(np.asarray(m_ref["grad_norm"]),
                               np.asarray(m3["grad_norm"]),
                               rtol=1e-6, atol=1e-7)
    full3 = zero3_unshard_params(jax.device_get(s3.params), tmpl)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(full3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_zero3_validation_errors():
    model = TinyNoBNNet()
    opt = AdamW()
    sched = cosine_annealing_lr(1e-3, 10)
    state = create_train_state(model, opt, jax.random.key(0), zero_degree=8)
    with pytest.raises(ValueError, match="zero_stage"):
        make_train_step(model, opt, "CE", sched, mesh=make_mesh(data=8),
                        zero_degree=8, zero_stage=2,
                        state_specs=zero3_state_specs(state))


def test_config_zero_stage_validation():
    from picklebot_tpu.utils.config import Config

    cfg = Config(model_name="MobileNetSmall3D", zero_sharding=3).validate()
    assert int(cfg.zero_sharding) == 3
    with pytest.raises(ValueError, match="zero_sharding"):
        Config(model_name="MobileNetSmall3D", zero_sharding=2).validate()


@pytest.mark.slow
def test_train_loop_zero3_end_to_end(tmp_path, monkeypatch):
    """train(config) with zero_sharding=3 over the 8-device CPU mesh:
    runs, learns, snapshots FULL params (stage-independent format), and
    the snapshot resumes as a plain replicated run (stage toggled off,
    different degree)."""
    import dataclasses
    import glob

    from picklebot_tpu.train import checkpoint as ckpt
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
        zero_sharding=3, ema_decay=0.99,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"),
    ).validate()
    summary = train(cfg)
    assert np.isfinite(summary["final_val_loss"])
    saved = sorted(glob.glob(str(tmp_path / "ckpt" / "*_finished" /
                                 "step_*")))
    assert saved
    # the snapshot holds FULL param leaves (not rank stacks): every leaf
    # shape matches a fresh host init's
    payload = ckpt.restore_checkpoint(saved[-1])
    from picklebot_tpu.models.registry import initialize_model
    ref_params = initialize_model(cfg).init(cfg.seed)["params"]
    for got, ref in zip(jax.tree_util.tree_leaves(payload["params"]),
                        jax.tree_util.tree_leaves(ref_params)):
        assert np.shape(got) == np.shape(ref)
    assert payload.get("ema_params") is not None
    resume = dataclasses.replace(
        cfg, checkpoint=saved[-1], data_parallel=4, zero_sharding=0,
        max_iters=2).validate()
    summary2 = train(resume)
    assert np.isfinite(summary2["final_val_loss"])


def test_zero3_templates_derived_when_omitted(rng):
    """make_train_step derives the full-shape templates from a host-side
    model.init when zero3_templates is omitted (round-3 API trap: rank
    stacks erase shapes and every caller had to remember the argument)."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=1, batch=8)
    state_z, tmpl, specs = _zero3_state(model, opt, 0, 8)
    z3 = make_train_step(model, opt, "CE", sched, policy=DtypePolicy.f32(),
                         mesh=mesh, donate=False, state_specs=specs,
                         zero_degree=8, zero_stage=3)   # no templates
    state_z, m = _run(z3, state_z, feats, labels, steps=1)
    assert np.isfinite(np.asarray(m["loss"])).all()


def test_zero3_eval_templates_derived_when_omitted(rng):
    """make_eval_step detects stage-3 from the state_specs (param leaves
    sharded on 'data' — the only layout that does that, ZeRO being
    pure-DP-only) and derives the templates itself, closing the same API
    trap make_train_step closed: omitting the argument must not trace
    rank stacks into model.apply."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=1, batch=16)
    feats, labels = feats[0], labels[0]
    mask = np.ones((feats.shape[0],), np.float32)

    state = create_train_state(model, opt, jax.random.key(0))
    ref = make_eval_step(model, "CE", policy=policy, mesh=mesh)(
        state, feats, labels, mask)

    s3, _tmpl, specs = _zero3_state(model, opt, 0, 8)
    ev3 = make_eval_step(model, "CE", policy=policy, mesh=mesh,
                         state_specs=specs)   # no zero3_templates
    got = ev3(s3, feats, labels, mask)
    for k in ("loss", "correct", "samples"):
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=1e-6, atol=1e-7)
