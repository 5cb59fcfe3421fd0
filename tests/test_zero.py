"""ZeRO optimizer-state sharding (parallel/zero.py).

Invariants: ZeRO-DP produces the same parameters as plain (replicated) DP
— reduce-scatter + slice update + all-gather is an all-reduce decomposed —
and the sharded moment stacks reassemble to the replicated moments; the
8-bit optimizer composes (its blocks quantize per slice).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.parallel.zero import (zero_opt_state, zero_state_specs,
                                         _chunk)
from picklebot_tpu.train.optim import AdamW, AdamW8bit, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step

from tests.test_train_step import TinyNoBNNet, _data


def _run(step, state, feats, labels, steps=3):
    for i in range(steps):
        state, metrics = step(state, feats, labels, jax.random.key(i))
    return state, metrics


def test_zero_matches_replicated_dp(rng):
    """ZeRO-DP8 == plain DP8: identical params, losses, and (reassembled)
    Adam moments after several steps."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=2, batch=16)

    state_dp = create_train_state(model, opt, jax.random.key(0))
    dp = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False)
    state_z = create_train_state(model, opt, jax.random.key(0),
                                 zero_degree=8)
    specs = zero_state_specs(state_z)
    zz = make_train_step(model, opt, "CE", sched, policy=policy, mesh=mesh,
                         donate=False, state_specs=specs, zero_degree=8)

    state_dp, m_dp = _run(dp, state_dp, feats, labels)
    state_z, m_z = _run(zz, state_z, feats, labels)

    np.testing.assert_allclose(np.asarray(m_dp["loss"]),
                               np.asarray(m_z["loss"]), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # the (8, chunk) moment stacks reassemble to the replicated moments
    for full, stack in zip(jax.tree_util.tree_leaves(state_dp.opt_state["m"]),
                           jax.tree_util.tree_leaves(state_z.opt_state["m"])):
        flat = np.asarray(stack).reshape(-1)[: full.size]
        np.testing.assert_allclose(flat, np.asarray(full).reshape(-1),
                                   rtol=1e-6, atol=1e-8)
    assert int(state_z.opt_state["step"]) == 3


def test_zero_8bit_composes(rng):
    """AdamW8bit under ZeRO: per-slice quantized blocks (leading 'data'
    axis on q/s), params tracking fp32-ZeRO within the 8-bit bound."""
    model = TinyNoBNNet()
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=2, batch=16)

    # low threshold so the conv kernel (648 elems -> 81/rank) quantizes
    opt8 = AdamW8bit(weight_decay=1e-4, min_8bit_size=64)
    state8 = create_train_state(model, opt8, jax.random.key(0),
                                zero_degree=8)
    q_leaves = [v for k, v in
                jax.tree_util.tree_flatten_with_path(state8.opt_state["m"])[0]
                if any(getattr(p, "key", None) == "q" for p in k)]
    assert q_leaves and all(q.shape[0] == 8 for q in q_leaves)
    step8 = make_train_step(model, opt8, "CE", sched, policy=policy,
                            mesh=mesh, donate=False,
                            state_specs=zero_state_specs(state8),
                            zero_degree=8)
    state8, _ = _run(step8, state8, feats, labels, steps=5)

    opt32 = AdamW(weight_decay=1e-4)
    state32 = create_train_state(model, opt32, jax.random.key(0),
                                 zero_degree=8)
    step32 = make_train_step(model, opt32, "CE", sched, policy=policy,
                             mesh=mesh, donate=False,
                             state_specs=zero_state_specs(state32),
                             zero_degree=8)
    state32, _ = _run(step32, state32, feats, labels, steps=5)

    init = create_train_state(model, opt32, jax.random.key(0))
    for p8, p32, p0 in zip(jax.tree_util.tree_leaves(state8.params),
                           jax.tree_util.tree_leaves(state32.params),
                           jax.tree_util.tree_leaves(init.params)):
        diff = np.abs(np.asarray(p8) - np.asarray(p32)).max()
        drift = np.abs(np.asarray(p32) - np.asarray(p0)).max()
        assert diff <= max(0.25 * drift, 1e-6), (diff, drift)


def test_zero_opt_state_layout():
    """Host-side layout: leading rank axis, padded flat chunks, 8-bit
    min-size decided per slice."""
    params = {"big": np.zeros((100, 7), np.float32),   # 700 -> chunk 175
              "small": np.zeros((10,), np.float32)}    # 10  -> chunk 3
    st = zero_opt_state(AdamW(), params, 4)
    assert st["m"]["big"].shape == (4, _chunk(700, 4))
    assert st["v"]["small"].shape == (4, _chunk(10, 4))

    st8 = zero_opt_state(AdamW8bit(min_8bit_size=128), params, 4)
    # 175 >= 128 -> quantized per slice; 3 < 128 -> fp32 slice
    assert st8["m"]["big"]["q"].shape[0] == 4
    assert st8["m"]["small"].shape == (4, 3)


def test_zero_validation_errors():
    model = TinyNoBNNet()
    opt = AdamW()
    sched = cosine_annealing_lr(1e-3, 10)
    with pytest.raises(ValueError, match="needs a mesh"):
        make_train_step(model, opt, "CE", sched, zero_degree=8)
    mesh = make_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="'data' axis"):
        make_train_step(model, opt, "CE", sched, mesh=mesh, zero_degree=8,
                        state_specs=object())
    with pytest.raises(ValueError, match="zero_state_specs"):
        make_train_step(model, opt, "CE", sched,
                        mesh=make_mesh(data=8), zero_degree=8)
    with pytest.raises(ValueError, match="pure"):
        create_train_state(model, opt, jax.random.key(0),
                           tp_rules=[(".*", None)], tp_degree=2,
                           zero_degree=8)


@pytest.mark.slow
def test_train_loop_zero_sharding(tmp_path, monkeypatch):
    """train(config) end-to-end with zero_sharding over the 8-device CPU
    mesh: runs, learns state, saves the ZeRO-layout checkpoint."""
    import glob

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
        zero_sharding=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"),
    ).validate()
    summary = train(cfg)
    # effective_batch_size is PER-REPLICA (reference semantics): accum 2 x
    # global batch 8 = 16 samples/step -> exactly 1 optimizer step/epoch,
    # logged at the reference's per-micro-batch density (2 scalars)
    assert len(summary["train_losses"]) == 2, summary["train_losses"]
    assert np.all(np.isfinite(summary["train_losses"]))
    assert np.isfinite(summary["final_val_loss"])
    assert glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*"))


def test_config_rejects_zero_with_tp():
    from picklebot_tpu.utils.config import Config

    with pytest.raises(ValueError, match="zero_sharding"):
        Config(model_name="MobileViT", dims=[64, 80, 96],
               channels=[16, 16, 24, 24, 48, 64, 80, 320],
               zero_sharding=True, model_parallel=2).validate()


# ---------------------------------------------------------------- resharding

def _flat_moments(opt_state, params, n, key="m"):
    """Reassemble a moment tree (any layout) to flat f32 per leaf."""
    from picklebot_tpu.parallel.zero import zero_reshard  # noqa: F401
    from picklebot_tpu.train.optim import (_dequantize_signed,
                                           _dequantize_unsigned)
    deq = _dequantize_signed if key == "m" else _dequantize_unsigned

    def is_qs(x):
        return isinstance(x, dict) and set(x) == {"q", "s"}

    out = []
    p_leaves = jax.tree_util.tree_leaves(params)
    m_leaves = jax.tree_util.tree_leaves(opt_state[key], is_leaf=is_qs)
    for p, x in zip(p_leaves, m_leaves):
        if is_qs(x):
            q, s = np.asarray(x["q"]), np.asarray(x["s"])
            if q.ndim == 3:
                c = _chunk(p.size, q.shape[0])
                flat = np.concatenate([
                    np.asarray(deq(jnp.asarray(q[r]), jnp.asarray(s[r]),
                                   (c,))) for r in range(q.shape[0])])
            else:
                flat = np.asarray(deq(jnp.asarray(q), jnp.asarray(s),
                                      (q.size,)))
            out.append(flat[: p.size])
        else:
            out.append(np.asarray(x, np.float32).reshape(-1)[: p.size])
    return out


def test_codec_numpy_matches_jnp(rng):
    """The xp=np codec (used by host-side resharding) encodes bit-identically
    to the jitted jnp codec (frexp/round are exact IEEE ops), so checkpoint
    q/s content is backend-independent; decoded VALUES may differ by ~2 ulp
    (XLA lowers exp2 via exp(x*ln2) on CPU, numpy computes it exactly)."""
    from picklebot_tpu.train import optim as O

    x = np.concatenate([
        rng.randn(1000).astype(np.float32) * 10.0 ** rng.randint(-8, 2, 1000),
        np.zeros(24, np.float32), np.ones(8, np.float32),
        -np.ones(8, np.float32)])
    for quant, deq in ((O._quantize_signed, O._dequantize_signed),
                       (O._quantize_unsigned, O._dequantize_unsigned)):
        v = np.abs(x) if quant is O._quantize_unsigned else x
        qj, sj = quant(jnp.asarray(v))
        qn, sn = quant(v, xp=np)
        np.testing.assert_array_equal(np.asarray(qj), qn)
        np.testing.assert_array_equal(np.asarray(sj), sn)
        dj = deq(qj, sj, v.shape)
        dn = deq(qn, sn, v.shape, xp=np)
        np.testing.assert_allclose(np.asarray(dj), dn, rtol=3e-6, atol=0)


def test_zero_degree_detection(rng):
    from picklebot_tpu.parallel.zero import zero_degree_of

    model = TinyNoBNNet()
    for opt in (AdamW(), AdamW8bit(min_8bit_size=8)):
        st_rep = create_train_state(model, opt, jax.random.key(0))
        assert zero_degree_of(st_rep.params, st_rep.opt_state) == 0
        st_z = create_train_state(model, opt, jax.random.key(0),
                                  zero_degree=8)
        assert zero_degree_of(st_z.params, st_z.opt_state) == 8


def test_zero_reshard_fp32_exact(rng):
    """fp32 moments reshard exactly: 8 -> 4, 8 -> replicated, and the
    replicated round-trip all reassemble to identical flats."""
    from picklebot_tpu.parallel.zero import zero_reshard

    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=1, batch=16)
    state = create_train_state(model, opt, jax.random.key(0), zero_degree=8)
    step = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), mesh=mesh, donate=False,
                           state_specs=zero_state_specs(state),
                           zero_degree=8)
    state, _ = _run(step, state, feats, labels, steps=2)
    host = jax.device_get(state)

    ref = {k: _flat_moments(host.opt_state, host.params, 8, k)
           for k in ("m", "v")}
    for n_new in (4, 0):
        new_opt = zero_reshard(opt, host.params, host.opt_state, n_new)
        assert int(new_opt["step"]) == int(host.opt_state["step"])
        for k in ("m", "v"):
            got = _flat_moments(new_opt, host.params, n_new, k)
            for a, b in zip(ref[k], got):
                np.testing.assert_array_equal(a, b)
    # replicated -> ZeRO(8) -> replicated round-trips bit-exactly
    rep = zero_reshard(opt, host.params, host.opt_state, 0)
    back = zero_reshard(opt, host.params,
                        zero_reshard(opt, host.params, rep, 8), 0)
    for a, b in zip(jax.tree_util.tree_leaves(rep["m"]),
                    jax.tree_util.tree_leaves(back["m"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero_reshard_8bit(rng):
    """8-bit moments reshard within one codec quantum, and the target
    structure equals a fresh init at the new degree (min_8bit_size
    re-decided per slice)."""
    from picklebot_tpu.parallel.zero import zero_reshard

    model = TinyNoBNNet()
    opt = AdamW8bit(weight_decay=1e-4, min_8bit_size=64)
    sched = cosine_annealing_lr(1e-3, 10)
    mesh = make_mesh(data=8)
    feats, labels = _data(rng, accum=1, batch=16)
    state = create_train_state(model, opt, jax.random.key(0), zero_degree=8)
    step = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), mesh=mesh, donate=False,
                           state_specs=zero_state_specs(state),
                           zero_degree=8)
    state, _ = _run(step, state, feats, labels, steps=2)
    host = jax.device_get(state)

    for n_new in (4, 2, 0):
        new_opt = zero_reshard(opt, host.params, host.opt_state, n_new)
        fresh = (zero_opt_state(opt, host.params, n_new) if n_new
                 else opt.init(host.params))
        assert (jax.tree_util.tree_structure(new_opt) ==
                jax.tree_util.tree_structure(fresh))
        for leaf, ref_leaf in zip(jax.tree_util.tree_leaves(new_opt),
                                  jax.tree_util.tree_leaves(fresh)):
            assert np.asarray(leaf).shape == np.asarray(ref_leaf).shape
        for k in ("m", "v"):
            a_flat = _flat_moments(host.opt_state, host.params, 8, k)
            b_flat = _flat_moments(new_opt, host.params, n_new, k)
            for a, b in zip(a_flat, b_flat):
                # one requantization: <= ~6.25% of the block absmax; allow
                # a small absolute floor for near-zero entries
                tol = 0.0700 * max(np.abs(a).max(), 1e-12)
                np.testing.assert_allclose(b, a, atol=tol)


def test_train_loop_zero_resume_other_degree(tmp_path, monkeypatch, capfd):
    """End-to-end: train with ZeRO at DP=8, then resume the checkpoint at
    DP=4 — the restore path reshards the optimizer state host-side."""
    import dataclasses
    import glob

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
        zero_sharding=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs"),
    ).validate()
    train(cfg)
    saved = sorted(glob.glob(str(tmp_path / "ckpt" / "*_finished" /
                                 "step_*")))
    assert saved
    capfd.readouterr()

    resume = dataclasses.replace(
        cfg, checkpoint=saved[-1], data_parallel=4, effective_batch_size=2,
        max_iters=2).validate()
    summary = train(resume)
    assert np.isfinite(summary["final_val_loss"])
    assert "Resharding optimizer state: ZeRO degree 8 -> 4" in \
        capfd.readouterr().out
