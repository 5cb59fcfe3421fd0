"""Training-step tests: grad-accum scan, DP shard_map equivalence, optimizers.

The key invariant: the sharded step over the 8-device CPU mesh produces the
same parameters/metrics as the single-device step on the same global batch —
the JAX-native version of "DDP matches single-GPU".
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy, Module, Ctx
from picklebot_tpu.ops.conv import Conv3d
from picklebot_tpu.ops.norm import BatchNorm
from picklebot_tpu.ops.linear import Dense, GlobalAvgPool
from picklebot_tpu.ops import activations as act
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train.optim import AdamW, AdamW8bit, cosine_annealing_lr
from picklebot_tpu.train.step import (TrainState, create_train_state,
                                      make_eval_step, make_train_step)


class TinyVideoNet(Module):
    """Small conv+BN+head model exercising state + params paths."""

    def __init__(self, num_classes=13):
        super().__init__()
        self.conv = Conv3d(3, 8, 3, stride=2, padding=1)
        self.bn = BatchNorm(8)
        self.pool = GlobalAvgPool()
        self.fc = Dense(8, num_classes)

    def forward(self, cx: Ctx, x):
        x = act.hardswish(cx(self.bn, cx(self.conv, x)))
        return cx(self.fc, cx(self.pool, x))


class TinyNoBNNet(Module):
    """BN-free variant: per-replica BN stats make DP legitimately differ
    from single-device (same as DDP), so exact-equivalence checks use this."""

    def __init__(self, num_classes=13):
        super().__init__()
        self.conv = Conv3d(3, 8, 3, stride=2, padding=1)
        self.pool = GlobalAvgPool()
        self.fc = Dense(8, num_classes)

    def forward(self, cx: Ctx, x):
        x = act.hardswish(cx(self.conv, x))
        return cx(self.fc, cx(self.pool, x))


def _data(rng, accum=2, batch=16):
    feats = rng.randint(0, 255, (accum, batch, 4, 16, 16, 3)).astype(np.uint8)
    labels = rng.randint(0, 13, (accum, batch)).astype(np.int32)
    return jnp.asarray(feats), jnp.asarray(labels)


def test_single_device_train_step_decreases_loss(rng):
    model = TinyVideoNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-2, 10)
    step = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), donate=False)
    state = create_train_state(model, opt, jax.random.key(0))
    feats, labels = _data(rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, feats, labels, jax.random.key(i))
        losses.append(float(jnp.mean(metrics["loss"])))
    assert losses[-1] < losses[0], losses
    assert metrics["samples"] == 32.0
    assert metrics["loss"].shape == (2,)  # per-microbatch losses


def test_sharded_step_matches_single_device(rng):
    """8-way DP == single device on the same global batch (DDP parity)."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()

    state0 = create_train_state(model, opt, jax.random.key(0))
    feats, labels = _data(rng, accum=2, batch=16)

    single = make_train_step(model, opt, "CE", sched, policy=policy,
                             donate=False)
    mesh = make_mesh(data=8)
    sharded = make_train_step(model, opt, "CE", sched, policy=policy,
                              mesh=mesh, donate=False)

    # Mean of equal-size per-shard grad means == global grad mean, so the
    # updates must agree to numerical tolerance.
    s1, m1 = single(state0, feats, labels, jax.random.key(7))
    s2, m2 = sharded(state0, feats, labels, jax.random.key(7))

    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.sum(m1["correct"])) == float(jnp.sum(m2["correct"]))


def test_eval_step_sharded(rng):
    model = TinyVideoNet()
    opt = AdamW()
    state = create_train_state(model, opt, jax.random.key(0))
    mesh = make_mesh(data=8)
    ev = make_eval_step(model, "CE", policy=DtypePolicy.f32(), mesh=mesh)
    feats = jnp.asarray(
        rng.randint(0, 255, (16, 4, 16, 16, 3)).astype(np.uint8))
    labels = jnp.asarray(rng.randint(0, 13, (16,)).astype(np.int32))
    mask = jnp.ones((16,), jnp.float32)
    out = ev(state, feats, labels, mask)
    assert out["samples"] == 16.0
    assert np.isfinite(float(out["loss"]))

    # tail-padding mask: zeroed entries must not count toward any metric
    half = jnp.asarray(np.concatenate([np.ones(8), np.zeros(8)]), jnp.float32)
    out_half = ev(state, feats, labels, half)
    ev1 = make_eval_step(model, "CE", policy=DtypePolicy.f32())
    ref = ev1(state, feats[:8], labels[:8], jnp.ones((8,), jnp.float32))
    assert out_half["samples"] == 8.0
    np.testing.assert_allclose(float(out_half["loss_sum"]),
                               float(ref["loss_sum"]), rtol=1e-5, atol=1e-5)
    assert float(out_half["correct"]) == float(ref["correct"])


def test_adamw_matches_torch(rng):
    torch = pytest.importorskip("torch")
    w = rng.randn(32, 16).astype(np.float32)
    g1 = rng.randn(32, 16).astype(np.float32)
    g2 = rng.randn(32, 16).astype(np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-3, weight_decay=0.01)
    for g in (g1, g2):
        topt.zero_grad()
        tp.grad = torch.from_numpy(g)
        topt.step()

    opt = AdamW(weight_decay=0.01)
    params = {"w": jnp.asarray(w)}
    st = opt.init(params)
    for g in (g1, g2):
        params, st = opt.update({"w": jnp.asarray(g)}, st, params,
                                jnp.asarray(1e-3))
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adamw8bit_tracks_fp32_adamw(rng):
    """8-bit state must track fp32 AdamW closely over many steps."""
    w = rng.randn(64, 80).astype(np.float32)  # 5120 elems -> quantized
    opt32, opt8 = AdamW(), AdamW8bit(min_8bit_size=4096)
    p32 = {"w": jnp.asarray(w)}
    p8 = {"w": jnp.asarray(w)}
    s32, s8 = opt32.init(p32), opt8.init(p8)
    assert s8["m"]["w"]["q"].dtype == jnp.uint8  # dynamic codebook indices
    assert s8["v"]["w"]["q"].dtype == jnp.uint8
    lr = jnp.asarray(1e-3)
    for i in range(20):
        g = {"w": jnp.asarray(rng.randn(64, 80).astype(np.float32))}
        p32, s32 = opt32.update(g, s32, p32, lr)
        p8, s8 = opt8.update(g, s8, p8, lr)
    diff = np.abs(np.asarray(p32["w"]) - np.asarray(p8["w"])).max()
    drift = np.abs(np.asarray(p32["w"]) - w).max()
    assert diff < 0.2 * drift, (diff, drift)


def test_cosine_schedule_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=3e-4)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=100,
                                                     eta_min=3e-5)
    ours = cosine_annealing_lr(3e-4, 100)
    for epoch in range(0, 100, 7):
        np.testing.assert_allclose(float(ours(epoch)),
                                   sch.get_last_lr()[0], rtol=1e-6)
        for _ in range(7):
            opt.step()
            sch.step()


def test_sharded_predict_matches_single_device(rng):
    """8-way DP inference == plain jit on the same batch (serve's
    --data-parallel path; eval-mode BN, so TinyVideoNet is fine)."""
    from picklebot_tpu.train.step import make_predict_fn, make_sharded_predict_fn

    model = TinyVideoNet()
    variables = model.init(0)
    policy = DtypePolicy.f32()
    feats = jnp.asarray(
        rng.randint(0, 255, (16, 4, 16, 16, 3)).astype(np.uint8))

    plain = make_predict_fn(model, policy)(variables, feats)
    mesh = make_mesh(data=8)
    sharded = make_sharded_predict_fn(model, mesh, policy)(variables, feats)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_eval_confusion_matrix(rng):
    """eval_step's confusion matrix: rows = true, cols = argmax(pred),
    masked tail samples contribute nothing, trace sums to 'correct'."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    state = create_train_state(model, opt, jax.random.key(0))
    ev = make_eval_step(model, "CE", policy=DtypePolicy.f32())

    feats, labels = _data(rng, accum=1, batch=16)
    feats, labels = feats[0], labels[0]
    mask = np.ones((16,), np.float32)
    mask[13:] = 0.0  # padded tail
    out = ev(state, feats, labels, mask)
    conf = np.asarray(out["confusion"])
    assert conf.shape == (13, 13)
    assert conf.sum() == float(out["samples"]) == 13.0
    np.testing.assert_allclose(np.trace(conf), float(out["correct"]))

    # recompute from the model's own logits
    from picklebot_tpu.train.step import preprocess
    x = preprocess(feats, jnp.float32)
    logits, _ = model.apply(
        {"params": state.params, "state": state.model_state}, x,
        train=False, policy=DtypePolicy.f32())
    pred = np.argmax(np.asarray(logits, np.float32), axis=-1)
    want = np.zeros((13, 13), np.float32)
    for i in range(13):
        want[int(labels[i]), int(pred[i])] += 1
    np.testing.assert_array_equal(conf, want)


def test_eval_confusion_bce(rng):
    """BCE criterion: 2x2 confusion from thresholded logits."""
    model = TinyNoBNNet(num_classes=1)
    opt = AdamW(weight_decay=1e-4)
    state = create_train_state(model, opt, jax.random.key(0))
    ev = make_eval_step(model, "BCE", policy=DtypePolicy.f32())
    feats, _ = _data(rng, accum=1, batch=8)
    labels = np.asarray(rng.randint(0, 2, (8,)), np.int32)
    mask = np.ones((8,), np.float32)
    out = ev(state, feats[0], jnp.asarray(labels), mask)
    conf = np.asarray(out["confusion"])
    assert conf.shape == (2, 2)
    assert conf.sum() == 8.0
    np.testing.assert_allclose(np.trace(conf), float(out["correct"]))
