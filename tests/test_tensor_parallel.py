"""Tensor parallelism: Megatron-style FFN sharding over the 'model' axis.

A (data=4, model=2) mesh must reproduce single-device training exactly:
fc1 column shards + fc2 row shards + in-module psum == full matmuls.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from picklebot_tpu.core.module import Ctx, DtypePolicy, Module
from picklebot_tpu.models.mobilevit import TransformerStack
from picklebot_tpu.ops.linear import Dense
from picklebot_tpu.parallel.mesh import (MOBILEVIT_TP_RULES, make_mesh,
                                         param_specs, train_state_specs)
from picklebot_tpu.train.optim import AdamW, AdamW8bit, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step


class TinyTransformer(Module):
    """Patch embed -> TransformerStack -> mean -> head, over uint8 'clips'
    flattened to tokens (shape-compatible with the train step)."""

    def __init__(self, num_classes=13, model_axis=None):
        super().__init__()
        self.embed = Dense(4 * 4 * 3, 32)
        self.transformer = TransformerStack(
            32, depth=2, heads=4, dim_head=8, ffw_dim=64,
            backend="xla", model_axis=model_axis)
        self.head = Dense(32, num_classes)

    def forward(self, cx: Ctx, x):
        b, t = x.shape[0], x.shape[1]
        tokens = x.reshape(b, t * (x.shape[2] // 4) * (x.shape[3] // 4), -1)
        tokens = tokens.reshape(b, -1, 4 * 4 * 3)
        h = cx(self.embed, tokens)
        h = cx(self.transformer, h)
        return cx(self.head, jnp.mean(h, axis=1))


def _data(rng, accum=1, batch=8):
    feats = rng.randint(0, 255, (accum, batch, 2, 8, 8, 3)).astype(np.uint8)
    labels = rng.randint(0, 13, (accum, batch)).astype(np.int32)
    return jnp.asarray(feats), jnp.asarray(labels)


def test_tp_matches_single_device(rng):
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng)

    # single device, unsharded
    ref_model = TinyTransformer()
    ref_state = create_train_state(ref_model, opt, 0)
    ref_step = make_train_step(ref_model, opt, "CE", sched, policy=policy,
                               donate=False)
    s1, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))

    # 4-way data x 2-way tensor parallel
    tp_model = TinyTransformer(model_axis="model")
    mesh = make_mesh(data=4, model=2)
    state0 = create_train_state(tp_model, opt, 0)  # same seed -> same params
    specs = train_state_specs(state0, MOBILEVIT_TP_RULES)
    # verify the rules actually matched the FFN weights
    assert specs.params["transformer"]["ffs"]["0"]["fc1"]["w"] == \
        P(None, "model")
    assert specs.params["transformer"]["ffs"]["1"]["fc2"]["w"] == \
        P("model", None)
    state0 = jax.device_put(
        state0, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    tp_step = make_train_step(tp_model, opt, "CE", sched, policy=policy,
                              mesh=mesh, donate=False, state_specs=specs)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P(None, "data")))
    labels_s = jax.device_put(labels, NamedSharding(mesh, P(None, "data")))
    s2, m2 = tp_step(state0, feats_s, labels_s,
                     jax.device_put(jax.random.key(5),
                                    NamedSharding(mesh, P())))

    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=1e-5, atol=1e-5)
    # Adam's 1/(sqrt(v)+eps) amplifies psum reduction-order float noise on
    # the first step where v ~ 0 (observed: 4/1536 elements at ~2e-3); the
    # forward/loss path above matches to 1e-5.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-3)


def test_tp_8bit_optimizer_matches_single_device(rng):
    """Per-shard 8-bit moments (round-2): AdamW8bit composes with TP — the
    q/s blocks are laid out per local shard and sharded P('model', None), so
    each shard quantizes exactly its own slice. Training must track the
    single-device 8-bit run (block boundaries differ between the global and
    per-shard layouts, so parity is codec-tolerance, not bitwise)."""
    opt = AdamW8bit(weight_decay=1e-4, min_8bit_size=8)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng)

    ref_model = TinyTransformer()
    ref_state = create_train_state(ref_model, opt, 0)
    ref_step = make_train_step(ref_model, opt, "CE", sched, policy=policy,
                               donate=False)

    tp_model = TinyTransformer(model_axis="model")
    mesh = make_mesh(data=4, model=2)
    tp_state = create_train_state(tp_model, opt, 0,
                                  tp_rules=MOBILEVIT_TP_RULES, tp_degree=2)
    specs = train_state_specs(tp_state, MOBILEVIT_TP_RULES)
    # 8-bit moments of TP-sharded params shard along their block axis
    assert specs.opt_state["m"]["transformer"]["ffs"]["0"]["fc1"]["w"] == \
        {"q": P("model", None), "s": P("model", None)}
    # and the q layout is (shards * blocks_local, BLOCK)
    q = tp_state.opt_state["m"]["transformer"]["ffs"]["0"]["fc1"]["w"]["q"]
    fc1 = tp_state.params["transformer"]["ffs"]["0"]["fc1"]["w"]
    blocks_local = -(-(fc1.size // 2) // 256)
    assert q.shape == (2 * blocks_local, 256)

    tp_state = jax.device_put(
        tp_state, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    tp_step = make_train_step(tp_model, opt, "CE", sched, policy=policy,
                              mesh=mesh, donate=False, state_specs=specs)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P(None, "data")))
    labels_s = jax.device_put(labels, NamedSharding(mesh, P(None, "data")))
    key_r = jax.device_put(jax.random.key(5), NamedSharding(mesh, P()))

    for i in range(3):
        ref_state, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))
        tp_state, m2 = tp_step(tp_state, feats_s, labels_s, key_r)
        np.testing.assert_allclose(np.asarray(m1["loss"]),
                                   np.asarray(m2["loss"]),
                                   rtol=5e-4, atol=5e-4)
    # params drift is bounded by the codec's 6.25% relative moment error
    # times a few lr-sized updates
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(tp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-3)


def test_tp_eval_matches_single_device(rng):
    """The eval step must also honor param shardings — replicated TP params
    would double every FFN psum output."""
    from picklebot_tpu.train.step import make_eval_step
    opt = AdamW()
    policy = DtypePolicy.f32()
    feats = jnp.asarray(rng.randint(0, 255, (8, 2, 8, 8, 3)).astype(np.uint8))
    labels = jnp.asarray(rng.randint(0, 13, (8,)).astype(np.int32))

    ref_model = TinyTransformer()
    ref_state = create_train_state(ref_model, opt, 0)
    mask = jnp.ones((8,), jnp.float32)
    ref_eval = make_eval_step(ref_model, "CE", policy=policy)
    out1 = ref_eval(ref_state, feats, labels, mask)

    tp_model = TinyTransformer(model_axis="model")
    mesh = make_mesh(data=4, model=2)
    state = create_train_state(tp_model, opt, 0)
    specs = train_state_specs(state, MOBILEVIT_TP_RULES)
    state = jax.device_put(state, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P)))
    tp_eval = make_eval_step(tp_model, "CE", policy=policy, mesh=mesh,
                             state_specs=specs)
    out2 = tp_eval(state,
                   jax.device_put(feats, NamedSharding(mesh, P("data"))),
                   jax.device_put(labels, NamedSharding(mesh, P("data"))),
                   jax.device_put(mask, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5, atol=1e-5)
    assert float(out1["correct"]) == float(out2["correct"])


def test_tp_gradients_match_dense(rng):
    """Direct gradient comparison — the teeth the Adam-update compare lacks:
    sharded FFN grads must equal the dense grads (no TP-degree overscale
    from the psum transpose), and replicated-param grads must be identical
    on every model shard (checked shard-by-shard) and equal to dense."""
    from jax import shard_map

    from picklebot_tpu.core.module import flatten_dict
    from picklebot_tpu.train.losses import cross_entropy

    policy = DtypePolicy.f32()
    feats, labels = _data(rng)
    x8 = jnp.asarray(feats[0], jnp.float32) / 255
    l8 = labels[0]

    ref_model = TinyTransformer()
    tp_model = TinyTransformer(model_axis="model")
    v = ref_model.init(0)

    def dense_loss(params):
        out, _ = ref_model.apply({"params": params, "state": v["state"]},
                                 x8, train=False, policy=policy)
        return cross_entropy(out, l8)

    g_dense = flatten_dict(jax.grad(dense_loss)(v["params"]))

    mesh = make_mesh(data=1, model=2)
    p_specs = param_specs(v["params"], MOBILEVIT_TP_RULES)

    def tp_loss(params, x, l):
        out, _ = tp_model.apply({"params": params, "state": v["state"]},
                                x, train=False, policy=policy)
        return cross_entropy(out, l)

    gfun = shard_map(jax.grad(tp_loss), mesh=mesh,
                     in_specs=(p_specs, P(), P()), out_specs=p_specs,
                     check_vma=False)
    params_sharded = jax.device_put(
        v["params"], jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), p_specs,
            is_leaf=lambda x: isinstance(x, P)))
    g_tp = gfun(params_sharded,
                jax.device_put(x8, NamedSharding(mesh, P())),
                jax.device_put(l8, NamedSharding(mesh, P())))
    flat_tp = flatten_dict(g_tp)
    flat_specs = flatten_dict(jax.tree_util.tree_map(
        lambda s: s, p_specs, is_leaf=lambda x: isinstance(x, P)))

    for path, dense in g_dense.items():
        got = flat_tp[path]
        spec = flat_specs[path]
        if spec == P():
            # replicated grads: every model shard must hold the SAME value
            # equal to the dense grad (divergence across shards was the bug)
            for shard in got.addressable_shards:
                np.testing.assert_allclose(
                    np.asarray(shard.data), np.asarray(dense),
                    rtol=1e-5, atol=1e-6, err_msg=path)
        else:
            # sharded grads assemble to the dense grad (1.0x, not TP-degree)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(dense),
                rtol=1e-5, atol=1e-6, err_msg=path)


def test_tp_with_packed_flash_attention(rng):
    """The head-packed flash kernel (ops/pallas/flash_packed.py) must
    compose with the shard_map DP x TP step: attention params are
    replicated, FFNs sharded, and the Pallas call runs per-device inside
    the mesh. Loss must match the unsharded xla-attention reference."""
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng)

    class PackedTransformer(TinyTransformer):
        def __init__(self, model_axis=None):
            Module.__init__(self)
            self.embed = Dense(4 * 4 * 3, 128)
            self.transformer = TransformerStack(
                128, depth=1, heads=8, dim_head=16, ffw_dim=64,
                backend="packed", model_axis=model_axis)
            self.head = Dense(128, 13)

    ref = PackedTransformer()
    ref_state = create_train_state(ref, opt, 0)
    ref_step = make_train_step(ref, opt, "CE", sched, policy=policy,
                               donate=False)
    _, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))

    tp = PackedTransformer(model_axis="model")
    mesh = make_mesh(data=4, model=2)
    state0 = create_train_state(tp, opt, 0)
    specs = train_state_specs(state0, MOBILEVIT_TP_RULES)
    state0 = jax.device_put(
        state0, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    step = make_train_step(tp, opt, "CE", sched, policy=policy,
                           mesh=mesh, donate=False, state_specs=specs)
    _, m2 = step(state0,
                 jax.device_put(feats, NamedSharding(mesh, P(None, "data"))),
                 jax.device_put(labels, NamedSharding(mesh, P(None, "data"))),
                 jax.device_put(jax.random.key(5), NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5, atol=1e-5)
