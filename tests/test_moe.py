"""Mixture-of-Experts FFN + expert parallelism over the 'expert' mesh axis.

The EP analog of test_tensor_parallel.py / test_sequence_parallel.py: the
dense one-hot dispatch (ops/moe.py) must be exactly the expert MLP math
(single-expert degenerate case == the dense FFN), and sharding the expert
bank over 'expert' must reproduce the replicated MoE exactly — forward,
gradients (router sync + boundary operators), and whole training steps
through the optimizer, aux loss included.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from picklebot_tpu.core.module import Ctx, DtypePolicy, Module
from picklebot_tpu.models.mobilevit import TransformerStack
from picklebot_tpu.ops.linear import Dense
from picklebot_tpu.ops.moe import MoEFeedForward
from picklebot_tpu.parallel.mesh import (MOBILEVIT_MOE_EP_RULES, make_mesh,
                                         train_state_specs)
from picklebot_tpu.train.optim import AdamW, AdamW8bit, cosine_annealing_lr
from picklebot_tpu.train.step import (collect_aux_losses, create_train_state,
                                      make_train_step)


# ---------------------------------------------------------------- op level

def test_moe_single_expert_equals_dense_mlp(rng):
    """n_experts=1, top-1, capacity >= tokens: routing is the identity and
    the module must compute exactly silu(x @ w1) @ w2."""
    D, H = 16, 32
    mod = MoEFeedForward(D, H, n_experts=1, top_k=1, capacity_factor=1.0)
    variables = mod.init(0)
    x = rng.randn(2, 3, 24, D).astype(np.float32)
    out, _ = mod.apply(variables, x, train=False, policy=DtypePolicy.f32())
    ref = jax.nn.silu(x @ variables["params"]["w1"][0]) \
        @ variables["params"]["w2"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_moe_aux_loss_published_and_finite(rng):
    D, H, E = 16, 32, 4
    mod = MoEFeedForward(D, H, E, top_k=2)
    variables = mod.init(0)
    x = rng.randn(2, 3, 24, D).astype(np.float32)
    _, new_state = mod.apply(variables, x, train=False,
                             policy=DtypePolicy.f32())
    aux = collect_aux_losses(new_state)
    assert aux is not None and np.isfinite(float(aux)) and float(aux) > 0
    # near-uniform router at init -> near-balanced load -> aux near 1.0
    assert 0.5 < float(aux) < 2.0


def test_moe_capacity_drops_overflow_tokens(rng):
    """capacity_factor so small every expert holds 1 slot: most tokens must
    drop (combine weight zero -> output row exactly zero)."""
    D, H, E = 8, 16, 2
    mod = MoEFeedForward(D, H, E, top_k=1, capacity_factor=1e-6)
    assert mod.capacity(64) == 1
    variables = mod.init(0)
    x = rng.randn(1, 1, 64, D).astype(np.float32)
    out, _ = mod.apply(variables, x, train=False, policy=DtypePolicy.f32())
    zero_rows = np.sum(np.all(np.asarray(out) == 0.0, axis=-1))
    assert zero_rows >= 62  # 64 tokens, <= 2 slots


def test_moe_ep_matches_replicated_forward_and_grads(rng):
    """Expert bank sharded over 'expert' == replicated: loss identical,
    router gradient (psum-bwd sync) and expert-weight gradients exact.
    Gradients are computed INSIDE shard_map, as the train step does."""
    D, H, E = 16, 32, 8
    x = rng.randn(2, 3, 24, D).astype(np.float32)
    rep = MoEFeedForward(D, H, E, top_k=2)
    variables = rep.init(0)
    state0 = variables["state"]

    def rep_loss(params):
        out, ns = rep.apply({"params": params, "state": state0}, x,
                            train=False, policy=DtypePolicy.f32())
        return jnp.sum(out ** 2) + 0.01 * ns["aux_loss"]

    ref_val, ref_grads = jax.value_and_grad(rep_loss)(variables["params"])

    ep = MoEFeedForward(D, H, E, top_k=2, expert_axis="expert")
    mesh = make_mesh(data=1, expert=4)
    pspecs = {"router": P(), "w1": P("expert", None, None),
              "w2": P("expert", None, None)}

    def local_vg(params, xx):
        def loss(p):
            out, ns = ep.apply({"params": p, "state": state0}, xx,
                               train=False, policy=DtypePolicy.f32())
            return jnp.sum(out ** 2) + 0.01 * ns["aux_loss"]
        return jax.value_and_grad(loss)(params)

    sharded = shard_map(local_vg, mesh=mesh, in_specs=(pspecs, P()),
                        out_specs=(P(), pspecs), check_vma=False)
    params_dev = jax.device_put(
        variables["params"],
        {k: NamedSharding(mesh, s) for k, s in pspecs.items()})
    val, grads = jax.jit(sharded)(params_dev, x)
    np.testing.assert_allclose(float(ref_val), float(val), rtol=1e-6)
    for k in ref_grads:
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(ref_grads[k]),
                                   rtol=1e-4, atol=1e-6)


def test_moe_token_sharded_matches_grouped_reference(rng):
    """dispatch='tokens' (the production EP pattern: tokens AND experts
    sharded, two all_to_alls) == the same module applied on one device to
    tokens reshaped into the per-rank routing groups — outputs bit-exact,
    loss and every gradient (router aux path included) exact."""
    D, H, E, S = 16, 32, 8, 4
    B, P_, N = 2, 3, 24
    x = rng.randn(B, P_, N, D).astype(np.float32)

    ref_mod = MoEFeedForward(D, H, E, top_k=2)
    variables = ref_mod.init(0)
    state0 = variables["state"]
    xg = x.reshape(B, P_, S, N // S, D)   # device-local routing groups

    def ref_loss(params):
        out, ns = ref_mod.apply({"params": params, "state": state0}, xg,
                                train=False, policy=DtypePolicy.f32())
        return jnp.sum(out ** 2) + 0.01 * ns["aux_loss"], out

    (ref_val, ref_out), ref_grads = jax.value_and_grad(
        ref_loss, has_aux=True)(variables["params"])
    ref_out = np.asarray(ref_out).reshape(B, P_, N, D)

    ep_mod = MoEFeedForward(D, H, E, top_k=2, expert_axis="expert",
                            dispatch="tokens")
    mesh = make_mesh(data=1, expert=S)
    pspecs = {"router": P(), "w1": P("expert", None, None),
              "w2": P("expert", None, None)}

    def local_vg(params, xx):
        def loss(p):
            out, ns = ep_mod.apply({"params": p, "state": state0}, xx,
                                   train=False, policy=DtypePolicy.f32())
            return jnp.sum(out ** 2) + 0.01 * ns["aux_loss"], out
        return jax.value_and_grad(loss, has_aux=True)(params)

    sharded = shard_map(local_vg, mesh=mesh, in_specs=(pspecs, P()),
                        out_specs=((P(), P()), pspecs), check_vma=False)
    params_dev = jax.device_put(
        variables["params"],
        {k: NamedSharding(mesh, s) for k, s in pspecs.items()})
    (val, out), grads = jax.jit(sharded)(params_dev, x)
    np.testing.assert_allclose(float(ref_val), float(val), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out), ref_out)
    for k in ref_grads:
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(ref_grads[k]),
                                   rtol=1e-4, atol=1e-6)


def test_moe_token_sharded_falls_back_when_indivisible(rng):
    """Token count not divisible by the axis -> the replicated dispatch
    runs (still exact vs the unsharded module on the SAME ungrouped
    tokens)."""
    D, H, E = 16, 32, 8
    x = rng.randn(2, 1, 21, D).astype(np.float32)   # 21 % 4 != 0
    ref_mod = MoEFeedForward(D, H, E, top_k=2)
    variables = ref_mod.init(0)
    state0 = variables["state"]
    ref_out, _ = ref_mod.apply(variables, x, train=False,
                               policy=DtypePolicy.f32())

    ep_mod = MoEFeedForward(D, H, E, top_k=2, expert_axis="expert",
                            dispatch="tokens")
    mesh = make_mesh(data=1, expert=4)
    pspecs = {"router": P(), "w1": P("expert", None, None),
              "w2": P("expert", None, None)}

    def local(params, xx):
        out, _ = ep_mod.apply({"params": params, "state": state0}, xx,
                              train=False, policy=DtypePolicy.f32())
        return out

    sharded = shard_map(local, mesh=mesh, in_specs=(pspecs, P()),
                        out_specs=P(), check_vma=False)
    params_dev = jax.device_put(
        variables["params"],
        {k: NamedSharding(mesh, s) for k, s in pspecs.items()})
    out = jax.jit(sharded)(params_dev, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- model level

class TinyMoE(Module):
    """test_sequence_parallel.TinyTransformer with an MoE FFN bank.
    Input (B, 2, 8, 8, 3) flattens to 8 tokens of dim 48."""

    def __init__(self, num_classes=13, expert_axis=None, n_experts=4,
                 dropout=0.0, moe_dispatch="replicated"):
        super().__init__()
        self.embed = Dense(4 * 4 * 3, 32)
        self.transformer = TransformerStack(
            32, depth=2, heads=4, dim_head=8, ffw_dim=64, dropout=dropout,
            backend="xla", moe_experts=n_experts, moe_top_k=2,
            expert_axis=expert_axis, moe_dispatch=moe_dispatch)
        self.head = Dense(32, num_classes)

    def forward(self, cx: Ctx, x):
        b = x.shape[0]
        tokens = x.reshape(b, -1, 4 * 4 * 3)
        h = cx(self.embed, tokens)
        h = cx(self.transformer, h)
        return cx(self.head, jnp.mean(h, axis=1))


def _data(rng, accum=1, batch=8):
    feats = rng.randint(0, 255, (accum, batch, 2, 8, 8, 3)).astype(np.uint8)
    labels = rng.randint(0, 13, (accum, batch)).astype(np.int32)
    return jnp.asarray(feats), jnp.asarray(labels)


@pytest.mark.parametrize("opt_name", ["adamw", "adamw8bit"])
def test_ep_train_matches_single_device(rng, opt_name):
    """data=2 x expert=4: EP-sharded MoE training == unsharded, through the
    optimizer (fp32 AdamW and per-shard-quantized 8-bit moments)."""
    if opt_name == "adamw":
        opt = AdamW(weight_decay=1e-4)
    else:
        # tiny test tensors: force quantized moments for the expert bank
        # (w1 is 4x32x64 = 8192 elements; 2048 local -> quantized per shard)
        opt = AdamW8bit(weight_decay=1e-4, min_8bit_size=1024)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng)

    ref_model = TinyMoE()
    ref_state = create_train_state(ref_model, opt, 0)
    ref_step = make_train_step(ref_model, opt, "CE", sched, policy=policy,
                               donate=False)

    mesh = make_mesh(data=2, expert=4)
    ep_model = TinyMoE(expert_axis="expert")
    ep_state = create_train_state(ep_model, opt, 0,
                                  tp_rules=MOBILEVIT_MOE_EP_RULES,
                                  tp_degree=4)
    specs = train_state_specs(ep_state, MOBILEVIT_MOE_EP_RULES)
    ep_state = jax.device_put(
        ep_state, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    ep_step = make_train_step(ep_model, opt, "CE", sched, policy=policy,
                              mesh=mesh, donate=False, state_specs=specs)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P(None, "data")))
    labels_s = jax.device_put(labels, NamedSharding(mesh, P(None, "data")))
    key_r = jax.device_put(jax.random.key(5), NamedSharding(mesh, P()))

    for _ in range(2):
        ref_state, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))
        ep_state, m2 = ep_step(ep_state, feats_s, labels_s, key_r)
        np.testing.assert_allclose(np.asarray(m1["loss"]),
                                   np.asarray(m2["loss"]),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(ep_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-3)
    # the aux loss made it into the carried model state
    aux = collect_aux_losses(ep_state.model_state)
    assert aux is not None and np.isfinite(float(aux))


def test_ep_token_sharded_train_step(rng):
    """Whole train step with dispatch='tokens' over data=2 x expert=4:
    8 tokens split 2-per-rank, all_to_all exchange inside the jitted step;
    finite loss, params move, aux carried."""
    mesh = make_mesh(data=2, expert=4)
    model = TinyMoE(expert_axis="expert", moe_dispatch="tokens")
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng)
    state = create_train_state(model, opt, 0)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    specs = train_state_specs(state, MOBILEVIT_MOE_EP_RULES)
    state = jax.device_put(
        state, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    step = make_train_step(model, opt, "CE", sched, policy=DtypePolicy.f32(),
                           mesh=mesh, donate=False, state_specs=specs)
    state, m = step(state,
                    jax.device_put(feats,
                                   NamedSharding(mesh, P(None, "data"))),
                    jax.device_put(labels,
                                   NamedSharding(mesh, P(None, "data"))),
                    jax.device_put(jax.random.key(5),
                                   NamedSharding(mesh, P())))
    assert np.isfinite(np.asarray(m["loss"])).all()
    moved = any(
        not np.allclose(np.asarray(a), b) for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(p0)))
    assert moved
    aux = collect_aux_losses(state.model_state)
    assert aux is not None and np.isfinite(float(aux))


def test_moe_dropout_path_runs(rng):
    """Expert-MLP dropout under EP: per-rank masks, must run and stay
    finite (not parity-testable against unsharded rng streams)."""
    mesh = make_mesh(data=2, expert=4)
    model = TinyMoE(expert_axis="expert", dropout=0.3)
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng)
    state = create_train_state(model, opt, 0)
    specs = train_state_specs(state, MOBILEVIT_MOE_EP_RULES)
    state = jax.device_put(
        state, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    step = make_train_step(model, opt, "CE", sched, policy=DtypePolicy.f32(),
                           mesh=mesh, donate=False, state_specs=specs)
    _, m = step(state,
                jax.device_put(feats, NamedSharding(mesh, P(None, "data"))),
                jax.device_put(labels, NamedSharding(mesh, P(None, "data"))),
                jax.device_put(jax.random.key(5), NamedSharding(mesh, P())))
    assert np.isfinite(np.asarray(m["loss"])).all()


# ---------------------------------------------------------------- plumbing

def test_moe_rejects_other_parallelism_axes():
    with pytest.raises(ValueError, match="composes with"):
        TransformerStack(32, depth=1, heads=4, dim_head=8, ffw_dim=64,
                         moe_experts=4, model_axis="model")
    with pytest.raises(ValueError, match="composes with"):
        TransformerStack(32, depth=1, heads=4, dim_head=8, ffw_dim=64,
                         moe_experts=4, sequence_axis="seq")


def test_moe_top_k_validation():
    with pytest.raises(ValueError, match="top_k"):
        MoEFeedForward(16, 32, n_experts=4, top_k=3)
    with pytest.raises(ValueError, match="top_k"):
        MoEFeedForward(16, 32, n_experts=1, top_k=2)


def test_config_expert_parallel_validation():
    from picklebot_tpu.utils.config import Config
    base = dict(model_name="MobileViT", dims=[64, 80, 96],
                channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320])
    with pytest.raises(ValueError, match="moe_experts"):
        Config(expert_parallel=2, **base).validate()
    with pytest.raises(ValueError, match="divide"):
        Config(moe_experts=6, expert_parallel=4, **base).validate()
    with pytest.raises(ValueError, match="composes"):
        Config(moe_experts=4, model_parallel=2, **base).validate()
    with pytest.raises(ValueError, match="MobileViT"):
        Config(model_name="MobileNetLarge3D", moe_experts=4).validate()
    cfg = Config(moe_experts=4, expert_parallel=2, **base).validate()
    from picklebot_tpu.models.registry import initialize_model
    model = initialize_model(cfg)
    stack = model.trunk[0][1].transformer
    ff = stack.ffs[0]
    assert type(ff).__name__ == "MoEFeedForward"
    assert ff.expert_axis == "expert" and ff.n_experts == 4


@pytest.mark.slow
def test_moe_model_learns(rng):
    """The routed expert path trains: gradients reach the router and the
    experts through the one-hot dispatch, and a separable synthetic task
    goes well above chance in a few dozen steps."""
    n, classes = 32, 4
    labels_np = rng.randint(0, classes, (1, n)).astype(np.int32)
    # class k -> brightness band k (recoverable from the token means)
    base = (labels_np[0, :, None, None, None, None] * 60 + 30)
    feats_np = np.clip(base + rng.randint(-20, 20, (n, 2, 8, 8, 3)),
                       0, 255).astype(np.uint8)[None]
    feats, labels = jnp.asarray(feats_np), jnp.asarray(labels_np)

    model = TinyMoE(num_classes=classes)
    opt = AdamW(weight_decay=0.0)
    sched = cosine_annealing_lr(3e-3, 100)
    state = create_train_state(model, opt, 0)
    step = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), donate=False)
    for _ in range(60):
        state, m = step(state, feats, labels, jax.random.key(7))
    acc = float(np.asarray(m["correct"]).sum()) / n  # (accum,) counts
    assert acc >= 0.7, f"train accuracy {acc} (chance {1 / classes})"


def test_ep_config_serves_replicated(rng):
    """serve/export/summary/autotune trace under plain jit (no mesh): an
    EP-trained config must strip to its replicated equivalent there, or
    the MoE's axis_size('expert') raises 'unbound axis name'."""
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train.step import make_predict_fn
    from picklebot_tpu.utils.config import Config, replicated_equivalent
    cfg = Config(model_name="MobileViT", num_classes=13,
                 moe_experts=4, expert_parallel=2, attention_backend="xla",
                 dims=[16, 16, 16],
                 channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32]
                 ).validate()
    stripped = replicated_equivalent(cfg)
    assert stripped.expert_parallel == 1
    assert stripped.moe_experts == 4       # weights/structure unchanged
    model = initialize_model(stripped)
    variables = model.init(0)
    predict = make_predict_fn(model, DtypePolicy.f32())
    feats = rng.randint(0, 255, (2, 4, 32, 32, 3)).astype(np.uint8)
    logits = predict(variables, feats)
    assert logits.shape == (2, 13)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_moe_pth_roundtrip(tmp_path, rng):
    """MoE checkpoints survive the .pth conversion cycle: expert weights
    and router export with pytree names (no torch counterpart exists),
    transient aux_loss state stays OUT of the file, and the re-import is
    exact under strict=True."""
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.train.key_maps import key_map_for
    from picklebot_tpu.utils.config import Config
    cfg = Config(model_name="MobileViT", num_classes=13, moe_experts=4,
                 attention_backend="xla", dims=[16, 16, 16],
                 channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32]
                 ).validate()
    model = initialize_model(cfg)
    variables = model.init(3)
    sd = ckpt.export_torch_state_dict(variables)
    assert not any(k.endswith("aux_loss") for k in sd)
    assert any(k.endswith(".router") for k in sd)
    import torch
    path = tmp_path / "moe.pth"
    torch.save(sd, str(path))
    v2 = ckpt.load_pth(str(path), model.init(99),
                       key_map=key_map_for("MobileViT"))
    from picklebot_tpu.core.module import flatten_dict
    fa, fb = flatten_dict(variables["params"]), flatten_dict(v2["params"])
    assert sorted(fa) == sorted(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k], np.float32),
                                      np.asarray(fb[k], np.float32),
                                      err_msg=k)


@pytest.mark.slow
def test_train_loop_with_expert_parallel(tmp_path, monkeypatch):
    """train(config) end-to-end with expert_parallel=2 x data_parallel=2:
    the loop builds the mesh with the 'expert' axis, shards the expert
    banks, and feeds the aux loss into the step."""
    from picklebot_tpu.train.loop import train
    from picklebot_tpu.utils.config import Config
    monkeypatch.chdir(tmp_path)
    cfg = Config(
        model_name="MobileViT", learning_rate=1e-3, batch_size=2,
        max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
        criterion="CE", num_classes=13, effective_batch_size=2,
        data_backend="synthetic", synthetic_len=8,
        synthetic_shape=(4, 32, 32), t_bucket=4, max_frames=4,
        num_workers=2, optimizer="adamw", data_parallel=2,
        moe_experts=4, expert_parallel=2, attention_backend="xla",
        dims=[16, 16, 16], channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "runs")).validate()
    summary = train(cfg, max_steps=2)
    assert np.isfinite(summary["final_val_loss"])
