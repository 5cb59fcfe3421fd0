"""Pipeline parallelism: GPipe microbatch schedule over the 'pipe' axis.

The PP analog of test_sequence_parallel.py: a mesh with a 'pipe' axis must
reproduce single-device training exactly — the tick scan + ppermute stage
rotation (parallel/pipeline.py) equals the plain layer loop, fill/drain
garbage is masked out of outputs AND gradients, and the psum-backward
param wrap accumulates each stage's layer gradients into the full
gradient on every rank. PP is a beyond-reference capability (the
reference's parallelism is DDP only, reference train.py:24-36).
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
                                         train_state_specs)
from picklebot_tpu.parallel.pipeline import gpipe_apply
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step


# ---------------------------------------------------------------- op level

def test_gpipe_apply_matches_serial_loop(rng):
    """The schedule alone: a stack of dense layers pipelined over 4 stages
    equals the serial loop, for values AND input/param gradients."""
    depth, d = 4, 8
    ws = jnp.asarray(rng.randn(depth, d, d).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(8, 3, d).astype(np.float32))
    cot = jnp.asarray(rng.randn(8, 3, d).astype(np.float32))

    def layer(w, h):
        return jnp.tanh(h @ w)

    def serial(ws, x):
        for i in range(depth):
            x = layer(ws[i], x)
        return x

    mesh = make_mesh(data=1, pipe=4)
    from jax import shard_map

    def local(ws, x):
        return gpipe_apply(lambda w, li, mi, h: layer(w, h), ws, x,
                           "pipe", microbatches=4)

    piped = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P()),
                              out_specs=P(), check_vma=False))
    np.testing.assert_allclose(np.asarray(piped(ws, x)),
                               np.asarray(serial(ws, x)),
                               rtol=1e-5, atol=1e-6)

    def loss_p(ws, x):
        return jnp.sum(piped(ws, x) * cot)

    def loss_s(ws, x):
        return jnp.sum(serial(ws, x) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1))(ws, x)
    gs = jax.grad(loss_s, argnums=(0, 1))(ws, x)
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # NOTE: gpipe_apply's param grads need no psum here because ws enters
    # as a shard_map argument replicated over 'pipe' with out-grads
    # reduced by the P() out_spec... they don't — grads of shard_map
    # inputs with P() specs ARE psum'd by the transpose. The module path
    # (pp_wrap_params) covers the in-model case below.


# ------------------------------------------------------------- model level

class TinyTransformer(Module):
    """Same harness as the SP tests, with PP knobs. depth=2 splits over
    pipe=2; input (B, 2, 8, 8, 3) flattens to N=8 tokens of dim 48."""

    def __init__(self, num_classes=13, model_axis=None, sequence_axis=None,
                 pipeline_axis=None, microbatches=None, depth=2,
                 dropout=0.0):
        super().__init__()
        self.embed = Dense(4 * 4 * 3, 32)
        self.transformer = TransformerStack(
            32, depth=depth, heads=4, dim_head=8, ffw_dim=64,
            dropout=dropout, backend="xla", model_axis=model_axis,
            sequence_axis=sequence_axis, pipeline_axis=pipeline_axis,
            pipeline_microbatches=microbatches)
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


def _run_pair(rng, mesh, pp_model, ref_model=None, n_steps=2, specs=None,
              state0=None):
    """(single-device states, pipelined states) after n_steps."""
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng)

    ref_model = ref_model or TinyTransformer()
    ref_state = create_train_state(ref_model, opt, 0)
    ref_step = make_train_step(ref_model, opt, "CE", sched, policy=policy,
                               donate=False)

    pp_state = state0 if state0 is not None else create_train_state(
        pp_model, opt, 0)
    shard = (jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P)) if specs is not None
        else NamedSharding(mesh, P()))
    pp_state = jax.device_put(pp_state, shard)
    pp_step = make_train_step(pp_model, opt, "CE", sched, policy=policy,
                              mesh=mesh, donate=False, state_specs=specs)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P(None, "data")))
    labels_s = jax.device_put(labels, NamedSharding(mesh, P(None, "data")))
    key_r = jax.device_put(jax.random.key(5), NamedSharding(mesh, P()))

    losses = []
    for _ in range(n_steps):
        ref_state, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))
        pp_state, m2 = pp_step(pp_state, feats_s, labels_s, key_r)
        losses.append((np.asarray(m1["loss"]), np.asarray(m2["loss"])))
    return ref_state, pp_state, losses


def _assert_states_match(ref_state, pp_state, losses):
    for l1, l2 in losses:
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(pp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-3)


def test_pp_train_matches_single_device(rng):
    """data=2 x pipe=2: depth-2 stack as a 2-stage pipeline == unsharded,
    through the optimizer (stage grads psum to the full gradient)."""
    mesh = make_mesh(data=2, pipe=2)
    ref_state, pp_state, losses = _run_pair(
        rng, mesh, TinyTransformer(pipeline_axis="pipe"))
    _assert_states_match(ref_state, pp_state, losses)


def test_pp_more_microbatches_than_stages(rng):
    """M=4 microbatches over 2 stages (the bubble-amortizing regime)."""
    mesh = make_mesh(data=2, pipe=2)
    ref_state, pp_state, losses = _run_pair(
        rng, mesh, TinyTransformer(pipeline_axis="pipe", microbatches=4))
    _assert_states_match(ref_state, pp_state, losses)


def test_pp_composes_with_tp(rng):
    """data=2 x pipe=2 x model=2: pipeline stages whose FFNs are Megatron-
    sharded over 'model' in the same step == single device."""
    mesh = make_mesh(data=2, pipe=2, model=2)
    pp_model = TinyTransformer(pipeline_axis="pipe", model_axis="model")
    opt = AdamW(weight_decay=1e-4)
    state0 = create_train_state(pp_model, opt, 0)
    specs = train_state_specs(state0, MOBILEVIT_TP_RULES)
    ref_state, pp_state, losses = _run_pair(rng, mesh, pp_model,
                                            specs=specs, state0=state0)
    _assert_states_match(ref_state, pp_state, losses)


def test_pp_composes_with_sp(rng):
    """data=2 x pipe=2 x seq=2: tokens scatter over 'seq' first, then the
    depth pipelines over 'pipe' with ring attention inside each tick."""
    mesh = make_mesh(data=2, pipe=2, seq=2)
    ref_state, pp_state, losses = _run_pair(
        rng, mesh, TinyTransformer(pipeline_axis="pipe",
                                   sequence_axis="seq"))
    _assert_states_match(ref_state, pp_state, losses)


def test_pp_falls_back_when_depth_indivisible(rng):
    """depth=3 over pipe=2: the stack must run the plain loop (correct,
    unpipelined) and training still matches single device."""
    mesh = make_mesh(data=2, pipe=2)
    ref_state, pp_state, losses = _run_pair(
        rng, mesh, TinyTransformer(pipeline_axis="pipe", depth=3),
        ref_model=TinyTransformer(depth=3))
    _assert_states_match(ref_state, pp_state, losses)


def test_pp_dropout_path_runs(rng):
    """Dropout under PP draws from a (layer, microbatch)-keyed stream —
    not parity-testable against unsharded, but must run and stay finite."""
    mesh = make_mesh(data=2, pipe=2)
    model = TinyTransformer(pipeline_axis="pipe", dropout=0.3)
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng)
    state = jax.device_put(create_train_state(model, opt, 0),
                           NamedSharding(mesh, P()))
    step = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), mesh=mesh, donate=False)
    _, m = step(state,
                jax.device_put(feats, NamedSharding(mesh, P(None, "data"))),
                jax.device_put(labels, NamedSharding(mesh, P(None, "data"))),
                jax.device_put(jax.random.key(5), NamedSharding(mesh, P())))
    assert np.isfinite(np.asarray(m["loss"])).all()


def test_pp_axis_must_be_distinct():
    with pytest.raises(ValueError, match="distinct"):
        TransformerStack(32, depth=2, heads=4, dim_head=8, ffw_dim=64,
                         model_axis="model", pipeline_axis="model")
    with pytest.raises(ValueError, match="distinct"):
        TransformerStack(32, depth=2, heads=4, dim_head=8, ffw_dim=64,
                         sequence_axis="seq", pipeline_axis="seq")


def test_config_validates_pipeline_keys():
    from picklebot_tpu.utils.config import Config

    def cfg(**kw):
        return Config(model_name="MobileViT", batch_size=4,
                      effective_batch_size=4, data_backend="synthetic",
                      dims=[32, 32, 32],
                      channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],
                      **kw).validate()

    assert cfg(pipeline_parallel=2).pipeline_parallel == 2
    assert cfg(pipeline_microbatches=2).pipeline_microbatches == 2
    with pytest.raises(ValueError, match="divide batch_size"):
        cfg(pipeline_microbatches=3)
    with pytest.raises(ValueError, match="MobileViT"):
        Config(model_name="MobileNetLarge3D", batch_size=4,
               effective_batch_size=4, data_backend="synthetic",
               pipeline_parallel=2).validate()


@pytest.mark.slow
def test_train_loop_with_pipeline_parallel(tmp_path):
    """train(config) end-to-end with pipeline_parallel=2 x data_parallel=2:
    the loop builds the (data, pipe, seq, model) mesh from the config and
    one epoch of synthetic training runs finite."""
    from picklebot_tpu.train.loop import train
    from picklebot_tpu.utils.config import Config

    cfg = Config(
        model_name="MobileViT", batch_size=2, effective_batch_size=4,
        data_backend="synthetic", synthetic_len=8, synthetic_shape=(2, 16, 16),
        dims=[32, 32, 32],
        channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],
        max_iters=1, eval_interval=1, learning_rate=1e-3,
        weight_decay=1e-4, use_autocast=False, num_classes=13,
        data_parallel=2, pipeline_parallel=2, num_workers=0,
        checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
    ).validate()
    summary = train(cfg, max_steps=1)
    assert np.isfinite(summary["final_train_loss"])
