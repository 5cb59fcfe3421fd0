"""Global-norm gradient clipping (max_grad_norm): torch clip_grad_norm_
semantics, identical across single-device / DP / ZeRO-DP / TP / EP
execution (sharded leaves psum their squared norms over their axes)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.parallel.zero import zero_state_specs
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step

from tests.test_train_step import TinyNoBNNet, _data


def _step(model, opt, mesh=None, zero=0, specs=None, max_norm=None):
    return make_train_step(model, opt, "CE", cosine_annealing_lr(1e-3, 10),
                           policy=DtypePolicy.f32(), mesh=mesh, donate=False,
                           state_specs=specs, zero_degree=zero,
                           max_grad_norm=max_norm)


def test_clipping_matches_torch_semantics(rng):
    """With a tiny max norm the update direction is the normalized grad:
    verify against an explicit value_and_grad + manual clip + optimizer."""
    from picklebot_tpu.train.losses import LOSSES, prepare_labels
    from picklebot_tpu.train.step import preprocess

    model = TinyNoBNNet()
    opt = AdamW(weight_decay=0.0)
    state = create_train_state(model, opt, jax.random.key(0))
    feats, labels = _data(rng, accum=1, batch=4)
    max_norm = 1e-3

    step = _step(model, opt, max_norm=max_norm)
    new_state, metrics = step(state, feats, labels, jax.random.key(3))
    assert "grad_norm" in metrics

    # manual reference: same micro loss, explicit clip, same optimizer
    loss_fn, _ = LOSSES["CE"]

    def loss(params):
        x = preprocess(feats[0], jnp.float32)
        logits, _ = model.apply(
            {"params": params, "state": state.model_state}, x,
            train=True, rng=jax.random.fold_in(
                jax.random.fold_in(jax.random.key(3), 0), 0),
            policy=DtypePolicy.f32())
        return loss_fn(logits, prepare_labels("CE", labels[0]))

    grads = jax.grad(loss)(state.params)
    sq = sum(jnp.sum(jnp.square(g))
             for g in jax.tree_util.tree_leaves(grads))
    gnorm = jnp.sqrt(sq)
    np.testing.assert_allclose(float(metrics["grad_norm"]), float(gnorm),
                               rtol=1e-5)
    scale = min(1.0, max_norm / (float(gnorm) + 1e-6))
    clipped = jax.tree_util.tree_map(lambda g: g * scale, grads)
    ref_params, _ = opt.update(clipped, state.opt_state, state.params,
                               jnp.float32(1e-3))
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_clipping_consistent_across_dp_and_zero(rng):
    """single == DP8 == ZeRO-DP8 with clipping enabled (the norm is over
    the reduced grads in every layout)."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    feats, labels = _data(rng, accum=2, batch=16)
    max_norm = 1e-2  # small enough to clip every step
    mesh = make_mesh(data=8)

    results = {}
    s0 = create_train_state(model, opt, jax.random.key(0))
    single = _step(model, opt, max_norm=max_norm)
    results["single"] = single(s0, feats, labels, jax.random.key(5))

    dp = _step(model, opt, mesh=mesh, max_norm=max_norm)
    results["dp"] = dp(s0, feats, labels, jax.random.key(5))

    sz = create_train_state(model, opt, jax.random.key(0), zero_degree=8)
    zz = _step(model, opt, mesh=mesh, zero=8, specs=zero_state_specs(sz),
               max_norm=max_norm)
    results["zero"] = zz(sz, feats, labels, jax.random.key(5))

    ref_state, ref_metrics = results["single"]
    for name in ("dp", "zero"):
        st, m = results[name]
        np.testing.assert_allclose(float(m["grad_norm"]),
                                   float(ref_metrics["grad_norm"]),
                                   rtol=1e-5, err_msg=name)
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                        jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=name)


def test_no_clip_below_threshold(rng):
    """A huge max_norm must leave the update identical to no clipping
    (scale pinned at 1) while still reporting the norm."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    state = create_train_state(model, opt, jax.random.key(0))
    feats, labels = _data(rng, accum=1, batch=4)

    plain = _step(model, opt)
    clip = _step(model, opt, max_norm=1e9)
    s1, m1 = plain(state, feats, labels, jax.random.key(1))
    s2, m2 = clip(state, feats, labels, jax.random.key(1))
    assert "grad_norm" not in m1 and float(m2["grad_norm"]) > 0
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_config_rejects_nonpositive_max_norm():
    from picklebot_tpu.utils.config import Config

    with pytest.raises(ValueError, match="positive"):
        Config(max_grad_norm=-1.0).validate()


def test_clipping_matches_single_device_under_tp(rng):
    """The global norm psums TP-sharded leaf squares over 'model', so
    DP4xTP2 clipped training equals single-device clipped training."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from picklebot_tpu.parallel.mesh import (MOBILEVIT_TP_RULES,
                                             train_state_specs)
    from tests.test_tensor_parallel import TinyTransformer
    from tests.test_tensor_parallel import _data as _tp_data

    opt = AdamW(weight_decay=1e-4)
    feats, labels = _tp_data(rng)
    max_norm = 1e-2  # small enough to clip every step

    ref_model = TinyTransformer()
    ref_state = create_train_state(ref_model, opt, 0)
    ref_step = _step(ref_model, opt, max_norm=max_norm)
    s1, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))

    tp_model = TinyTransformer(model_axis="model")
    mesh = make_mesh(data=4, model=2)
    state0 = create_train_state(tp_model, opt, 0)
    specs = train_state_specs(state0, MOBILEVIT_TP_RULES)
    state0 = jax.device_put(
        state0, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    tp_step = _step(tp_model, opt, mesh=mesh, specs=specs,
                    max_norm=max_norm)
    s2, m2 = tp_step(
        state0,
        jax.device_put(feats, NamedSharding(mesh, P(None, "data"))),
        jax.device_put(labels, NamedSharding(mesh, P(None, "data"))),
        jax.device_put(jax.random.key(5), NamedSharding(mesh, P())))

    np.testing.assert_allclose(float(m2["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-3)


def test_clipping_matches_single_device_under_ep(rng):
    """Expert-sharded leaf squares psum over 'expert': DP2xEP4 clipped
    training equals single-device clipped training (MoE transformer)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from picklebot_tpu.parallel.mesh import (MOBILEVIT_MOE_EP_RULES,
                                             train_state_specs)
    from tests.test_moe import TinyMoE
    from tests.test_moe import _data as _moe_data

    opt = AdamW(weight_decay=1e-4)
    feats, labels = _moe_data(rng)
    max_norm = 1e-2

    ref_model = TinyMoE()
    ref_state = create_train_state(ref_model, opt, 0)
    ref_step = _step(ref_model, opt, max_norm=max_norm)
    s1, m1 = ref_step(ref_state, feats, labels, jax.random.key(5))

    ep_model = TinyMoE(expert_axis="expert")
    mesh = make_mesh(data=2, expert=4)
    state0 = create_train_state(ep_model, opt, 0,
                                tp_rules=MOBILEVIT_MOE_EP_RULES,
                                tp_degree=4)
    specs = train_state_specs(state0, MOBILEVIT_MOE_EP_RULES)
    state0 = jax.device_put(
        state0, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P)))
    ep_step = _step(ep_model, opt, mesh=mesh, specs=specs,
                    max_norm=max_norm)
    s2, m2 = ep_step(
        state0,
        jax.device_put(feats, NamedSharding(mesh, P(None, "data"))),
        jax.device_put(labels, NamedSharding(mesh, P(None, "data"))),
        jax.device_put(jax.random.key(5), NamedSharding(mesh, P())))

    np.testing.assert_allclose(float(m2["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-3)
