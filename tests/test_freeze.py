"""Parameter freezing (train/freeze.py + the frozen_mask train-step path).

Semantics under test: torch ``requires_grad=False`` + AdamW —
frozen leaves are bit-identical after any number of steps (no gradient,
no weight decay), trainable leaves follow EXACTLY the trajectory of an
independent optimizer run over only the trainable subtree, and the whole
thing composes with DP and ZeRO-3 unchanged.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train.freeze import freeze_mask, frozen_summary
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import (create_train_state, make_train_step,
                                      preprocess)

from tests.test_train_step import TinyNoBNNet, _data


def _params():
    model = TinyNoBNNet()
    return model, model.init(0)["params"]


def test_freeze_mask_patterns():
    _, params = _params()
    # module name freezes both of its leaves
    mask = freeze_mask(params, ["fc"])
    assert mask["fc"]["w"] and mask["fc"]["b"]
    assert not mask["conv"]["w"] and not mask["conv"]["b"]
    # dotted leaf path freezes exactly that leaf
    mask = freeze_mask(params, ["conv.b"])
    assert mask["conv"]["b"] and not mask["conv"]["w"]
    # glob across modules
    mask = freeze_mask(params, ["*.w"])
    assert mask["conv"]["w"] and mask["fc"]["w"]
    assert not mask["conv"]["b"] and not mask["fc"]["b"]
    fl, tl, fn, tn = frozen_summary(params, mask)
    assert fl == 2 and tl == 4 and 0 < fn < tn


def test_freeze_mask_rejects_typos_and_freeze_all():
    _, params = _params()
    with pytest.raises(ValueError, match="match no parameter"):
        freeze_mask(params, ["convv"])           # typo
    with pytest.raises(ValueError, match="match no parameter"):
        freeze_mask(params, ["conv", "block2"])  # another model's module
    with pytest.raises(ValueError, match="froze every parameter"):
        freeze_mask(params, ["conv", "fc"])


def test_config_validates_freeze_params():
    from picklebot_tpu.utils.config import Config
    base = dict(model_name="MobileNetSmall3D")
    Config(**base, freeze_params=["stem"]).validate()
    with pytest.raises(ValueError, match="non-empty"):
        Config(**base, freeze_params=["stem", 3]).validate()
    with pytest.raises(ValueError, match="empty list"):
        Config(**base, freeze_params=[]).validate()


def test_frozen_leaves_bit_identical_trainable_match_subtree_run(rng):
    """Freeze 'conv' with nonzero weight decay: conv leaves must not move
    AT ALL (weight decay alone would move them), and the fc trajectory
    must match (float tolerance) an independent AdamW run over ONLY the
    fc subtree (conv closed over at its initial value) — the strongest
    equivalence to 'training just the head'."""
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-2)
    sched = cosine_annealing_lr(1e-3, 10)
    state0 = create_train_state(model, opt, jax.random.key(0))
    feats, labels = _data(rng, accum=1, batch=8)

    mask = freeze_mask(state0.params, ["conv"])
    step = make_train_step(model, opt, "CE", sched,
                           policy=DtypePolicy.f32(), donate=False,
                           frozen_mask=mask)
    state = state0
    rngs = [jax.random.key(11), jax.random.key(12), jax.random.key(13)]
    for r in rngs:
        state, _ = step(state, feats, labels, r)

    # frozen leaves: bit-identical to init (no grad, no weight decay)
    np.testing.assert_array_equal(np.asarray(state.params["conv"]["w"]),
                                  np.asarray(state0.params["conv"]["w"]))
    np.testing.assert_array_equal(np.asarray(state.params["conv"]["b"]),
                                  np.asarray(state0.params["conv"]["b"]))
    # trainable leaves moved
    assert not np.array_equal(np.asarray(state.params["fc"]["w"]),
                              np.asarray(state0.params["fc"]["w"]))

    # manual head-only run: grads over the fc subtree only, its own
    # optimizer instance (moments init over just that subtree)
    from picklebot_tpu.train.losses import LOSSES, prepare_labels
    loss_fn, _ = LOSSES["CE"]
    frozen_conv = state0.params["conv"]

    def subloss(sub, r):
        params = {"conv": frozen_conv, "fc": sub["fc"]}
        x = preprocess(feats[0], jnp.float32)
        logits, _ = model.apply(
            {"params": params, "state": state0.model_state}, x,
            train=True, rng=jax.random.fold_in(r, 0),
            policy=DtypePolicy.f32())
        return loss_fn(logits, prepare_labels("CE", labels[0]))

    sub = {"fc": state0.params["fc"]}
    sub_opt_state = opt.init(sub)
    lr = sched(jnp.zeros((), jnp.int32))
    for r in rngs:
        # grad-accum semantics with accum=1: grads cast to f32 and summed
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32),
            jax.grad(subloss)(sub, r))
        sub, sub_opt_state = opt.update(grads, sub_opt_state, sub, lr)

    # float-tolerance, not bit-exact: the jitted step fuses/reassociates
    # differently than the eager manual loop (~2e-9/step measured)
    np.testing.assert_allclose(np.asarray(state.params["fc"]["w"]),
                               np.asarray(sub["fc"]["w"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.params["fc"]["b"]),
                               np.asarray(sub["fc"]["b"]),
                               rtol=1e-5, atol=1e-7)


def test_freeze_composes_with_dp_and_zero3(rng):
    """Freeze under DP8 and ZeRO-3(8): frozen leaves stay put, full params
    equal the single-device freeze run (same tolerance as the ZeRO parity
    tests)."""
    from picklebot_tpu.parallel.zero import (param_templates,
                                             zero3_shard_params,
                                             zero3_state_specs,
                                             zero3_unshard_params)
    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    policy = DtypePolicy.f32()
    feats, labels = _data(rng, accum=2, batch=16)
    mesh = make_mesh(data=8)

    s0 = create_train_state(model, opt, jax.random.key(0))
    mask = freeze_mask(s0.params, ["conv"])

    def run(step, state, n=3):
        for i in range(n):
            state, _ = step(state, feats, labels, jax.random.key(i))
        return state

    single = run(make_train_step(model, opt, "CE", sched, policy=policy,
                                 donate=False, frozen_mask=mask),
                 create_train_state(model, opt, jax.random.key(0)))

    dp = run(make_train_step(model, opt, "CE", sched, policy=policy,
                             mesh=mesh, donate=False, frozen_mask=mask),
             create_train_state(model, opt, jax.random.key(0)))

    sz = create_train_state(model, opt, jax.random.key(0), zero_degree=8)
    tmpl = param_templates(sz.params)
    specs = zero3_state_specs(sz)
    sz = sz._replace(params=zero3_shard_params(sz.params, 8))
    z3 = run(make_train_step(model, opt, "CE", sched, policy=policy,
                             mesh=mesh, donate=False, state_specs=specs,
                             zero_degree=8, zero_stage=3,
                             zero3_templates=tmpl, frozen_mask=mask), sz)
    z3_full = zero3_unshard_params(jax.device_get(z3.params), tmpl)

    for other in (dp.params, z3_full):
        np.testing.assert_array_equal(np.asarray(other["conv"]["w"]),
                                      np.asarray(s0.params["conv"]["w"]))
        for a, b in zip(jax.tree_util.tree_leaves(single.params),
                        jax.tree_util.tree_leaves(other)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
