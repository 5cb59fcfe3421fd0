"""Activation rematerialization (``apply(..., remat=N)`` / config ``remat``).

Wrapping the first N levels of child-module calls in ``jax.checkpoint``
changes only the autodiff schedule (recompute activations in backward
instead of storing them); outputs, state updates, and gradients must be
identical to the plain apply. The reference has no equivalent capability —
on GPUs it would be torch.utils.checkpoint, never used there.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step


def _count_remat_eqns(jaxpr) -> int:
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name.startswith("remat"):
            n += 1
        for v in eqn.params.values():
            subs = v if isinstance(v, (list, tuple)) else [v]
            for s in subs:
                inner = getattr(s, "jaxpr", s)
                if hasattr(inner, "eqns"):
                    n += _count_remat_eqns(inner)
    return n


def _grads(model, variables, x, rng, remat):
    def loss(params):
        logits, new_state = model.apply(
            {"params": params, "state": variables["state"]}, x,
            train=True, rng=rng, policy=DtypePolicy.f32(), remat=remat)
        return jnp.sum(logits ** 2), (logits, new_state)

    (val, (logits, new_state)), grads = jax.jit(
        jax.value_and_grad(loss, has_aux=True))(variables["params"])
    return val, logits, new_state, grads


@pytest.mark.parametrize("depth", [1, 2])
def test_remat_grads_identical(rng, depth):
    """Same ops, re-run: loss/logits/BN updates/grads match the plain apply
    (f32, tight tolerance — remat reorders nothing, it only recomputes)."""
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D

    model = MobileNetSmall3D(num_classes=13)
    variables = model.init(0)
    x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), jnp.float32)
    key = jax.random.key(7)

    v0, l0, s0, g0 = _grads(model, variables, x, key, remat=0)
    for d in (depth,):
        v1, l1, s1, g1 = _grads(model, variables, x, key, remat=d)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s0),
                        jax.tree_util.tree_leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_remat_actually_engages(rng):
    """The jaxpr of a remat'd grad contains checkpoint regions; the plain
    one contains none (the knob is not a silent no-op)."""
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D

    model = MobileNetSmall3D(num_classes=13)
    variables = model.init(0)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)

    def loss(params, remat):
        logits, _ = model.apply(
            {"params": params, "state": variables["state"]}, x,
            train=True, rng=jax.random.key(0), policy=DtypePolicy.f32(),
            remat=remat)
        return jnp.sum(logits)

    plain = jax.make_jaxpr(
        jax.grad(lambda p: loss(p, 0)))(variables["params"]).jaxpr
    wrapped = jax.make_jaxpr(
        jax.grad(lambda p: loss(p, 1)))(variables["params"]).jaxpr
    assert _count_remat_eqns(plain) == 0
    assert _count_remat_eqns(wrapped) > 0


def test_remat_train_step_matches(rng):
    """make_train_step(remat=1) produces the identical TrainState and
    metrics as the plain step (dropout masks included: the rng threading
    is positional, so recompute draws the same keys)."""
    from tests.test_train_step import TinyNoBNNet, _data

    model = TinyNoBNNet()
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _data(rng, accum=2, batch=4)
    state = create_train_state(model, opt, jax.random.key(0))

    plain = make_train_step(model, opt, "CE", sched,
                            policy=DtypePolicy.f32(), donate=False)
    wrapped = make_train_step(model, opt, "CE", sched,
                              policy=DtypePolicy.f32(), donate=False,
                              remat=1)
    s1, m1 = plain(state, feats, labels, jax.random.key(3))
    s2, m2 = wrapped(state, feats, labels, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_remat_transformer_with_dropout_and_moe(rng):
    """MoE transformer under remat: aux-loss state channel flows through
    the checkpointed regions; dropout masks identical."""
    from tests.test_moe import TinyMoE, _data as _moe_data

    model = TinyMoE(dropout=0.3)
    opt = AdamW(weight_decay=1e-4)
    sched = cosine_annealing_lr(1e-3, 10)
    feats, labels = _moe_data(rng)
    state = create_train_state(model, opt, jax.random.key(0))

    plain = make_train_step(model, opt, "CE", sched,
                            policy=DtypePolicy.f32(), donate=False)
    wrapped = make_train_step(model, opt, "CE", sched,
                              policy=DtypePolicy.f32(), donate=False,
                              remat=2)
    s1, m1 = plain(state, feats, labels, jax.random.key(3))
    s2, m2 = wrapped(state, feats, labels, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-6, atol=1e-7)
    from picklebot_tpu.train.step import collect_aux_losses
    a1 = collect_aux_losses(s1.model_state)
    a2 = collect_aux_losses(s2.model_state)
    np.testing.assert_allclose(float(a1), float(a2), rtol=1e-6)
    # XLA fuses the recomputed forward differently, so a stray fma
    # contraction can move a param by ~1 ulp post-Adam (observed 1/8192
    # at 1.2e-7); this is codegen noise, not a schedule change
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=5e-7)


def test_config_remat_key():
    from picklebot_tpu.utils.config import Config

    assert Config(remat=True).validate().remat == 1
    assert Config().remat == 0
    with pytest.raises(ValueError, match="remat"):
        Config(remat=-1).validate()
