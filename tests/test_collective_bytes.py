"""Per-step collective traffic pinned from the compiled program.

A single chip can't measure multi-chip throughput, so the honest scaling
evidence (and the tripwire against a change silently inflating ICI
traffic) is the byte count of every collective in the optimized SPMD
program (utils/collectives.py). Invariants pinned here:

  * DP: ONE gradient all-reduce sized by the fp32 grads (+ small BN/metric
    reductions) — DDP-equivalent semantics, nothing extra;
  * ZeRO-1: the all-reduce is decomposed into reduce-scatter(P/N) +
    all-gather(P) — the same ring wire bytes;
  * ZeRO-3: IDENTICAL collective bytes to ZeRO-1 (the design claim: the
    post-update all-gather merely moves to the step's top);
  * TP adds Megatron activation psums on top of the gradient reduction.

docs/BENCH.md "Collective traffic per step" carries the bench-shape
numbers (scripts/probe_collectives.py) with the ICI-time model.
"""

import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step
from picklebot_tpu.utils.collectives import collective_stats, total_bytes

N_DEV = 8


def _param_bytes_f32(params):
    return sum(np.prod(np.asarray(p).shape) * 4
               for p in jax.tree_util.tree_leaves(params))


def _lower_step(model, mesh, *, zero_degree=0, zero_stage=1,
                state_specs=None, zero3_templates=None, accum=1, batch=8):
    opt = AdamW(weight_decay=5e-4)
    step = make_train_step(model, opt, "CE", cosine_annealing_lr(3e-4, 10),
                           policy=DtypePolicy.f32(), mesh=mesh, donate=False,
                           state_specs=state_specs, zero_degree=zero_degree,
                           zero_stage=zero_stage,
                           zero3_templates=zero3_templates)
    state = create_train_state(model, opt, 0, zero_degree=zero_degree)
    if zero_stage == 3:
        from picklebot_tpu.parallel.zero import zero3_shard_params
        state = state._replace(
            params=zero3_shard_params(state.params, zero_degree))
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                       np.asarray(a).dtype), state)
    feats = jax.ShapeDtypeStruct((accum, batch, 4, 32, 32, 3), np.uint8)
    labels = jax.ShapeDtypeStruct((accum, batch), np.int32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    compiled = step.lower(sds, feats, labels, key).compile()
    return collective_stats(compiled.as_text())


@pytest.fixture(scope="module")
def mesh():
    from picklebot_tpu.parallel.mesh import make_mesh
    devs = jax.devices()
    if len(devs) < N_DEV:
        pytest.skip(f"needs {N_DEV} devices")
    return make_mesh(data=N_DEV, model=1, devices=devs[:N_DEV])


@pytest.fixture(scope="module")
def small_model():
    from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D
    return MobileNetSmall3D(num_classes=13)


@pytest.mark.slow
def test_dp_zero1_zero3_collective_bytes(mesh, small_model):
    model = small_model
    pbytes = _param_bytes_f32(model.init(0)["params"])

    dp = _lower_step(model, mesh)
    # DP: one fused gradient all-reduce (fp32 grads) + BN-stat/metric
    # pmeans; anything past 10% over the grad bytes is new traffic
    ar = dp["all-reduce"]["bytes"]
    assert pbytes <= ar <= 1.10 * pbytes, (ar, pbytes)
    assert "all-gather" not in dp and "reduce-scatter" not in dp, dp

    from picklebot_tpu.parallel.zero import (param_templates,
                                             zero3_state_specs,
                                             zero_state_specs)
    opt = AdamW(weight_decay=5e-4)
    st = create_train_state(model, opt, 0, zero_degree=N_DEV)
    z1 = _lower_step(model, mesh, zero_degree=N_DEV,
                     state_specs=zero_state_specs(st))
    # ZeRO-1: the gradient all-reduce decomposes into reduce-scatter(P/N)
    # + all-gather(P); remaining all-reduces are the small BN/metric ones
    assert z1["all-gather"]["bytes"] >= pbytes * 0.99, z1
    assert z1["all-gather"]["bytes"] <= pbytes * 1.15, z1
    rs = z1["reduce-scatter"]["bytes"]
    assert pbytes / N_DEV * 0.9 <= rs <= pbytes / N_DEV * 1.3, (rs, pbytes)
    assert z1["all-reduce"]["bytes"] < 0.10 * pbytes, z1

    st3 = create_train_state(model, opt, 0, zero_degree=N_DEV)
    z3 = _lower_step(model, mesh, zero_degree=N_DEV, zero_stage=3,
                     state_specs=zero3_state_specs(st3),
                     zero3_templates=param_templates(st3.params))
    # the ZeRO-3 design claim: same per-step ICI bytes as stage 1
    assert abs(total_bytes(z3) - total_bytes(z1)) <= 0.02 * total_bytes(z1), \
        (z3, z1)


@pytest.mark.slow
def test_tp_adds_activation_psums(small_model):
    from picklebot_tpu.models.mobilevit import MobileViT
    from picklebot_tpu.parallel.mesh import (MOBILEVIT_TP_RULES, make_mesh,
                                             train_state_specs)
    devs = jax.devices()
    if len(devs) < N_DEV:
        pytest.skip(f"needs {N_DEV} devices")
    model = MobileViT(dims=[32, 32, 32],
                      channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],
                      num_classes=13, depths=(1, 1, 1),
                      attention_backend="xla", model_axis="model")
    pbytes = _param_bytes_f32(model.init(0)["params"])
    opt = AdamW(weight_decay=5e-4)

    mesh_tp = make_mesh(data=N_DEV // 2, model=2, devices=devs[:N_DEV])
    st = create_train_state(model, opt, 0, tp_rules=MOBILEVIT_TP_RULES,
                            tp_degree=2)
    specs = train_state_specs(st, MOBILEVIT_TP_RULES)
    step = make_train_step(model, opt, "CE", cosine_annealing_lr(3e-4, 10),
                           policy=DtypePolicy.f32(), mesh=mesh_tp,
                           donate=False, state_specs=specs)
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                       np.asarray(a).dtype), st)
    feats = jax.ShapeDtypeStruct((1, 8, 4, 32, 32, 3), np.uint8)
    labels = jax.ShapeDtypeStruct((1, 8), np.int32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    tp = collective_stats(
        step.lower(sds, feats, labels, key).compile().as_text())
    # Megatron f/g: forward+backward activation psums land ON TOP of the
    # (sharded-leaf-aware) gradient reduction
    assert tp["all-reduce"]["bytes"] > pbytes, (tp, pbytes)


def test_async_start_ops_normalized_to_result_bytes():
    """TPU lowerings spell collectives as async -start/-done pairs whose
    -start result is a tuple ALIASING the operand. Bytes must normalize
    to the RESULT (what the sync spelling reports), or all-gather /
    reduce-scatter bytes differ by a factor of N between the CPU HLO the
    tests parse and an on-chip HLO."""
    sync_hlo = """
      ag = f32[8,128]{1,0} all-gather(f32[1,128]{1,0} p0), dimensions={0}
      rs = f32[1,128]{1,0} reduce-scatter(f32[8,128]{1,0} p1), dimensions={0}
      ar = f32[4,128]{1,0} all-reduce(f32[4,128]{1,0} p2), to_apply=add
    """
    async_hlo = """
      ag = (f32[1,128]{1,0}, f32[8,128]{1,0}) all-gather-start(f32[1,128]{1,0} p0), dimensions={0}
      agd = f32[8,128]{1,0} all-gather-done(ag)
      rs = (f32[8,128]{1,0}, f32[1,128]{1,0}) reduce-scatter-start(f32[8,128]{1,0} p1), dimensions={0}
      rsd = f32[1,128]{1,0} reduce-scatter-done(rs)
      ar = (f32[4,128]{1,0}, f32[4,128]{1,0}) all-reduce-start(f32[4,128]{1,0} p2), to_apply=add
      ard = f32[4,128]{1,0} all-reduce-done(ar)
    """
    s = collective_stats(sync_hlo)
    a = collective_stats(async_hlo)
    for kind in ("all-gather", "reduce-scatter", "all-reduce"):
        assert a[kind]["count"] == s[kind]["count"] == 1, kind
        assert a[kind]["bytes"] == s[kind]["bytes"], kind
    assert s["all-gather"]["bytes"] == 8 * 128 * 4      # full result
    assert s["reduce-scatter"]["bytes"] == 1 * 128 * 4  # scattered chunk
