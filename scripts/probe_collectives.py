"""Per-step collective traffic per parallel layout (VERDICT r3 item 7).

Lowers the train step for each layout over the virtual 8-device CPU mesh
at bench-like (downscaled) shapes, parses the optimized SPMD program
(utils/collectives.py), and prints one table row per layout: collective
kind/count/bytes plus the ring-model wire bytes and the predicted ICI
time on v5e. Feeds docs/BENCH.md "Collective traffic per step";
tests/test_collective_bytes.py asserts the invariants so regressions
fail loudly.

Run: python scripts/probe_collectives.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")

import numpy as np  # noqa: E402

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr  # noqa: E402
from picklebot_tpu.train.step import (create_train_state,  # noqa: E402
                                      make_train_step)
from picklebot_tpu.utils.collectives import collective_stats  # noqa: E402

N = 8
# v5e: 2D torus, ~45 GB/s usable per direction per link axis; the ring
# all-reduce wire model below uses one axis (worst case)
ICI_GBPS = 45e9


def lower_stats(model, mesh, shape, state_kw=None, step_kw=None,
                accum=1, batch=8):
    opt = AdamW(weight_decay=5e-4)
    state = create_train_state(model, opt, 0, **(state_kw or {}))
    step_kw = dict(step_kw or {})
    if step_kw.pop("_zero3_shard", False):
        from picklebot_tpu.parallel.zero import zero3_shard_params
        state = state._replace(
            params=zero3_shard_params(state.params, N))
    step = make_train_step(model, opt, "CE", cosine_annealing_lr(3e-4, 10),
                           policy=DtypePolicy.f32(), mesh=mesh, donate=False,
                           **step_kw)
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                       np.asarray(a).dtype), state)
    feats = jax.ShapeDtypeStruct((accum, batch) + shape + (3,), np.uint8)
    labels = jax.ShapeDtypeStruct((accum, batch), np.int32)
    key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    return collective_stats(step.lower(sds, feats, labels, key)
                            .compile().as_text())


def wire_bytes(stats, n=N):
    """Ring-model per-chip wire bytes, result-relative.

    all-reduce: result P, wire 2(n-1)/n * P. all-gather / all-to-all:
    result P, wire (n-1)/n * P. reduce-scatter: result is the SCATTERED
    chunk P/n, and a ring RS moves (n-1) chunks of that size per chip —
    wire (n-1) * bytes (NOT (n-1)/n, which undercounts n×). Sanity
    anchor: RS(P/n) + AG(P) must equal the all-reduce they decompose
    ((n-1)/n*P + (n-1)/n*P = 2(n-1)/n*P). permute: 1 * P."""
    w = 0.0
    for kind, v in stats.items():
        if kind == "all-reduce":
            w += 2 * (n - 1) / n * v["bytes"]
        elif kind in ("all-gather", "all-to-all"):
            w += (n - 1) / n * v["bytes"]
        elif kind == "reduce-scatter":
            w += (n - 1) * v["bytes"]
        else:
            w += v["bytes"]
    return w


def row(name, stats):
    parts = [f"{k} x{v['count']} {v['bytes']/1e6:.2f}MB"
             for k, v in sorted(stats.items())]
    wb = wire_bytes(stats)
    print(f"{name:14s} | {'; '.join(parts):70s} | wire {wb/1e6:7.2f} MB "
          f"| ICI {wb/ICI_GBPS*1e3:6.3f} ms")


def main():
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    from picklebot_tpu.models.mobilevit import MobileViT
    from picklebot_tpu.parallel.mesh import (MOBILEVIT_MOE_EP_RULES,
                                             MOBILEVIT_TP_RULES, make_mesh,
                                             train_state_specs)
    from picklebot_tpu.parallel.zero import (param_templates,
                                             zero3_state_specs,
                                             zero_state_specs)

    devs = jax.devices()[:N]
    large = MobileNetLarge3D(num_classes=13, early_fold=True)
    mesh = make_mesh(data=N, model=1, devices=devs)
    shape = (8, 64, 64)   # downscaled bench clip (collective bytes are
    #                       grad-dominated for DP/ZeRO: shape-independent)

    row("DP8", lower_stats(large, mesh, shape))

    opt = AdamW(weight_decay=5e-4)
    st = create_train_state(large, opt, 0, zero_degree=N)
    row("DP8+ZeRO1", lower_stats(
        large, mesh, shape, state_kw=dict(zero_degree=N),
        step_kw=dict(zero_degree=N, state_specs=zero_state_specs(st))))
    st3 = create_train_state(large, opt, 0, zero_degree=N)
    row("DP8+ZeRO3", lower_stats(
        large, mesh, shape, state_kw=dict(zero_degree=N),
        step_kw=dict(zero_degree=N, zero_stage=3,
                     state_specs=zero3_state_specs(st3),
                     zero3_templates=param_templates(st3.params),
                     _zero3_shard=True)))

    vit_kw = dict(dims=[64, 80, 96],
                  channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320],
                  num_classes=13, attention_backend="xla")
    vit = MobileViT(model_axis="model", **vit_kw)
    mesh_tp = make_mesh(data=N // 2, model=2, devices=devs)
    stv = create_train_state(vit, opt, 0, tp_rules=MOBILEVIT_TP_RULES,
                             tp_degree=2)
    row("DP4xTP2", lower_stats(
        vit, mesh_tp, (4, 64, 64),
        state_kw=dict(tp_rules=MOBILEVIT_TP_RULES, tp_degree=2),
        step_kw=dict(state_specs=train_state_specs(stv,
                                                   MOBILEVIT_TP_RULES))))

    vit_sp = MobileViT(model_axis="model", sequence_axis="seq", **vit_kw)
    mesh_sp = make_mesh(data=N // 4, seq=2, model=2, devices=devs)
    stsp = create_train_state(vit_sp, opt, 0, tp_rules=MOBILEVIT_TP_RULES,
                              tp_degree=2)
    row("DP2xSP2xTP2", lower_stats(
        vit_sp, mesh_sp, (4, 64, 64),
        state_kw=dict(tp_rules=MOBILEVIT_TP_RULES, tp_degree=2),
        step_kw=dict(state_specs=train_state_specs(stsp,
                                                   MOBILEVIT_TP_RULES))))

    vit_ep = MobileViT(moe_experts=4, expert_axis="expert", **vit_kw)
    mesh_ep = make_mesh(data=N // 4, expert=4, devices=devs)
    step_ep = create_train_state(vit_ep, opt, 0,
                                 tp_rules=MOBILEVIT_MOE_EP_RULES,
                                 tp_degree=4)
    row("DP2xEP4", lower_stats(
        vit_ep, mesh_ep, (4, 64, 64),
        state_kw=dict(tp_rules=MOBILEVIT_MOE_EP_RULES, tp_degree=4),
        step_kw=dict(state_specs=train_state_specs(
            step_ep, MOBILEVIT_MOE_EP_RULES))))


if __name__ == "__main__":
    main()
