"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP layer (train.py:24-36, 203-204): instead of
a process group + gradient bucket all-reduce, we build a
``jax.sharding.Mesh`` over the slice and express data parallelism as sharded
array axes; the gradient all-reduce is a ``lax.pmean`` inside ``shard_map``
that XLA lowers to ICI collectives. Multi-host initialization goes through
``jax.distributed.initialize`` (torchrun-env equivalent) — on a TPU pod each
host sees only its local data shard, exactly like DistributedSampler
(train.py:59-60) but expressed by per-host slicing of the annotation CSV
(data/dataset.py shard arguments).

Axes:
  data   — batch parallelism (the only axis the reference capability needs)
  model  — tensor parallelism: Megatron-style FFN sharding of the MobileViT
           transformer (MOBILEVIT_TP_RULES + train_state_specs below)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, seq: int = 1,
              pipe: int = 1, expert: int = 1,
              devices: Optional[Sequence] = None,
              dcn_data: int = 1) -> Mesh:
    """Mesh over ('data', 'pipe', 'seq', 'expert', 'model'): batch
    parallelism, pipeline parallelism (GPipe ticks over the MobileViT
    transformer stacks, parallel/pipeline.py), sequence parallelism (ring
    attention, parallel/sequence.py), expert parallelism (MoE expert bank,
    ops/moe.py), tensor parallelism. 'seq'/'expert' sit innermost-adjacent
    to 'model' so the SP ring permutes, the EP output psum, and the TP
    psums all stay within one data replica's devices; 'pipe' sits outside
    them so a pipeline stage hop moves whole TP/SP/EP groups, keeping every
    per-tick collective on neighboring ICI links.

    ``dcn_data`` > 1 declares multi-slice (DCN-connected) topology: the
    'data' axis (still ONE logical axis of size ``data``; no step/collective
    code changes) is laid out slice-major so that its outer ``dcn_data``
    stride is the only thing crossing DCN — every pipe/seq/expert/model
    group, and the inner data stride, stays inside one slice's ICI. On real
    multi-slice TPU (devices carry ``slice_index``) the per-slice ordering
    comes from ``mesh_utils.create_hybrid_device_mesh`` (physical-topology-
    aware); elsewhere (virtual CPU devices, where enumeration is already
    process-major) a slice is a contiguous block of ``total/dcn_data``
    devices — the same ordering hybrid meshes produce there."""
    devices = list(devices if devices is not None else jax.devices())
    inner = model * seq * pipe * expert
    if data is None:
        data = len(devices) // inner
        if data < 1:
            # floor-division to 0 would build a zero-sized 'data' axis and
            # surface as a cryptic Mesh/shard_map error downstream
            raise ValueError(
                f"pipe={pipe} x seq={seq} x expert={expert} x model={model} "
                f"needs {inner} devices per data replica but only "
                f"{len(devices)} are available")
        if len(devices) % inner:
            print(f"[mesh] {len(devices) % inner} of {len(devices)} devices "
                  f"idle: inner degrees ({inner}) don't divide the device "
                  f"count, data axis rounded down to {data}")
    total = data * inner
    if total > len(devices):
        raise ValueError(
            f"mesh data={data} x pipe={pipe} x seq={seq} x expert={expert} "
            f"x model={model} needs {total} devices but only "
            f"{len(devices)} are available")
    axes = ("data", "pipe", "seq", "expert", "model")
    if dcn_data > 1:
        if data % dcn_data:
            raise ValueError(
                f"dcn_data={dcn_data} must divide the data axis ({data}): "
                "each slice carries an equal share of the batch")
        per = data // dcn_data
        chosen = devices[:total]
        slice_ids = {getattr(d, "slice_index", None) for d in chosen}
        if None not in slice_ids and len(slice_ids) == dcn_data:
            from jax.experimental import mesh_utils
            devs = mesh_utils.create_hybrid_device_mesh(
                (per, pipe, seq, expert, model),
                (dcn_data, 1, 1, 1, 1), devices=chosen)
        else:
            devs = np.array(chosen).reshape(
                dcn_data, per, pipe, seq, expert, model).reshape(
                data, pipe, seq, expert, model)
        return Mesh(devs, axes)
    devs = np.array(devices[:total]).reshape(data, pipe, seq, expert, model)
    return Mesh(devs, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "data"))  # (accum, batch, ...)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_specs(params, rules, default=P()):
    """Build a PartitionSpec pytree for a params tree by path pattern.

    rules: [(regex, PartitionSpec)] matched (fullmatch) against flat dotted
    paths like 'trunk.0.1.transformer.ffs.0.fc1.w'. First match wins.
    """
    import re

    from picklebot_tpu.core.module import flatten_dict, unflatten_dict
    flat = flatten_dict(params)
    out = {}
    for path in flat:
        spec = default
        for rx, s in rules:
            if re.fullmatch(rx, path):
                spec = s
                break
        out[path] = spec
    return unflatten_dict(out)


# Megatron-style tensor parallelism for the MobileViT transformer FFNs:
# fc1 column-sharded, fc2 row-sharded, partial outputs psum'd in the module
# (models/mobilevit.FeedForward(model_axis=...)).
MOBILEVIT_TP_RULES = [
    (r".*\.ffs\.\d+\.fc1\.w", P(None, "model")),
    (r".*\.ffs\.\d+\.fc2\.w", P("model", None)),
]

# Expert parallelism for the MoE variant (ops/moe.MoEFeedForward,
# MobileViT(moe_experts=..., expert_axis='expert')): the stacked expert
# weights shard over 'expert'; the router stays replicated (its psum-bwd
# gradient sync happens inside the module).
MOBILEVIT_MOE_EP_RULES = [
    (r".*\.ffs\.\d+\.w1", P("expert", None, None)),
    (r".*\.ffs\.\d+\.w2", P("expert", None, None)),
]


def model_shard_counts(params, rules, degree: int):
    """Pytree of ints: how many shards each param splits into under its
    matched rule (any mesh axis — 'model' for TP, 'expert' for EP) — feed
    to ``AdamW8bit.init(params, model_shards=...)`` so its blockwise state
    is laid out per local shard."""
    def n_shards(spec):
        for axis in spec:
            axes = axis if isinstance(axis, tuple) else (axis,)
            if any(a is not None for a in axes):
                return degree
        return 1
    return jax.tree_util.tree_map(n_shards, param_specs(params, rules),
                                  is_leaf=lambda x: isinstance(x, P))


def train_state_specs(state, rules):
    """Spec pytree matching a TrainState: params by rules, BN state and
    schedule replicated, optimizer moments mirroring the param specs.

    8-bit moments (AdamW8bit) of TP-sharded params are supported when the
    state was initialized with matching ``model_shards``: their
    (shards*blocks_local, BLOCK) q/s arrays shard as P('model', None), so
    each model shard quantizes exactly its own parameter slice inside
    shard_map.
    """
    p_specs = param_specs(state.params, rules)

    def is_q8(x):
        return isinstance(x, dict) and set(x) == {"q", "s"}

    def moment_spec(p_spec, leaf):
        if not is_q8(leaf):
            return p_spec
        axes = sorted({a for ax in p_spec
                       for a in (ax if isinstance(ax, tuple) else (ax,))
                       if a is not None})
        if len(axes) > 1:
            raise ValueError(
                f"8-bit optimizer moments of a param sharded over {axes} "
                "are not supported — the per-shard quantized layout "
                "handles one mesh axis; raise min_8bit_size past this "
                "param's size")
        q8 = P(axes[0], None) if axes else P()
        return {"q": q8, "s": q8}

    def moments(tree):
        return jax.tree_util.tree_map(
            moment_spec, p_specs, tree,
            is_leaf=lambda x: isinstance(x, P))

    opt_specs = {"step": P(), "m": moments(state.opt_state["m"]),
                 "v": moments(state.opt_state["v"])}
    model_state_specs = jax.tree_util.tree_map(lambda _: P(),
                                               state.model_state)
    # EMA params (when enabled) shard exactly like the params they track
    ema_specs = p_specs if state.ema_params is not None else None
    return type(state)(params=p_specs, model_state=model_state_specs,
                       opt_state=opt_specs, epoch=P(), ema_params=ema_specs)


def init_multihost(coordinator: Optional[str] = None):
    """Multi-host rendezvous (the jax.distributed analog of
    dist.init_process_group, reference train.py:35). No-op single-host.

    Deliberately does NOT call jax.process_count() to decide: that
    instantiates the XLA backends, after which jax.distributed.initialize
    raises ("must be called before backends are initialized") — the old
    `process_count() > 1 or coordinator` order made this entry point
    unusable with an explicit coordinator address. Without a coordinator,
    initialize only when the standard env rendezvous variables are set
    (TPU pod / GKE auto-config)."""
    import os
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)
    elif (os.environ.get("JAX_COORDINATOR_ADDRESS")
          or os.environ.get("COORDINATOR_ADDRESS")):
        jax.distributed.initialize()
