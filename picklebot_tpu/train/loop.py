"""The training runtime: ``train(config)`` (reference train.py:186-343).

Epoch loop with: per-epoch shuffling (set_epoch), grad-accumulation
super-batches through the jitted sharded train step, per-microbatch
TensorBoard scalars with the reference's tag names, periodic eval +
checkpoint, Ctrl-C graceful finish with a final save, and windowed-average
statistics artifacts (statistics/*.npy like the reference's committed run).

TPU-first differences from the reference, all documented:
  * the whole effective batch is one jitted call (scan over microbatches)
    instead of a Python loop with .backward() per batch — no .item() syncs
    in the hot loop (the reference lost 87 s of 1150 s to those);
  * data parallelism is a sharded mesh dimension, not DDP process groups;
  * checkpoints are Orbax (params + optimizer + BN state + epoch), so resume
    actually resumes (the reference restarts schedule/optimizer);
    ``config.checkpoint`` may also point at a torch ``.pth`` for weights-only
    warm starts (converted on the fly);
  * eval metrics are aggregated across all replicas (the reference logs
    rank 0's shard only).
"""

from __future__ import annotations

import dataclasses
import math
import os
import signal
import threading
import time
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.data.dataset import ClipDataset
from picklebot_tpu.data.loader import DataLoader, accumulate_batches, device_prefetch
from picklebot_tpu.models.registry import initialize_model
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train import checkpoint as ckpt
from picklebot_tpu.train.key_maps import key_map_for
from picklebot_tpu.train.metrics import SummaryWriter, windowed_average
from picklebot_tpu.train.optim import OPTIMIZERS, cosine_annealing_lr
from picklebot_tpu.train.step import (TrainState, create_train_state,
                                      make_eval_step, make_train_step)
from picklebot_tpu.utils.config import Config


def _make_datasets(config: Config):
    shard, num_shards = jax.process_index(), jax.process_count()
    syn_classes = config.resolved_synthetic_classes()
    kwargs = dict(backend=config.data_backend, shard=shard,
                  num_shards=num_shards,
                  synthetic_shape=config.synthetic_shape,
                  synthetic_len=config.synthetic_len,
                  sample_fps=config.sample_fps,
                  skip_bad_clips=config.skip_bad_clips,
                  synthetic_classes=syn_classes)
    if (config.criterion == "CE"
            and config.data_backend.startswith("synthetic")
            and syn_classes > config.num_classes):
        # validate() enforces this for load_config() configs, but a Config
        # built programmatically never runs validate() — re-check here so
        # the synthetic path can't reach CE's silent OOB NaN-fill either.
        raise ValueError(
            f"synthetic_classes={syn_classes} > "
            f"num_classes={config.num_classes}: labels outside the logit "
            "range hit CE's out-of-bounds NaN-fill gather and train loss "
            "goes silently NaN — lower synthetic_classes (fewer classes "
            "than logits is fine)")
    if (config.criterion == "BCE"
            and config.data_backend.startswith("synthetic")
            and syn_classes > 2):
        # same re-check as validate(): BCE targets are binary — integer
        # labels > 1 make the loss silently meaningless
        raise ValueError(
            f"synthetic_classes={syn_classes} with criterion='BCE': BCE "
            "targets are binary probabilities; use synthetic_classes <= 2")
    if config.criterion == "CE" and not config.data_backend.startswith(
            "synthetic"):
        # A label >= num_classes hits CE's out-of-bounds NaN-fill gather
        # and train loss goes silently NaN; a NEGATIVE label wraps in
        # jnp.take_along_axis (label -1 trains against class C-1) — equally
        # silent. Fail loudly at startup, and scan the FULL annotation file
        # BEFORE per-host sharding: post-shard only the process holding the
        # bad label would raise while its peers proceed to the compile
        # barrier and hang until timeout. (Synthetic labels are bounded by
        # the synthetic_classes <= num_classes check above.)
        from picklebot_tpu.data.dataset import read_annotations
        for name, path in (("train", config.train_annotations_file),
                           ("val", config.val_annotations_file)):
            _, labels = read_annotations(path)
            labels = np.asarray(labels)
            if labels.size and (labels.max() >= config.num_classes
                                or labels.min() < 0):
                bad = (labels.max() if labels.max() >= config.num_classes
                       else labels.min())
                raise ValueError(
                    f"{name} annotations contain label {bad} but "
                    f"num_classes={config.num_classes} (labels must be in "
                    f"[0, num_classes) for CE)")
    train_ds = ClipDataset(config.train_annotations_file, config.video_paths,
                           **kwargs)
    val_ds = ClipDataset(config.val_annotations_file, config.video_paths,
                         **kwargs)
    return train_ds, val_ds


def train(config: Config, max_steps: Optional[int] = None) -> dict:
    """Returns a summary dict (final losses/accuracies) for tests/CLI."""
    if config.model_name == "MobileViTV2":
        # image classifier (reference mobilevitv2.py:266-305, never
        # registered for training there either, train.py:156-161): the
        # train/eval STEP supports it with (accum, B, H, W, C) batches
        # (bench.py measures exactly that), but this loop's data pipeline
        # assembles video clips — fail actionably instead of with a conv
        # rank error deep in the forward.
        raise ValueError(
            "MobileViTV2 is an image classifier; the clip training loop "
            "cannot feed it. Use the step API with image batches "
            "(train.step.make_train_step; see bench.py --model "
            "MobileViTV2) or the serve/export surfaces.")
    # global device count: in a multi-process run the mesh must span every
    # host's devices (the DDP world, reference train.py:24-36), not just the
    # first host's local ones
    n_dev = jax.device_count()
    n_procs = jax.process_count()
    mp = max(1, config.model_parallel)
    sp = max(1, config.sequence_parallel)
    pp = max(1, config.pipeline_parallel)
    ep = max(1, config.expert_parallel)
    mps = mp * sp * pp * ep
    n_data = config.data_parallel or max(1, n_dev // mps)
    n_data = max(1, min(n_data, n_dev // mps if mps > 1 else n_dev))
    mesh = make_mesh(data=n_data, model=mp, seq=sp, pipe=pp, expert=ep,
                     dcn_data=config.dcn_data_parallel) \
        if (n_data > 1 or mps > 1) else None
    if n_procs > 1:
        if mesh is None:
            raise ValueError("multi-process training requires a device mesh")
        # DP x TP: the mesh is laid out data-major (parallel/mesh.py), so a
        # host's devices span whole data rows when its device count divides
        # by mp — each host then owns an integral slice of the data axis and
        # per-host batch assembly (make_array_from_process_local_data) works
        # unchanged. state placement honors state_specs in place() below.
        if mps > 1 and (jax.local_device_count() % mps != 0):
            raise ValueError(
                f"model_parallel={mp} x sequence_parallel={sp} x "
                f"pipeline_parallel={pp} x expert_parallel={ep} must divide "
                f"the per-host device count ({jax.local_device_count()}) so "
                f"TP/SP/PP/EP groups stay host-local")
        if n_data % n_procs != 0:
            raise ValueError(f"data_parallel={n_data} must divide evenly "
                             f"across {n_procs} processes")
    policy = DtypePolicy.bf16() if config.use_autocast else DtypePolicy.f32()

    if config.autotune:
        # measurement-driven plan selection (the cudnn.benchmark analog,
        # utils/autotune.py): one compile per candidate the first time,
        # cache hits afterwards. varying_input_size skips it (reference
        # semantics, train.py:193-194).
        from picklebot_tpu.utils.autotune import autotune_config
        config = autotune_config(config, mode="train")

    model = initialize_model(config)
    optimizer = OPTIMIZERS[config.optimizer](
        weight_decay=config.weight_decay)
    schedule = cosine_annealing_lr(config.learning_rate, config.max_iters,
                                   warmup=config.warmup_epochs)

    state_specs = None
    zero_degree = 0
    zero_stage = 1
    zero3_tmpl = None
    if config.zero_sharding and mesh is not None and n_data > 1:
        # ZeRO-DP (parallel/zero.py): optimizer moments live 1/n_data per
        # rank; validate() already rejected TP/SP/PP/EP combinations.
        # Stage 3 (zero_sharding: 3) also shards the params at rest.
        zero_degree = n_data
        zero_stage = 3 if int(config.zero_sharding) == 3 else 1
    if mp > 1 or ep > 1:
        # TP shards the dense transformer FFNs over 'model'; EP shards the
        # MoE expert banks over 'expert' (config forbids combining them).
        # Optimizer moments (8-bit: per-local-shard quantized blocks)
        # mirror the param sharding either way.
        from picklebot_tpu.parallel.mesh import (MOBILEVIT_MOE_EP_RULES,
                                                 MOBILEVIT_TP_RULES,
                                                 train_state_specs)
        rules, degree = ((MOBILEVIT_TP_RULES, mp) if mp > 1
                         else (MOBILEVIT_MOE_EP_RULES, ep))
        state = create_train_state(model, optimizer, config.seed,
                                   tp_rules=rules, tp_degree=degree,
                                   ema=config.ema_decay > 0)
        state_specs = train_state_specs(state, rules)
    elif zero_degree > 1:
        from picklebot_tpu.parallel.zero import (param_templates,
                                                 zero3_state_specs,
                                                 zero_state_specs)
        state = create_train_state(model, optimizer, config.seed,
                                   zero_degree=zero_degree,
                                   ema=config.ema_decay > 0)
        if zero_stage == 3:
            # specs are structural (leaf -> leaf), so the full-param state
            # yields the same pytree as the chunked one; the params stay
            # FULL through restore/EMA seeding and are chunked just before
            # placement (zero3_shard_params below)
            zero3_tmpl = param_templates(state.params)
            state_specs = zero3_state_specs(state)
        else:
            state_specs = zero_state_specs(state)
    else:
        state = create_train_state(model, optimizer, config.seed,
                                   ema=config.ema_decay > 0)

    frozen_mask = None
    if config.freeze_params:
        # fine-tuning: build the per-leaf mask from the FULL param tree
        # (state.params is still unchunked here even under ZeRO-3 — the
        # rank stacks share its treedef, so the mask applies to both)
        from picklebot_tpu.train.freeze import freeze_mask, frozen_summary
        frozen_mask = freeze_mask(state.params, config.freeze_params)
        if jax.process_index() == 0:
            fl, tl_, fn, tn = frozen_summary(state.params, frozen_mask)
            print(f"Freezing {fl}/{tl_} param leaves "
                  f"({fn:,}/{tn:,} params) via {config.freeze_params}")

    mean = config.mean if config.apply_mean_std else None
    std = config.std if config.apply_mean_std else None
    from picklebot_tpu.data.augment import Augment
    augment = Augment(flip=config.augment_flip, crop=config.augment_crop,
                      brightness=config.augment_brightness)
    train_step = make_train_step(model, optimizer, config.criterion,
                                 schedule, policy=policy, mesh=mesh,
                                 mean=mean, std=std, state_specs=state_specs,
                                 moe_aux_weight=config.moe_aux_weight,
                                 zero_degree=zero_degree,
                                 zero_stage=zero_stage,
                                 zero3_templates=zero3_tmpl,
                                 max_grad_norm=config.max_grad_norm,
                                 remat=int(config.remat),
                                 ema_decay=config.ema_decay,
                                 augment=augment,
                                 label_smoothing=config.label_smoothing,
                                 frozen_mask=frozen_mask,
                                 input_size=config.input_size)
    eval_step = make_eval_step(model, config.criterion, policy=policy,
                               mesh=mesh, mean=mean, std=std,
                               state_specs=state_specs,
                               zero3_templates=zero3_tmpl,
                               input_size=config.input_size)

    def _multihost_synced(fn, tag):
        """Multi-host compile rendezvous: AOT-compile each new input shape,
        then wait at the coordination-service barrier (pure RPC, generous
        timeout) before the first execution. Without it, a host that hits
        the persistent compile cache starts executing — and its collective's
        Gloo context init times out at 30 s — while a cold host is still
        compiling the same program (minutes on these hosts)."""
        if n_procs == 1:
            return fn
        from jax._src import distributed
        cache = {}

        def call(*args):
            key = tuple((tuple(a.shape), str(a.dtype))
                        for a in jax.tree_util.tree_leaves(args))
            if key not in cache:
                compiled = fn.lower(*args).compile()
                client = distributed.global_state.client
                if client is not None:
                    client.wait_at_barrier(f"pb_compiled_{tag}_{len(cache)}",
                                           timeout_in_ms=1_800_000)
                cache[key] = compiled
            return cache[key](*args)
        return call

    train_step = _multihost_synced(train_step, "train")
    eval_step = _multihost_synced(eval_step, "eval")

    # ---- checkpoint restore (orbax) / torch warm start (.pth) ----
    start_epoch = 0
    resume_skip = 0        # optimizer steps already done in start_epoch
    resume_global_step = 0  # TB global_step continuity across resumes
    # early-stop / best-checkpoint state restored from the snapshot (so an
    # interrupted+resumed run tracks best/patience exactly like an
    # uninterrupted one — without this, the first post-resume eval always
    # "improves" and save_best can overwrite the true best with worse weights)
    resume_best = float("inf")
    resume_baseline = float("inf")
    resume_evals = 0
    if config.auto_resume and (not config.checkpoint or config.warm_start):
        # preemption recovery: pick up the newest periodic snapshot (the
        # reference has no resume at all — its start_epoch is assigned the
        # checkpoint *path*, train.py:234). A warm-start run's own
        # snapshots outrank the configured warm-start checkpoint: after
        # preemption the fine-tune must RESUME itself, not restart from
        # the donor weights.
        latest = ckpt.latest_checkpoint(
            os.path.join(config.checkpoint_dir, config.model_name))
        if latest:
            print(f"auto_resume: found {latest}")
            config = dataclasses.replace(config, checkpoint=latest,
                                         warm_start=False)
    if config.checkpoint:
        print(f"Loading checkpoint {config.checkpoint}...")
        if config.checkpoint.endswith(".pth"):
            variables = {"params": state.params, "state": state.model_state}
            pth_stats: dict = {}
            variables = ckpt.load_pth(config.checkpoint, variables,
                                      key_map=key_map_for(config.model_name),
                                      strict=not config.warm_start_partial,
                                      partial=config.warm_start_partial,
                                      stats=pth_stats)
            if (config.warm_start_partial
                    and pth_stats.get("grafted_params", 0) == 0):
                # a wrong/foreign .pth donor under strict=False would
                # otherwise graft ZERO leaves and train silently from
                # fresh init — mirror the Orbax zero-matches guard
                raise ValueError(
                    "warm_start_partial: NO donor param leaf matched the "
                    f"fresh {config.model_name} — wrong donor .pth? First "
                    f"unused keys: {pth_stats.get('unused', [])[:5]}")
            state = state._replace(
                params=variables["params"],
                model_state=variables["state"],
                ema_params=(jax.tree_util.tree_map(
                    np.copy, variables["params"])
                    if state.ema_params is not None else None))
        else:
            if config.warm_start:
                # fine-tune donor: only weights + BN stats are taken, so
                # restore RAW (no target) — ANY donor layout/optimizer
                # loads (its opt state is discarded), including a
                # different-head donor under warm_start_partial where a
                # target-shaped restore would reject the mismatched leaf
                payload = ckpt.restore_checkpoint(config.checkpoint)
            elif mp == 1 and ep == 1:
                # layout-aware restore: a ZeRO checkpoint can resume at a
                # different DP degree (or with zero_sharding toggled) —
                # restore raw, detect the saved layout, reshard host-side
                # (parallel/zero.py; fp32 exact, 8-bit requantizes)
                from picklebot_tpu.parallel.zero import (zero_degree_of,
                                                         zero_reshard)
                payload = ckpt.restore_checkpoint(config.checkpoint)
                n_want = zero_degree if zero_degree > 1 else 0
                n_saved = zero_degree_of(payload["params"],
                                         payload["opt_state"])
                if n_saved != n_want:
                    print(f"Resharding optimizer state: ZeRO degree "
                          f"{n_saved} -> {n_want}")
                    payload["opt_state"] = zero_reshard(
                        optimizer, payload["params"], payload["opt_state"],
                        n_want, n_old=n_saved)
            else:
                # target-based restore (TP/EP layouts): older snapshots may
                # lack the loop_state / ema_params extensions — retry with
                # progressively reduced targets; what's absent is re-seeded
                # below (ema) or defaults to position zero (loop_state)
                target = dict(state._asdict())
                target["loop_state"] = np.zeros((2,), np.int64)
                target["early_stop"] = np.zeros((3,), np.float64)
                no_es = {k: v for k, v in target.items()
                         if k != "early_stop"}
                attempts = [target, no_es,
                            {k: v for k, v in no_es.items()
                             if k != "loop_state"}]
                if target.get("ema_params") is not None:
                    for base_t in list(attempts):
                        t = dict(base_t)
                        t["ema_params"] = None
                        attempts.append(t)
                payload = None
                for i, t in enumerate(attempts):
                    try:
                        payload = ckpt.restore_checkpoint(config.checkpoint,
                                                          t)
                        break
                    except Exception:
                        if i == len(attempts) - 1:
                            raise
            loop_state = payload.pop("loop_state", None)
            early_stop = payload.pop("early_stop", None)
            payload.setdefault("ema_params", None)
            if config.warm_start:
                # fine-tune entry: weights + BN stats ONLY — the optimizer,
                # epoch counter, TB step and early-stop/best state start
                # fresh. Inheriting a converged donor's best_val_loss /
                # patience would mean save_best never fires and early
                # stopping kills the fine-tune while it is improving.
                donor_params = payload["params"]
                donor_mstate = payload["model_state"]
                if config.warm_start_partial:
                    # transfer learning: graft only shape-matching leaves
                    # (a head at a different num_classes keeps its fresh
                    # init); loud about every leaf that did not transfer
                    donor_params, got_p, skip_p = ckpt.graft_matching(
                        donor_params, state.params)
                    donor_mstate, _, skip_s = ckpt.graft_matching(
                        donor_mstate, state.model_state)
                    if not got_p:
                        raise ValueError(
                            "warm_start_partial: NO donor param leaf "
                            f"matched the fresh {config.model_name} — "
                            "wrong donor checkpoint? First donor paths: "
                            f"{[p for p, _ in skip_p[:5]]}")
                    if jax.process_index() == 0:
                        for path, why in skip_p + skip_s:
                            print(f"warm_start_partial: kept fresh "
                                  f"{path} ({why})")
                        print(f"warm_start_partial: grafted {len(got_p)} "
                              f"param leaves; {len(skip_p) + len(skip_s)} "
                              "kept fresh init")
                state = state._replace(
                    params=donor_params,
                    model_state=donor_mstate,
                    ema_params=(jax.tree_util.tree_map(
                        np.copy, donor_params)
                        if state.ema_params is not None else None))
                print("warm_start: loaded weights + BN stats; optimizer, "
                      "epoch and early-stop state start fresh")
            else:
                state = TrainState(**payload)
                start_epoch = int(state.epoch)
                if loop_state is not None:
                    resume_global_step = int(np.asarray(loop_state)[0])
                    resume_skip = int(np.asarray(loop_state)[1])
                if early_stop is not None:
                    es = np.asarray(early_stop, np.float64)
                    resume_best = float(es[0])
                    resume_baseline = float(es[1])
                    resume_evals = int(es[2])
        if resume_skip:
            print(f"Loaded checkpoint at epoch {start_epoch}, "
                  f"optimizer step {resume_skip} within the epoch")
        else:
            print(f"Loaded checkpoint at epoch {start_epoch}")
    # EMA stream vs config: seed it from the (possibly restored) params when
    # newly enabled; drop it when disabled (keeps the state structure exactly
    # what state_specs/shard_map expect for this run)
    if config.ema_decay > 0 and state.ema_params is None:
        state = state._replace(ema_params=jax.tree_util.tree_map(
            np.copy, jax.device_get(state.params)))
    elif config.ema_decay == 0 and state.ema_params is not None:
        state = state._replace(ema_params=None)

    if zero_stage == 3:
        # ZeRO-3: params (and EMA) become (n, chunk) rank stacks — restore
        # and EMA seeding above ran on the full leaves, and checkpoints
        # always store full leaves (host_state unshards), so snapshots are
        # stage- and degree-independent
        from picklebot_tpu.parallel.zero import zero3_shard_params
        state = state._replace(
            params=zero3_shard_params(jax.device_get(state.params),
                                      zero_degree),
            ema_params=(zero3_shard_params(
                jax.device_get(state.ema_params), zero_degree)
                if state.ema_params is not None else None))

    # ---- placement ----
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        super_sharding = NamedSharding(mesh, P(None, "data"))
        eval_sharding = NamedSharding(mesh, P("data"))

        def place(tree, spec_tree):
            shardings = jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), spec_tree,
                is_leaf=lambda x: isinstance(x, P))
            if n_procs == 1:
                return jax.device_put(tree, shardings)
            # multi-host: every host holds the full host-side-init value;
            # hand each device exactly its shard (works for any sharding)
            def put_leaf(x, sh):
                x = np.asarray(x)
                return jax.make_array_from_callback(
                    x.shape, sh, lambda idx: x[idx])
            if isinstance(shardings, NamedSharding):
                shardings = jax.tree_util.tree_map(lambda _: shardings, tree)
            return jax.tree_util.tree_map(put_leaf, tree, shardings)

        if state_specs is not None:  # TP: honor per-leaf param shardings
            state = place(state, state_specs)
        else:
            state = place(state, P())
    else:
        super_sharding = eval_sharding = None

    # ---- data ----
    train_ds, val_ds = _make_datasets(config)
    global_batch = config.batch_size * (n_data if mesh is not None else 1)
    # each host loads only its share of the global batch (its ClipDataset
    # shard, the DistributedSampler analog — reference train.py:59-60)
    local_batch = global_batch // n_procs
    accum = config.grad_accum_steps
    # multi-host: all hosts must agree on T without communicating, so pad
    # every batch to exactly max_frames (bucket == cap -> one static shape)
    t_bucket = config.max_frames if n_procs > 1 else config.t_bucket
    train_loader = DataLoader(train_ds, local_batch, shuffle=True,
                              num_workers=config.num_workers,
                              t_bucket=t_bucket,
                              max_frames=config.max_frames,
                              seed=config.seed, drop_last=True,
                              temporal_jitter=config.temporal_jitter)
    # drop_last=False: the reference's estimate_loss consumes the FULL val
    # set (train.py:134-150); the tail batch is padded to local_batch and
    # masked inside eval_step so every sample counts exactly once.
    val_loader = DataLoader(val_ds, local_batch, shuffle=False,
                            num_workers=config.num_workers,
                            t_bucket=t_bucket,
                            max_frames=config.max_frames, drop_last=False)
    # hosts' shard sizes can differ by one batch; agree on counts once so no
    # host leaves a collective early (train: min, eval: max + dummy batches)
    if n_procs > 1:
        from jax.experimental import multihost_utils
        counts = multihost_utils.process_allgather(
            np.asarray([len(train_loader), len(val_loader)]))
        nb_train_sync = int(np.min(counts[..., 0]))
        nb_val_sync = int(np.max(counts[..., 1]))
    else:
        nb_train_sync = nb_val_sync = None
    print(f"Using {accum} gradient accumulation steps for a total effective "
          f"batch size of {config.effective_batch_size}")

    # ---- logging ----
    is_main = jax.process_index() == 0
    writer = SummaryWriter(os.path.join(config.log_dir, config.run_name())) \
        if is_main else None
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    start_time = time.time()
    print(f"Training... started: {time.ctime(start_time)}")

    def put_global(arr, sharding):
        """Host-local (…, local_batch, …) -> global (…, global_batch, …)."""
        if n_procs == 1:
            return jax.device_put(arr, sharding)
        gshape = list(arr.shape)
        axis = 1 if len(sharding.spec) > 1 else 0
        gshape[axis] = arr.shape[axis] * n_procs
        return jax.make_array_from_process_local_data(
            sharding, arr, tuple(gshape))

    def put_super(batch):
        feats, labels = batch  # (accum, local_batch, T, H, W, C)
        if super_sharding is not None:
            return (put_global(feats, super_sharding),
                    put_global(labels, super_sharding))
        return jax.device_put((feats, labels))

    # per-step rng is POSITION-keyed — fold_in(key(seed), global_step) — on
    # every path, so a mid-epoch resume (checkpoint_every_steps) replays the
    # exact dropout stream an uninterrupted run would have used
    if n_procs > 1:
        # a host-local key can't be device_put to a global sharding; build
        # the key on-device from the (identical) seed and fold in the step
        from jax.experimental import multihost_utils
        seed_g = multihost_utils.host_local_array_to_global_array(
            np.asarray(config.seed, np.int32), mesh, P())
        base_key = jax.jit(jax.random.key, out_shardings=replicated)(seed_g)
        fold_key = jax.jit(jax.random.fold_in, out_shardings=replicated)
    elif mesh is not None:
        base_key = jax.device_put(jax.random.key(config.seed), replicated)
        fold_key = jax.jit(jax.random.fold_in, out_shardings=replicated)
    else:
        base_key = jax.random.key(config.seed)
        fold_key = jax.jit(jax.random.fold_in)
    global_step = resume_global_step
    steps_this_run = 0
    supers_in_epoch = 0  # optimizer steps into the CURRENT epoch (the
    #                      mid-epoch position every snapshot records)
    train_losses_hist, train_acc_hist = [], []
    all_losses: list = []
    val_losses, val_percent = [], []
    # best-checkpoint / early-stop tracking (config save_best /
    # early_stop_patience). val_loss is globally reduced in eval, so every
    # host sees the identical value and takes the identical branch — the
    # collective best-save and the loop break stay in lockstep multi-host.
    # Two baselines on purpose (Keras EarlyStopping semantics):
    # best_val_loss moves on ANY improvement and gates save_best;
    # patience_baseline moves only on improvements > min_delta, so a run of
    # steady sub-min_delta improvements still exhausts patience.
    # All three persist in checkpoints as the "early_stop" array.
    best_val_loss = resume_best
    patience_baseline = resume_baseline
    evals_since_improve = resume_evals
    stopped_early = False
    summary = {}

    def early_stop_state():
        """The checkpointed best/patience triple (float64 so inf survives)."""
        return np.asarray(
            [best_val_loss, patience_baseline, evals_since_improve],
            np.float64)

    def host_state(st):
        """TrainState -> host numpy for checkpointing. Under multi-host
        ZeRO the optimizer slices span processes (no host can address the
        full array), so replicate through a jitted identity first — a
        collective every process enters (save_checkpoint is itself
        process-collective, so the call order matches). ZeRO-3 rank-stacked
        params/EMA are unsharded back to full leaves so the snapshot format
        never depends on the run's stage or degree."""
        if n_procs > 1 and any(
                isinstance(x, jax.Array) and not x.is_fully_addressable
                for x in jax.tree_util.tree_leaves(st)):
            st = jax.jit(lambda s: s,
                         out_shardings=NamedSharding(mesh, P()))(st)
        st = jax.device_get(st)
        if zero_stage == 3:
            from picklebot_tpu.parallel.zero import zero3_unshard_params
            st = st._replace(
                params=zero3_unshard_params(st.params, zero3_tmpl),
                ema_params=(zero3_unshard_params(st.ema_params, zero3_tmpl)
                            if st.ema_params is not None else None))
        return st

    def pad_val_batch(feats, labels):
        """Pad a partial tail batch up to local_batch, return a 0/1 mask.
        Static batch shape keeps one compiled eval program per T bucket."""
        n = feats.shape[0]
        mask = np.ones((local_batch,), np.float32)
        if n < local_batch:
            pad = local_batch - n
            feats = np.concatenate(
                [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
            labels = np.concatenate(
                [labels, np.zeros((pad,) + labels.shape[1:], labels.dtype)])
            mask[n:] = 0.0
        return feats, labels, mask

    def run_eval():
        # EMA evaluation (config.ema_decay > 0): score the averaged weights
        # — the ones serving would use. Swapping params for ema_params keeps
        # the state's tree structure (and TP shardings: EMA leaves shard
        # exactly like their params) so the same compiled eval program runs.
        # BN statistics stay the live running stats (params-only EMA).
        st = state if state.ema_params is None \
            else state._replace(params=state.ema_params)
        tot_loss_sum, tot_correct, tot_n = 0.0, 0.0, 0.0
        tot_conf = None
        print("Evaluating...")
        batches = 0
        dummy_shape = None
        for feats, labels in iter(val_loader):
            feats, labels, mask = pad_val_batch(feats, labels)
            # only the shapes — building np.zeros_like(feats) every batch
            # allocated (and discarded) a full batch-sized host array
            dummy_shape = ((feats.shape, feats.dtype),
                           (labels.shape, labels.dtype))
            if eval_sharding is not None:
                feats, labels, mask = (
                    put_global(a, eval_sharding)
                    for a in (feats, labels, mask))
            out = eval_step(st, feats, labels, mask)
            tot_loss_sum += float(out["loss_sum"])
            tot_correct += float(out["correct"])
            tot_n += float(out["samples"])
            conf = np.asarray(out["confusion"], np.float64)
            tot_conf = conf if tot_conf is None else tot_conf + conf
            batches += 1
        # multi-host: hosts with smaller val shards feed fully-masked dummy
        # batches so every host joins the same number of collectives
        if (nb_val_sync is not None and batches < nb_val_sync
                and dummy_shape is None):
            raise RuntimeError(
                "this host's val shard is empty while another host has "
                "batches to evaluate; give every host at least one sample")
        while nb_val_sync is not None and batches < nb_val_sync:
            (f_shape, f_dtype), (l_shape, l_dtype) = dummy_shape
            feats = np.zeros(f_shape, f_dtype)
            labels = np.zeros(l_shape, l_dtype)
            mask = np.zeros((local_batch,), np.float32)
            feats, labels, mask = (put_global(a, eval_sharding)
                                   for a in (feats, labels, mask))
            out = eval_step(st, feats, labels, mask)
            tot_loss_sum += float(out["loss_sum"])
            tot_correct += float(out["correct"])
            tot_n += float(out["samples"])
            # the psum'd outputs during a dummy round still carry the OTHER
            # hosts' real contributions — dropping confusion here would
            # undercount the saved matrix on the short-shard host
            conf = np.asarray(out["confusion"], np.float64)
            tot_conf = conf if tot_conf is None else tot_conf + conf
            batches += 1
        if tot_n == 0:
            return float("nan"), float("nan"), 0.0, None
        # sample-weighted mean — identical to the reference's mean-of-batch-
        # means when all batches are full, exact (not shard-biased) on tails
        return tot_loss_sum / tot_n, tot_correct / tot_n, tot_n, tot_conf

    # preemption safety: TPU-VM maintenance events deliver SIGTERM, not
    # Ctrl-C — route it into the same graceful-finish path (reference
    # train.py:330-343 only catches KeyboardInterrupt). auto_resume picks
    # the run back up from the last periodic snapshot.
    prev_sigterm = None
    if threading.current_thread() is threading.main_thread():
        def _on_sigterm(signum, frame):
            raise KeyboardInterrupt("SIGTERM (preemption)")
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    try:
        for epoch in range(start_epoch, config.max_iters):
            train_loader.set_epoch(epoch)
            epoch_correct, epoch_samples = 0.0, 0.0
            batch_losses, batch_acc = [], []
            pending = []  # (metrics, step_base) awaiting host readout

            def drain(m, step_base):
                nonlocal epoch_correct, epoch_samples, global_step
                losses = np.asarray(m["loss"])
                corrects = np.asarray(m["correct"])
                if writer and "grad_norm" in m:
                    writer.add_scalar("grad norm", float(m["grad_norm"]),
                                      step_base)
                if writer and "lr" in m:
                    # learning-rate curve (production observability; the
                    # reference logs only loss/accuracy, train.py:291-293)
                    writer.add_scalar("learning rate", float(m["lr"]),
                                      step_base)
                per_micro = losses.shape[0]
                micro_samples = float(m["samples"]) / per_micro
                for j in range(per_micro):
                    epoch_correct += float(corrects[j])
                    epoch_samples += micro_samples
                    batch_losses.append(float(losses[j]))
                    all_losses.append(float(losses[j]))
                    batch_acc.append(epoch_correct / max(epoch_samples, 1))
                    if writer:
                        writer.add_scalar("training loss", losses[j],
                                          step_base + j)
                        writer.add_scalar("training accuracy",
                                          epoch_correct / max(epoch_samples,
                                                              1),
                                          step_base + j)

            # mid-epoch resume: fast-forward the loader past the optimizer
            # steps this epoch already consumed (one-shot, first epoch only)
            if epoch == start_epoch and resume_skip:
                train_loader.skip(resume_skip * accum)
                supers_in_epoch = resume_skip
            feed = accumulate_batches(iter(train_loader), accum)
            if nb_train_sync is not None:
                import itertools
                feed = itertools.islice(
                    feed, max(0, nb_train_sync // accum - supers_in_epoch))
            feed = device_prefetch(feed, put_super, depth=2)
            for feats, labels in feed:
                sub = fold_key(base_key, np.int64(global_step))
                state, metrics = train_step(state, feats, labels, sub)
                # defer host sync by one step to keep the device busy
                pending.append((metrics, global_step))
                global_step += accum
                steps_this_run += 1
                supers_in_epoch += 1
                if len(pending) > 1:
                    drain(*pending.pop(0))
                if config.checkpoint_every_steps and \
                        supers_in_epoch % config.checkpoint_every_steps == 0:
                    # mid-epoch snapshot step_<epoch>_<n>: full state + the
                    # loop position (global_step for TB continuity, n for
                    # the loader fast-forward on resume). Keep-1 retention
                    # before saving: at most two mid-epoch snaps on disk.
                    if is_main:
                        ckpt.prune_midepoch(
                            os.path.join(config.checkpoint_dir,
                                         config.model_name), keep=1)
                    ckpt.save_checkpoint(
                        os.path.join(config.checkpoint_dir,
                                     config.model_name),
                        epoch,
                        {**host_state(state)._asdict(),
                         "loop_state": np.asarray(
                             [global_step, supers_in_epoch], np.int64),
                         "early_stop": early_stop_state()},
                        block=not config.async_checkpoint,
                        minor=supers_in_epoch)
                if max_steps is not None and steps_this_run >= max_steps:
                    break
            for item in pending:
                drain(*item)

            state = state._replace(epoch=state.epoch + 1)  # scheduler.step()
            supers_in_epoch = 0  # the epoch completed; snapshots from here
            #                      (incl. an interrupt's final save) resume
            #                      at the top of the next epoch
            if batch_losses:
                train_losses_hist.extend(windowed_average(batch_losses))
                train_acc_hist.extend(windowed_average(batch_acc))

            if epoch % config.eval_interval == 0 or \
                    epoch == config.max_iters - 1:
                val_loss, val_accuracy, val_samples, val_conf = run_eval()
                val_losses.append(val_loss)
                val_percent.append(val_accuracy)
                summary["val_samples"] = val_samples
                if val_conf is not None:
                    summary["val_confusion"] = val_conf
                if is_main:
                    tl = train_losses_hist[-1] if train_losses_hist \
                        else float("nan")
                    ta = train_acc_hist[-1] if train_acc_hist else float("nan")
                    print(f"Step {epoch}: Train Loss: {tl:.4f}, "
                          f"Val Loss: {val_loss:.4f}")
                    print(f"Step {epoch}: Train Accuracy: {ta * 100:.2f}%, "
                          f"Val Accuracy: {val_accuracy * 100:.2f}%")
                    if writer:
                        writer.add_scalar("val loss", val_loss, epoch)
                        writer.add_scalar("val accuracy", val_accuracy, epoch)
                # update best/patience BEFORE the end-of-epoch save so the
                # snapshot carries this epoch's eval — a resume from it then
                # tracks best/patience exactly like an uninterrupted run
                improved_best = False
                if not math.isnan(val_loss):
                    # NaN (empty val set) counts toward neither mechanism
                    if val_loss < patience_baseline - \
                            config.early_stop_min_delta:
                        evals_since_improve = 0
                        patience_baseline = val_loss
                    else:
                        evals_since_improve += 1
                    if val_loss < best_val_loss:
                        best_val_loss = val_loss
                        improved_best = True
                # Orbax saves are process-collective: EVERY process must
                # call save (orbax barriers internally and writes once) —
                # gating on is_main deadlocks multi-host at the first save
                ckpt.save_checkpoint(
                    os.path.join(config.checkpoint_dir,
                                 config.model_name),
                    epoch,
                    {**host_state(state)._asdict(),
                     "loop_state": np.asarray([global_step, 0], np.int64),
                     "early_stop": early_stop_state()},
                    block=not config.async_checkpoint)
                if is_main and config.checkpoint_every_steps:
                    # the end-of-epoch snapshot dominates this epoch's
                    # mid-epoch ones; keep the newest as a crash fallback
                    ckpt.prune_midepoch(
                        os.path.join(config.checkpoint_dir,
                                     config.model_name), keep=1)
                if is_main and config.keep_checkpoints:
                    ckpt.prune_epochs(
                        os.path.join(config.checkpoint_dir,
                                     config.model_name),
                        keep=config.keep_checkpoints)
                if improved_best and config.save_best:
                    best_dir = os.path.join(
                        config.checkpoint_dir,
                        f"{config.model_name}_best")
                    # prune BEFORE saving (the established pattern:
                    # at most the newest old best + the new one on
                    # disk, even mid async write)
                    if is_main:
                        ckpt.prune_epochs(best_dir, keep=1)
                    ckpt.save_checkpoint(
                        best_dir, epoch,
                        {**host_state(state)._asdict(),
                         "loop_state": np.asarray(
                             [global_step, 0], np.int64),
                         "early_stop": early_stop_state()},
                        block=not config.async_checkpoint)
                if config.early_stop_patience and \
                        evals_since_improve >= config.early_stop_patience:
                    stopped_early = True
                    if is_main:
                        print(f"Early stopping at epoch {epoch}: no val-"
                              f"loss improvement in {evals_since_improve} "
                              f"evals (best {best_val_loss:.4f})")
                    break

            elapsed = time.time() - start_time
            done = epoch - start_epoch + 1
            remaining = (config.max_iters - epoch - 1) * (elapsed / done)
            if is_main:
                print(f"Iter [{epoch + 1}/{config.max_iters}] - Elapsed "
                      f"Time: {elapsed:.2f}s - Remaining Time: "
                      f"[{remaining:.2f}]")
            if max_steps is not None:
                break
    except KeyboardInterrupt:
        if is_main and train_losses_hist:
            print(f"Keyboard interrupt,\nFinal Train Loss: "
                  f"{train_losses_hist[-1]:.4f}")
    finally:
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
        ckpt.wait_for_checkpoints()  # drain any in-flight async save
        final_dir = os.path.join(config.checkpoint_dir,
                                 f"{config.run_name()}_finished")
        ckpt.save_checkpoint(final_dir, int(jax.device_get(state.epoch)),
                             {**host_state(state)._asdict(),
                              "loop_state": np.asarray(
                                  [global_step, supers_in_epoch],
                                  np.int64),
                              "early_stop": early_stop_state()})
        if is_main:
            stats_dir = "statistics"
            os.makedirs(stats_dir, exist_ok=True)
            base = f"{config.run_name()}_finished"
            np.save(os.path.join(stats_dir, f"{base}_train_losses.npy"),
                    np.asarray(train_losses_hist).reshape(-1, 1))
            np.save(os.path.join(stats_dir, f"{base}_train_percent.npy"),
                    np.asarray(train_acc_hist).reshape(-1, 1))
            np.save(os.path.join(stats_dir, f"{base}_val_losses.npy"),
                    np.asarray(val_losses))
            np.save(os.path.join(stats_dir, f"{base}_val_percent.npy"),
                    np.asarray(val_percent))
            if summary.get("val_confusion") is not None:
                # per-class observability beyond the reference's scalars:
                # rows = true class, cols = predicted, from the last eval
                np.save(os.path.join(stats_dir, f"{base}_val_confusion.npy"),
                        summary["val_confusion"])
            print("Model and statistics saved!")
            if writer:
                writer.close()

    summary.update(
        final_train_loss=train_losses_hist[-1] if train_losses_hist
        else None,
        final_val_loss=val_losses[-1] if val_losses else None,
        final_val_accuracy=val_percent[-1] if val_percent else None,
        global_step=global_step,
        train_losses=all_losses,
        val_losses=list(val_losses),
        best_val_loss=best_val_loss if val_losses else None,
        stopped_early=stopped_early,
    )
    return summary
