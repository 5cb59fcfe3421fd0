"""The jitted training/eval steps: grad-accumulation scan + shard_map DP.

One ``train_step`` call consumes a full *effective* batch shaped
(accum_steps, local_batch, T, H, W, C) uint8 and performs, entirely
on-device inside a single XLA program:

  1. preprocessing (cast bf16, /255 — reference extract_features_labels,
     train.py:102-108, minus the permute: we are channels-last natively);
  2. a ``lax.scan`` over microbatches, each computing loss + grads + updated
     BatchNorm state (reference accumulates grads across loader iterations,
     train.py:283-289 — grads are summed unscaled, faithfully reproduced);
  3. a cross-replica ``pmean`` of the accumulated grads (what DDP's bucketed
     NCCL all-reduce does, train.py:204) and of BN running stats (divergence:
     the reference keeps per-replica stats and saves rank 0's — averaging is
     needed to keep our replicated-state invariant and is strictly no worse);
  4. one optimizer update, replicated.

Normalization semantics match DDP: batch statistics are computed from the
*local* shard (per-replica BN, not SyncBN).

The whole step runs under ``shard_map`` over Mesh('data','model'); batch
arrays are sharded on 'data'; parameters are replicated by default or
sharded over 'model' for tensor parallelism via ``state_specs``
(parallel.mesh.train_state_specs). XLA lowers the pmean to ICI all-reduces
overlapping the backward pass. Per-microbatch losses are returned so
logging density matches the reference's per-batch TB scalars.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from picklebot_tpu.core.module import DtypePolicy, Module
from picklebot_tpu.train.losses import (LOSSES, LOSSES_PER_SAMPLE,
                                        prepare_labels)
from picklebot_tpu.train.optim import Optimizer

PyTree = Any


class TrainState(NamedTuple):
    params: PyTree
    model_state: PyTree      # BatchNorm statistics etc.
    opt_state: PyTree
    epoch: jax.Array         # current epoch (drives the cosine schedule)
    ema_params: PyTree = None  # EMA of params (config ema_decay > 0);
    #                            None (an empty pytree node) when disabled,
    #                            so every tree_map/spec/checkpoint surface
    #                            is structurally unchanged by default


def create_train_state(model: Module, optimizer: Optimizer,
                       seed, tp_rules=None, tp_degree: int = 1,
                       zero_degree: int = 0, ema: bool = False) -> TrainState:
    """Host-side (numpy) init — instant, no device traffic; place the result
    with one device_put / jit donation afterwards.

    ``tp_rules``/``tp_degree`` (tensor parallelism) lay out shard-aware
    optimizer state (AdamW8bit quantizes moments per local shard).
    ``zero_degree`` > 1 lays optimizer state out in the ZeRO-DP format
    instead (parallel/zero.py: moments sharded over 'data', 1/N per rank);
    mutually exclusive with tp_rules."""
    import numpy as np
    variables = model.init(seed)
    if zero_degree > 1:
        if tp_rules is not None and tp_degree > 1:
            raise ValueError("ZeRO optimizer sharding composes with pure "
                             "data parallelism only (not TP/EP rules)")
        from picklebot_tpu.parallel.zero import zero_opt_state
        opt_state = zero_opt_state(optimizer, variables["params"],
                                   zero_degree)
    else:
        model_shards = None
        if tp_rules is not None and tp_degree > 1:
            from picklebot_tpu.parallel.mesh import model_shard_counts
            model_shards = model_shard_counts(variables["params"], tp_rules,
                                              tp_degree)
        opt_state = optimizer.init(variables["params"],
                                   model_shards=model_shards)
    return TrainState(
        params=variables["params"],
        model_state=variables["state"],
        opt_state=opt_state,
        epoch=np.zeros((), np.int32),
        ema_params=(jax.tree_util.tree_map(np.copy, variables["params"])
                    if ema else None),
    )


def preprocess(features: jax.Array, compute_dtype,
               mean=None, std=None, input_size=None) -> jax.Array:
    """uint8 (..., T, H, W, C) -> compute-dtype, on-device and fused.

    Default is /255 only (exactly what the reference applies,
    train.py:106 — its config mean/std are declared but never used).
    Passing mean/std (per-channel) enables real standardization
    (config.apply_mean_std).

    ``input_size`` (config.input_size) resizes the frames to
    (input_size, input_size) in-graph (ops/resize.py — bilinear,
    antialiased): native-resolution clips stream to the chip as uint8 and
    resample at HBM speed. Resize is linear, so applying mean/std after
    it is exact; a matching input needs no resize (identity)."""
    x = features.astype(compute_dtype) / jnp.asarray(255, compute_dtype)
    if input_size:
        from picklebot_tpu.ops.resize import resize_frames
        x = resize_frames(x, input_size)
    if mean is not None and std is not None:
        mean = jnp.asarray(mean, compute_dtype)
        std = jnp.asarray(std, compute_dtype)
        x = (x - mean) / std
    return x


def collect_aux_losses(state_tree) -> Optional[jax.Array]:
    """Sum every ``aux_loss`` leaf a forward pass published through the
    module-state channel (MoE load-balance losses, ops/moe.py). Returns
    None when the model has no aux-loss leaves (a static property of the
    state structure, so the train step specializes at trace time)."""
    from picklebot_tpu.core.module import flatten_dict
    leaves = [v for k, v in flatten_dict(state_tree).items()
              if k.rsplit(".", 1)[-1] == "aux_loss"]
    if not leaves:
        return None
    return sum(jnp.asarray(v, jnp.float32) for v in leaves)


def make_train_step(model: Module, optimizer: Optimizer, criterion: str,
                    schedule: Callable[[jax.Array], jax.Array],
                    policy: Optional[DtypePolicy] = None,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    mean=None, std=None,
                    state_specs=None,
                    moe_aux_weight: float = 0.01,
                    zero_degree: int = 0,
                    zero_stage: int = 1,
                    zero3_templates: PyTree = None,
                    max_grad_norm: Optional[float] = None,
                    remat: int = 0,
                    ema_decay: float = 0.0,
                    augment=None,
                    label_smoothing: float = 0.0,
                    frozen_mask: PyTree = None,
                    input_size: Optional[int] = None):
    """Build the jitted train step.

    Returns step(state, features, labels, rng) ->
      (state, {'loss': (A,), 'correct': (A,), 'samples': (), 'lr': ()})
    — loss/correct are per-microbatch vectors stacked by the accumulation
    scan (loop.py sums/averages them); samples is the scalar A*B count —
    with features (A, B, T, H, W, C) uint8 and labels (A, B) int32;
    under a mesh, B is the *global* batch and arrays are sharded on 'data'.

    ``moe_aux_weight`` scales any MoE load-balance aux losses the forward
    publishes (collect_aux_losses); the logged 'loss' metric stays the pure
    task loss, matching the reference's TB scalars.

    ``max_grad_norm`` enables global-norm gradient clipping with torch
    ``clip_grad_norm_`` semantics (scale by max/(norm+1e-6) when the norm
    exceeds max), applied to the *reduced* grads — with cross-shard psums
    for TP/EP-sharded leaves — so DP/ZeRO/TP/EP all match single-device;
    the observed norm is returned in the metrics as 'grad_norm'.

    ``remat`` > 0 wraps that many levels of child-module calls in
    jax.checkpoint inside the forward (activation rematerialization:
    backward recomputes block activations instead of storing them — the
    HBM-for-FLOPs trade for long clips / big batches). Gradients are
    unchanged; only the autodiff schedule moves.

    ``label_smoothing`` > 0 smooths the TRAINING loss targets (torch
    CrossEntropyLoss label_smoothing= semantics; BCE: y -> y(1-e)+e/2).
    The logged loss is the smoothed training objective; eval loss and all
    accuracy metrics stay on hard labels.

    ``augment`` (a data.augment.Augment) enables in-graph per-sample
    training augmentation after preprocessing — flip/crop/brightness keys
    are salted off each micro rng, so the dropout stream (and therefore
    every unaugmented run) is unchanged, and mid-epoch resume replays the
    augmentation draws exactly.

    ``ema_decay`` > 0 updates ``state.ema_params`` (which must then be
    non-None, from ``create_train_state(ema=True)``) after every optimizer
    step: ema = decay*ema + (1-decay)*params. The EMA runs on the
    post-update (post-all-gather under ZeRO) replicated-or-param-sharded
    values, so it is layout-invariant by construction.

    ``zero_degree`` > 1 enables ZeRO optimizer-state sharding over 'data'
    (parallel/zero.py): grads are reduce-scattered instead of all-reduced,
    the optimizer updates a 1/N parameter slice per rank, and new params
    are all-gathered. Requires the state from
    ``create_train_state(zero_degree=N)`` and the matching
    ``zero.zero_state_specs`` as ``state_specs``; zero_degree must equal
    the mesh's 'data' axis size.

    ``frozen_mask`` (train/freeze.py freeze_mask: per-leaf Python bools
    mirroring params, True = frozen) fine-tunes with torch
    ``requires_grad=False`` semantics: frozen leaves contribute no
    gradient (zeroed before reductions and the clipping norm) and take no
    optimizer update — including no decoupled weight decay (the updated
    value is structurally replaced by the old one, so XLA eliminates the
    frozen leaves' whole update chain). Moments stay zero; composes with
    DP/TP/EP/ZeRO because the mask is applied leaf-wise on each rank's
    identical-structure trees. BN running stats still update (torch
    parity — freezing params does not put modules in eval mode).

    ``zero_stage=3`` (with ``zero_degree`` > 1) is the parameter-sharded
    FSDP/ZeRO-3 layout: ``state.params`` (and EMA) are the (n, chunk) rank
    stacks from ``zero.zero3_shard_params``; the step all-gathers them
    back to full leaves FIRST (``zero3_templates`` — zero.param_templates —
    carries the static full shapes), runs forward/backward, reduce-scatters
    grads, updates the local slice, and returns NEW rank stacks (no
    trailing gather; per-step ICI bytes match stage 1). Use
    ``zero.zero3_state_specs`` as ``state_specs``.
    """
    policy = policy or DtypePolicy.bf16()
    loss_fn, acc_fn = LOSSES[criterion]
    if label_smoothing > 0.0:
        # training-only (torch label_smoothing= semantics); eval loss and
        # all accuracy metrics stay on hard labels
        from picklebot_tpu.train.losses import (smoothed_bce,
                                                smoothed_cross_entropy)
        loss_fn = (smoothed_cross_entropy(label_smoothing)
                   if criterion == "CE" else smoothed_bce(label_smoothing))
    if zero_degree > 1:
        if mesh is None:
            raise ValueError("zero_degree needs a mesh (ZeRO shards over "
                             "the 'data' axis)")
        if mesh.shape["data"] != zero_degree:
            raise ValueError(
                f"zero_degree={zero_degree} must equal the mesh 'data' "
                f"axis size ({mesh.shape['data']})")
        if state_specs is None:
            raise ValueError("ZeRO needs parallel.zero.zero_state_specs as "
                             "state_specs (the moment leaves are sharded)")
        if zero_stage not in (1, 3):
            raise ValueError(f"zero_stage must be 1 or 3, got {zero_stage}")
        if zero_stage == 3 and zero3_templates is None:
            # the rank stacks erase the full shapes, but the model itself
            # still knows them: derive the templates from a host-side init
            # (numpy, instant, shape-deterministic across seeds) so
            # callers can't forget them — the round-3 API trap
            from picklebot_tpu.parallel.zero import param_templates
            zero3_templates = param_templates(model.init(0)["params"])

    aug = augment if augment is not None and augment.enabled() else None

    def micro_loss(params, model_state, feats, labels, rng):
        if aug is not None:
            # in-graph per-sample augmentation (data/augment.py) — keys
            # salted off the same micro rng, so dropout is untouched and
            # the whole stream stays position-keyed (exact mid-epoch
            # resume includes the augmentation draws). Runs in the /255
            # LUMINANCE domain, BEFORE mean/std standardization: scaling
            # mean-subtracted deviations would push dark pixels *more*
            # negative on a 'brighten' draw (and crop padding would be
            # mean-gray, not black) — so standardize afterwards.
            from picklebot_tpu.data.augment import apply_augment
            x = preprocess(feats, policy.compute_dtype,
                           input_size=input_size)
            x = apply_augment(x, aug, rng)
            if mean is not None and std is not None:
                x = ((x - jnp.asarray(mean, policy.compute_dtype))
                     / jnp.asarray(std, policy.compute_dtype))
        else:
            x = preprocess(feats, policy.compute_dtype, mean, std,
                           input_size=input_size)
        logits, new_state = model.apply(
            {"params": params, "state": model_state}, x,
            train=True, rng=rng, policy=policy, remat=remat)
        lbl = prepare_labels(criterion, labels)
        loss = loss_fn(logits, lbl)
        aux = collect_aux_losses(new_state)
        total = loss if aux is None else loss + moe_aux_weight * aux
        correct = acc_fn(logits, lbl)
        return total, (new_state, correct, loss)

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def local_step(state: TrainState, features, labels, rng):
        lr = schedule(state.epoch)
        if mesh is not None:
            # independent dropout per replica (DDP ranks have independent
            # torch rng; a replicated key would correlate masks globally)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        if zero_degree > 1 and zero_stage == 3:
            # stage 3: rebuild full params from the rank stacks (the
            # stage-1 post-update all-gather, moved to the step's top)
            from picklebot_tpu.parallel.zero import zero3_gather_params
            params = zero3_gather_params(state.params, zero3_templates,
                                         "data")
        else:
            params = state.params

        def micro(carry, inp):
            grads_acc, model_state, i = carry
            feats, lbls = inp
            (_, (model_state, correct, loss)), grads = grad_fn(
                params, model_state, feats, lbls,
                jax.random.fold_in(rng, i))
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), grads_acc, grads)
            return (grads_acc, model_state, i + 1), (loss, correct)

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (grads, model_state, _), (losses, corrects) = jax.lax.scan(
            micro, (zero_grads, state.model_state, jnp.zeros((), jnp.int32)),
            (features, labels))

        if frozen_mask is not None:
            # before any reduction: DP pmean / ZeRO reduce-scatter and the
            # global clipping norm then see only trainable grads, exactly
            # like torch where frozen params have no .grad at all
            grads = jax.tree_util.tree_map(
                lambda g, f: jnp.zeros_like(g) if f else g,
                grads, frozen_mask)

        if mesh is not None:
            # DDP-equivalent replicated-state repair + metric reduction
            model_state = jax.lax.pmean(model_state, "data")
            losses = jax.lax.pmean(losses, "data")
            corrects = jax.lax.psum(corrects, "data")
            if zero_degree <= 1:
                # gradient mean (DDP bucket all-reduce); under ZeRO the
                # reduction is the reduce-scatter inside zero_update
                grads = jax.lax.pmean(grads, "data")

        grad_norm = None
        if mesh is not None and zero_degree > 1 and zero_stage == 3:
            from picklebot_tpu.parallel.zero import zero3_update
            new_params, opt_state, grad_norm = zero3_update(
                optimizer, state.params, grads, state.opt_state, lr,
                n=zero_degree, axis="data", max_grad_norm=max_grad_norm)
        elif mesh is not None and zero_degree > 1:
            from picklebot_tpu.parallel.zero import zero_update
            new_params, opt_state, grad_norm = zero_update(
                optimizer, params, grads, state.opt_state, lr,
                n=zero_degree, axis="data", max_grad_norm=max_grad_norm)
        else:
            if max_grad_norm is not None:
                # torch clip_grad_norm_: ONE global norm over every leaf.
                # Under TP/EP a leaf whose PartitionSpec names mesh axes is
                # a distinct shard per rank there, so its squared norm is
                # psum'd over those axes (replicated leaves — incl. PP/SP
                # params, whose grads the boundary wraps already psum —
                # contribute their local square once). The scale is then
                # identical on every rank.
                g_leaves = jax.tree_util.tree_leaves(grads)
                if mesh is not None and state_specs is not None:
                    s_leaves = jax.tree_util.tree_leaves(
                        state_specs.params,
                        is_leaf=lambda x: isinstance(x, P))
                else:
                    s_leaves = [P()] * len(g_leaves)
                sq = jnp.zeros((), jnp.float32)
                for g, spec in zip(g_leaves, s_leaves):
                    leaf_sq = jnp.sum(jnp.square(g.astype(jnp.float32)))
                    axes = sorted({a for dim in spec for a in
                                   (dim if isinstance(dim, tuple)
                                    else (dim,)) if a is not None})
                    for ax in axes:
                        leaf_sq = jax.lax.psum(leaf_sq, ax)
                    sq = sq + leaf_sq
                grad_norm = jnp.sqrt(sq)
                scale = jnp.minimum(
                    1.0, max_grad_norm / (grad_norm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            new_params, opt_state = optimizer.update(
                grads, state.opt_state, params, lr)
        if frozen_mask is not None:
            # kill the remaining mover, decoupled weight decay: AdamW at
            # zero grad still shrinks a weight by lr*wd*p. Static per-leaf
            # selection — XLA dead-code-eliminates the frozen leaves'
            # update chain entirely. Under ZeRO-3 both sides are the
            # (n, chunk) rank stacks (same treedef as the full params).
            ref = (state.params if (zero_degree > 1 and zero_stage == 3)
                   else params)
            new_params = jax.tree_util.tree_map(
                lambda old, new, f: old if f else new,
                ref, new_params, frozen_mask)
        samples = jnp.asarray(features.shape[0] * features.shape[1],
                              jnp.float32)
        if mesh is not None:
            samples = jax.lax.psum(samples, "data")
        # per-microbatch losses/corrects -> logging density matches the
        # reference's per-batch TB scalars (train.py:291-293)
        metrics = {"loss": losses, "correct": corrects,
                   "samples": samples, "lr": lr}
        if grad_norm is not None:
            metrics["grad_norm"] = grad_norm
        ema = state.ema_params
        if ema_decay > 0.0:
            if ema is None:
                # trace-time (None is static): silently skipping would
                # train with no EMA ever accumulated and only surface at
                # serve/export --ema, much later
                raise ValueError(
                    "ema_decay > 0 but state.ema_params is None — build "
                    "the state with create_train_state(ema=True)")
            d = jnp.asarray(ema_decay, jnp.float32)
            ema = jax.tree_util.tree_map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1.0 - d) * p.astype(jnp.float32)
                              ).astype(e.dtype),
                ema, new_params)
        return TrainState(new_params, model_state, opt_state,
                          state.epoch, ema), metrics

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0,) if donate else ())

    # state_specs (parallel.mesh.train_state_specs) shards parameters over
    # the 'model' axis for tensor parallelism; default is replicated (DP)
    st_specs = state_specs if state_specs is not None else P()
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(st_specs, P(None, "data"), P(None, "data"), P()),
        out_specs=(st_specs, P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_step(model: Module, criterion: str,
                   policy: Optional[DtypePolicy] = None,
                   mesh: Optional[Mesh] = None,
                   mean=None, std=None,
                   state_specs=None,
                   zero3_templates=None,
                   input_size: Optional[int] = None):
    """eval_step(state, features, labels, mask) ->
    {'loss': masked mean, 'loss_sum', 'correct', 'samples'}.

    features (B, T, H, W, C) uint8, labels (B,), mask (B,) float32 — 1.0 for
    real samples, 0.0 for tail padding. BN in eval mode (running stats),
    mirroring reference estimate_loss (train.py:123-153). The mask lets the
    val loader keep its final partial batch (padded up to B) so every sample
    is evaluated exactly once — the reference consumes the full val set
    (train.py:134-150); round 1 dropped up to global_batch-1 samples.

    ``zero3_templates`` (with a matching zero3 ``state_specs``): the state's
    params arrive as ZeRO-3 rank stacks; the eval gathers them back to full
    leaves first (same contract as make_train_step zero_stage=3).
    """
    policy = policy or DtypePolicy.bf16()
    loss_fn, correct_fn = LOSSES_PER_SAMPLE[criterion]

    if zero3_templates is None and state_specs is not None:
        # Stage-3 states are detectable from their specs: params rank
        # stacks are the only layout that shards PARAM leaves on 'data'
        # (ZeRO is pure-DP-only, config.validate). Derive the templates
        # exactly like make_train_step does so callers can't forget them
        # — otherwise stacked params trace into model.apply and die with
        # an opaque conv shape error.
        p_leaves = jax.tree_util.tree_leaves(
            state_specs.params, is_leaf=lambda s: isinstance(s, P))
        if any(isinstance(s, P) and len(s) and s[0] == "data"
               for s in p_leaves):
            from picklebot_tpu.parallel.zero import param_templates
            zero3_templates = param_templates(model.init(0)["params"])

    def local_eval(state: TrainState, features, labels, mask):
        if zero3_templates is not None:
            from picklebot_tpu.parallel.zero import zero3_gather_params
            params = zero3_gather_params(state.params, zero3_templates,
                                         "data")
        else:
            params = state.params
        x = preprocess(features, policy.compute_dtype, mean, std,
                       input_size=input_size)
        logits, _ = model.apply(
            {"params": params, "state": state.model_state}, x,
            train=False, policy=policy)
        lbl = prepare_labels(criterion, labels)
        mask = mask.astype(jnp.float32)
        loss_sum = jnp.sum(loss_fn(logits, lbl) * mask)
        correct = jnp.sum(correct_fn(logits, lbl) * mask)
        n = jnp.sum(mask)
        # confusion matrix (rows = true class, cols = predicted) — a
        # per-class observability extension; the reference reports only
        # scalar accuracy (train.py:110-121)
        if criterion == "BCE":
            pred = (logits.reshape(-1) > 0).astype(jnp.int32)
            true = lbl.reshape(-1).astype(jnp.int32)
            ncls = 2
        else:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            true = lbl
            ncls = logits.shape[-1]
        confusion = jnp.zeros((ncls, ncls), jnp.float32).at[
            true, pred].add(mask)
        if mesh is not None:
            loss_sum = jax.lax.psum(loss_sum, "data")
            correct = jax.lax.psum(correct, "data")
            n = jax.lax.psum(n, "data")
            confusion = jax.lax.psum(confusion, "data")
        return {"loss": loss_sum / jnp.maximum(n, 1.0), "loss_sum": loss_sum,
                "correct": correct, "samples": n, "confusion": confusion}

    if mesh is None:
        return jax.jit(local_eval)
    # tensor-parallel models must keep their param shardings in eval too —
    # replicating TP-sharded params would double FFN psum outputs
    st_specs = state_specs if state_specs is not None else P()
    sharded = shard_map(
        local_eval, mesh=mesh,
        in_specs=(st_specs, P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False)
    return jax.jit(sharded)


def make_predict_fn(model: Module, policy: Optional[DtypePolicy] = None,
                    mean=None, std=None, input_size=None):
    """Batched inference: uint8 clips -> logits. The bench.py entry point."""
    policy = policy or DtypePolicy.bf16()

    def predict(variables, features):
        x = preprocess(features, policy.compute_dtype, mean, std,
                       input_size=input_size)
        logits, _ = model.apply(variables, x, train=False, policy=policy)
        return logits

    return jax.jit(predict)


def make_sharded_predict_fn(model: Module, mesh: Mesh,
                            policy: Optional[DtypePolicy] = None,
                            mean=None, std=None, state_specs=None,
                            input_size=None):
    """Data-parallel batched inference over a device mesh: the batch dim
    splits across the 'data' axis (must divide by its size), every device
    runs the local forward, logits gather back sharded-by-batch. The
    serving-side counterpart of the shard_map train/eval steps — scales
    throughput over ICI exactly like DDP inference would over NCCL.
    TP-sharded params keep their layouts via ``state_specs`` — shaped
    like the VARIABLES dict passed here ({'params': specs, 'state': P()}),
    NOT the TrainState-shaped tree make_eval_step takes."""
    policy = policy or DtypePolicy.bf16()

    def local_predict(variables, features):
        x = preprocess(features, policy.compute_dtype, mean, std,
                       input_size=input_size)
        logits, _ = model.apply(variables, x, train=False, policy=policy)
        return logits

    st_specs = state_specs if state_specs is not None else P()
    sharded = shard_map(local_predict, mesh=mesh,
                        in_specs=(st_specs, P("data")),
                        out_specs=P("data"), check_vma=False)
    return jax.jit(sharded)
