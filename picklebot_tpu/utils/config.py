"""Config system: the reference's flat JSON configs, parsed and validated.

Accepts the reference's config/*.json files verbatim (full key schema at
SURVEY.md §5 / reference train.py:97-100 — one positional CLI arg, flat JSON,
no validation there). Here every key lands in a typed dataclass with
defaults, divides-evenly checks (reference train.py:245), and warnings for
unknown keys. Keys the reference declares but never uses (``mean``/``std``
are never applied — train.py:106 only divides by 255) are accepted and
carried for compatibility; ``apply_mean_std=True`` opts into actually using
them (capability the reference intended).

Extension keys (all optional, defaulted) configure TPU-specific behavior:
data backend, temporal bucketing, optimizer choice, mesh shape, directories.
"""

from __future__ import annotations

import dataclasses
import json
import warnings
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class Config:
    # --- reference schema (config/*.json) ---
    model_name: str = "MobileNetLarge3D"
    learning_rate: float = 3e-4
    batch_size: int = 16
    max_iters: int = 1                  # epochs (reference naming)
    eval_interval: int = 1
    weight_decay: float = 5e-4
    std: Optional[List[float]] = None   # declared, unused by reference
    mean: Optional[List[float]] = None
    use_autocast: bool = True           # -> bf16 compute policy
    compile: bool = True                # jit is always on; kept for parity
    criterion: str = "CE"
    checkpoint: Optional[str] = None
    train_annotations_file: str = ""
    val_annotations_file: str = ""
    video_paths: str = ""
    num_classes: int = 2
    effective_batch_size: int = 16
    dims: Optional[List[int]] = None        # MobileViT only
    channels: Optional[List[int]] = None    # MobileViT only
    varying_input_size: bool = False

    # --- picklebot-tpu extensions ---
    optimizer: str = "adamw8bit"        # adamw | adamw8bit
    data_backend: str = "opencv"   # opencv|ffmpeg|npy|synthetic|
    #                                synthetic_learnable
    num_workers: int = 4
    skip_bad_clips: bool = False        # truncated/corrupt clips: default
    #                                     STRICT (raise with the filename
    #                                     at first touch); True skips them
    #                                     with a per-dataset counter
    #                                     (dataset.bad_clips) — production
    #                                     resilience for long runs
    t_bucket: int = 8
    max_frames: int = 256
    apply_mean_std: bool = False        # actually use mean/std keys
    data_parallel: Optional[int] = None  # None -> all local devices
    dcn_data_parallel: int = 1          # multi-slice topology: the data
    #                                     axis spans this many DCN-connected
    #                                     slices (outer stride over DCN;
    #                                     TP/SP/PP/EP and the inner data
    #                                     stride stay on each slice's ICI —
    #                                     parallel/mesh.make_mesh dcn_data)
    model_parallel: int = 1             # TP degree (MobileViT FFNs)
    sequence_parallel: int = 1          # SP degree (MobileViT transformer
    #                                     tokens sharded over the 'seq' mesh
    #                                     axis; ring attention)
    pipeline_parallel: int = 1          # PP degree (MobileViT transformer
    #                                     depth split into GPipe stages over
    #                                     the 'pipe' mesh axis)
    pipeline_microbatches: Optional[int] = None  # default: PP degree
    moe_experts: int = 0                # >0 swaps the MobileViT transformer
    #                                     FFNs for a routed expert bank
    #                                     (ops/moe.py, top-k dispatch)
    moe_top_k: int = 2                  # experts per token (1 or 2)
    moe_capacity_factor: float = 1.25   # per-expert token slots multiplier
    moe_aux_weight: float = 0.01        # load-balance aux loss weight
    moe_dispatch: str = "replicated"    # replicated (exact == unsharded;
    #                                     tokens duplicated in the EP group)
    #                                     | tokens (all_to_all exchange,
    #                                     device-local routing groups —
    #                                     activations/routing/FLOPs all
    #                                     scale 1/EP per rank)
    expert_parallel: int = 1            # EP degree (expert bank sharded
    #                                     over the 'expert' mesh axis)
    zero_sharding: int = 0              # ZeRO-DP stage: 0/False off;
    #                                     1/True shards optimizer state 1/N
    #                                     over the 'data' axis (reduce-
    #                                     scatter grads + all-gather params);
    #                                     3 additionally shards the params
    #                                     (and EMA) at rest — FSDP/ZeRO-3
    #                                     layout, same per-step ICI bytes
    #                                     (parallel/zero.py)
    label_smoothing: float = 0.0        # training-loss label smoothing
    #                                     (torch CrossEntropyLoss
    #                                     label_smoothing= semantics; BCE
    #                                     smooths y -> y(1-e)+e/2); eval
    #                                     loss/accuracy stay on hard labels
    augment_flip: bool = False          # training-time horizontal flip
    #                                     (p=0.5 per clip, in-graph —
    #                                     data/augment.py; reference trains
    #                                     with no augmentation at all)
    augment_crop: int = 0               # random spatial crop: pad H/W by P
    #                                     and slice a random same-size
    #                                     window per clip (+-P translation)
    augment_brightness: float = 0.0     # per-clip brightness scale drawn
    #                                     from [1-b, 1+b]
    input_size: Optional[int] = None    # in-pipeline spatial resize: every
    #                                     clip/frame is resized ON DEVICE to
    #                                     (input_size, input_size) inside the
    #                                     jitted preprocess (bilinear,
    #                                     antialiased — ops/resize.py) before
    #                                     normalization/augmentation, in
    #                                     train, eval, serve and serve --http.
    #                                     None = feed dataset-native frames
    #                                     (reference behavior). AOT artifacts
    #                                     keep their compiled shape; serve
    #                                     --exported host-resizes mismatched
    #                                     clips instead
    sample_fps: float = 0.0             # frame-rate sampling at decode:
    #                                     keep every round(native_fps /
    #                                     sample_fps)-th frame (host-side,
    #                                     opencv + ffmpeg backends read the
    #                                     container fps). 0 keeps every
    #                                     frame (reference behavior). A 60
    #                                     fps clip at sample_fps=15 yields
    #                                     every 4th frame. npy/synthetic
    #                                     backends carry no fps metadata ->
    #                                     rejected at validate()
    temporal_jitter: bool = False       # train loader: clips longer than
    #                                     max_frames contribute a RANDOM
    #                                     contiguous window instead of the
    #                                     head (keyed by (seed, epoch,
    #                                     clip) — resume replays crops;
    #                                     eval keeps head truncation)
    warmup_epochs: int = 0              # linear LR ramp over the first N
    #                                     epochs before the cosine anneal
    #                                     (extension; reference goes straight
    #                                     to CosineAnnealingLR, train.py:215)
    ema_decay: float = 0.0              # >0 keeps an exponential moving
    #                                     average of the params (per optimizer
    #                                     step, ema = d*ema + (1-d)*p); eval
    #                                     and the final checkpoint then use
    #                                     the EMA weights (production serving
    #                                     practice; raw params stay in
    #                                     'params', EMA in 'ema_params')
    save_best: bool = False             # keep a best-val-loss snapshot in
    #                                     <checkpoint_dir>/<model>_best
    #                                     (keep-1 retention; EMA-eval runs
    #                                     track the EMA-scored loss, i.e.
    #                                     the weights serving would use)
    early_stop_patience: int = 0        # >0 stops training after N
    #                                     consecutive evals without a val-
    #                                     loss improvement (the graceful
    #                                     finish still writes the final
    #                                     checkpoint + statistics)
    early_stop_min_delta: float = 0.0   # an eval only resets the patience
    #                                     counter when it beats the best
    #                                     val loss by MORE than this
    #                                     (save_best keeps tracking raw
    #                                     improvements regardless)
    warm_start: bool = False            # with `checkpoint`: load weights +
    #                                     BN stats ONLY — fresh optimizer,
    #                                     epoch 0, fresh early-stop/best
    #                                     state (the fine-tune entry; the
    #                                     default `checkpoint` semantics is
    #                                     full resume, continuing epoch /
    #                                     best_val_loss / patience). With
    #                                     auto_resume, a snapshot written by
    #                                     THIS run wins over the warm-start
    #                                     checkpoint after preemption.
    warm_start_partial: bool = False    # with `warm_start`: graft only the
    #                                     donor leaves whose path AND shape
    #                                     match the fresh init — mismatched
    #                                     leaves (e.g. a classifier head at
    #                                     a different num_classes) keep
    #                                     their fresh initialization. The
    #                                     transfer-learning entry (torch:
    #                                     load_state_dict(strict=False) +
    #                                     reinit head). Skipped paths print
    #                                     loudly; zero grafted leaves is an
    #                                     error (wrong donor).
    freeze_params: Optional[list] = None  # fine-tuning: list of param-path
    #                                     patterns to freeze (module name,
    #                                     dotted prefix, or glob — e.g.
    #                                     ["stem", "block*"]); frozen leaves
    #                                     get torch requires_grad=False
    #                                     semantics (no grad, no update, no
    #                                     weight decay; BN stats still run).
    #                                     Typos fail loudly (train/freeze.py)
    max_grad_norm: Optional[float] = None  # global-norm gradient clipping
    #                                     (torch clip_grad_norm_ semantics);
    #                                     applied to the reduced grads with
    #                                     cross-shard psums for TP/EP leaves,
    #                                     so every parallel layout matches
    #                                     single-device
    remat: int = 0                      # activation rematerialization depth:
    #                                     wrap the first N levels of child-
    #                                     module calls in jax.checkpoint so
    #                                     backward recomputes instead of
    #                                     storing (true == 1; HBM-for-FLOPs
    #                                     for long clips / big batches)
    auto_resume: bool = False           # resume from the newest snapshot in
    #                                     checkpoint_dir/<model> when
    #                                     'checkpoint' is unset (preemption
    #                                     recovery)
    checkpoint_every_steps: int = 0     # >0 also snapshots mid-epoch every
    #                                     N optimizer steps (step_<epoch>_<n>
    #                                     dirs); resume (checkpoint= or
    #                                     auto_resume) fast-forwards the
    #                                     loader to the exact position —
    #                                     with position-keyed dropout rng the
    #                                     resumed run is bit-identical to an
    #                                     uninterrupted one
    keep_checkpoints: int = 0           # >0 retains only the newest N
    #                                     end-of-epoch step_<e> snapshots
    #                                     (storage hygiene; 0 keeps all —
    #                                     reference behavior, one file per
    #                                     eval interval, train.py:316-318).
    #                                     The final *_finished snapshot is
    #                                     a separate directory, never
    #                                     pruned
    async_checkpoint: bool = False      # periodic saves return after the
    #                                     host snapshot; orbax writes in the
    #                                     background (final save always
    #                                     blocks)
    seed: int = 1234                    # reference torch.manual_seed(1234)
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "runs"
    synthetic_len: Optional[int] = None
    synthetic_shape: Tuple[int, int, int] = (16, 224, 224)
    synthetic_classes: Optional[int] = None  # class count of the synthetic
    #                                     backends (the learnable signal
    #                                     separates classes by ~150/n gray
    #                                     levels — fewer classes = higher
    #                                     SNR; statistical test gates use 4).
    #                                     None derives min(13, num_classes)
    #                                     so any synthetic config is valid
    #                                     out of the box; the CE guard below
    #                                     fires only on an EXPLICIT mismatch
    profile: bool = False               # cProfile the run -> train_stats
    #                                     .prof (reference train_stats.prof
    #                                     analog; the device-side
    #                                     jax.profiler trace is the CLI's
    #                                     --jax-profile-dir flag)
    attention_backend: str = "auto"     # auto | xla | pallas
    space_to_depth: bool = False        # fold 2x2 spatial into the stem conv
    early_fold: bool = False            # lane-folded early stage (exact;
    #                                     MobileNet3D Large/Small, MoViNetA2,
    #                                     MobileViT, MobileNet2D Large/Small;
    #                                     ops/folded.py)
    autotune: bool = False              # measure every exact execution
    #                                     plan (early_fold x fold_span) on
    #                                     the live device and run the
    #                                     winner; verdicts cached. The
    #                                     cudnn.benchmark analog — skipped
    #                                     when varying_input_size, like the
    #                                     reference (train.py:193-194).
    autotune_shape: Optional[Tuple[int, int, int]] = None  # (T, H, W) the
    #                                     autotuner measures at; None =
    #                                     synthetic_shape
    fold_span: Optional[str] = None     # how deep the fold runs; None =
    #                                     model default. Vocabulary is
    #                                     per-model (each model's FOLD_SPANS):
    #                                     Large3D/MoViNetA2:
    #                                       block2|block4|boundary
    #                                     Small3D: block3|boundary
    #                                     MobileViT: stem|trunk
    #                                     Large2D: block2|boundary
    #                                     Small2D: block3|boundary

    def resolved_synthetic_classes(self) -> int:
        """The synthetic-backend class count with the derived default
        applied: the label range must fit the logit range (CE's OOB gather
        NaN-fills silently), so follow num_classes, capped at the reference
        task's 13 classes. BCE is a binary head (num_classes=1) with {0,1}
        float targets — derive 2 so the task actually has both classes.
        Shared by validate() and train/loop.py's _make_datasets (which must
        agree on programmatically built, never-validated configs)."""
        if self.synthetic_classes is not None:
            return self.synthetic_classes
        return 2 if self.criterion == "BCE" else min(13, self.num_classes)

    def validate(self) -> "Config":
        from picklebot_tpu.models.registry import MODELS
        if self.model_name not in MODELS:
            raise ValueError(
                f"Invalid model name: {self.model_name} "
                f"(valid: {sorted(MODELS)})")
        if self.criterion not in ("CE", "BCE"):
            raise ValueError(f"Invalid criterion: {self.criterion}")
        if self.criterion == "BCE" and self.num_classes != 1:
            # torch's BCEWithLogitsLoss raises on (B, C) logits vs (B, 1)
            # labels; broadcasting silently would train on a meaningless
            # loss, so reject at config time.
            raise ValueError(
                "criterion='BCE' requires num_classes=1 (binary head; "
                f"got num_classes={self.num_classes})")
        if self.batch_size < 1 or self.effective_batch_size < 1:
            # checked before the divisibility test: batch_size=0 would
            # otherwise surface as an opaque ZeroDivisionError
            raise ValueError(
                f"batch_size={self.batch_size} / effective_batch_size="
                f"{self.effective_batch_size}: both must be >= 1")
        if self.effective_batch_size % self.batch_size != 0:
            raise ValueError(  # reference asserts this (train.py:245)
                "Batch size must divide effective batch size")
        for knob in ("model_parallel", "sequence_parallel",
                     "pipeline_parallel", "expert_parallel",
                     "dcn_data_parallel"):
            if getattr(self, knob) < 1:
                raise ValueError(f"{knob}={getattr(self, knob)}: parallel "
                                 "degrees must be >= 1")
        if self.data_parallel is not None and self.data_parallel < 1:
            raise ValueError(f"data_parallel={self.data_parallel}: must be "
                             ">= 1 (or omitted for all local devices)")
        if self.optimizer not in ("adamw", "adamw8bit"):
            raise ValueError(f"Invalid optimizer: {self.optimizer}")
        if self.apply_mean_std and (self.mean is None or self.std is None):
            raise ValueError(
                "apply_mean_std=true requires 'mean' and 'std' in the config")
        if self.data_backend not in ("opencv", "ffmpeg", "npy", "synthetic",
                                     "synthetic_learnable"):
            raise ValueError(f"Invalid data_backend: {self.data_backend}")
        if self.synthetic_classes is None:
            self.synthetic_classes = self.resolved_synthetic_classes()
        if (self.data_backend.startswith("synthetic")
                and self.criterion == "CE"
                and self.synthetic_classes > self.num_classes):
            raise ValueError(
                f"synthetic_classes={self.synthetic_classes} > "
                f"num_classes={self.num_classes}: labels outside the logit "
                "range hit CE's out-of-bounds NaN-fill gather and train "
                "loss goes silently NaN — lower synthetic_classes (fewer "
                "classes than logits is fine)")
        if (self.data_backend.startswith("synthetic")
                and self.criterion == "BCE" and self.synthetic_classes > 2):
            raise ValueError(
                f"synthetic_classes={self.synthetic_classes} with "
                "criterion='BCE': BCE targets are binary probabilities — "
                "integer labels > 1 make the loss silently meaningless; "
                "use synthetic_classes <= 2")
        if self.model_parallel > 1:
            if self.model_name != "MobileViT":
                raise ValueError(
                    "model_parallel is currently supported for MobileViT "
                    "(transformer FFN sharding)")
        if self.sequence_parallel > 1 and self.model_name != "MobileViT":
            raise ValueError(
                "sequence_parallel is currently supported for MobileViT "
                "(transformer token sharding + ring attention)")
        if self.pipeline_parallel > 1 and self.model_name != "MobileViT":
            raise ValueError(
                "pipeline_parallel is currently supported for MobileViT "
                "(transformer depth split into GPipe stages)")
        if self.moe_experts:
            if self.model_name != "MobileViT":
                raise ValueError(
                    "moe_experts is currently supported for MobileViT "
                    "(transformer FFN -> routed expert bank)")
            if not 1 <= self.moe_top_k <= min(2, self.moe_experts):
                raise ValueError(
                    f"moe_top_k={self.moe_top_k} invalid for "
                    f"moe_experts={self.moe_experts} (top-1/top-2 routing)")
            if (self.model_parallel > 1 or self.sequence_parallel > 1
                    or self.pipeline_parallel > 1):
                raise ValueError(
                    "moe_experts composes with data and expert parallelism "
                    "only (TP shards the dense FFN the MoE replaces; SP "
                    "changes routing semantics per token shard; PP drops "
                    "the aux-loss channel)")
        if self.moe_dispatch not in ("replicated", "tokens"):
            raise ValueError(f"Invalid moe_dispatch: {self.moe_dispatch}")
        if self.expert_parallel > 1:
            if not self.moe_experts:
                raise ValueError(
                    "expert_parallel requires moe_experts > 0 (there is no "
                    "expert bank to shard)")
            if self.moe_experts % self.expert_parallel != 0:
                raise ValueError(
                    f"expert_parallel={self.expert_parallel} must divide "
                    f"moe_experts={self.moe_experts} evenly")
        if int(self.zero_sharding) not in (0, 1, 3):
            raise ValueError(
                f"zero_sharding={self.zero_sharding!r} must be 0/false "
                "(off), 1/true (optimizer-state sharding) or 3 (parameter "
                "sharding, FSDP/ZeRO-3)")
        if self.zero_sharding and (
                self.model_parallel > 1 or self.sequence_parallel > 1
                or self.pipeline_parallel > 1 or self.expert_parallel > 1):
            raise ValueError(
                "zero_sharding composes with pure data parallelism only "
                "(TP/EP shard parameters on other axes; their optimizer "
                "state is already per-shard)")
        if self.max_grad_norm is not None and self.max_grad_norm <= 0:
            raise ValueError("max_grad_norm must be positive")
        if self.early_stop_patience < 0:
            raise ValueError("early_stop_patience must be >= 0 (0 disables)")
        if self.early_stop_min_delta < 0:
            raise ValueError("early_stop_min_delta must be >= 0")
        if self.freeze_params is not None:
            if (not isinstance(self.freeze_params, (list, tuple))
                    or not all(isinstance(p, str) and p
                               for p in self.freeze_params)):
                raise ValueError("freeze_params must be a list of non-empty "
                                 "param-path patterns (strings)")
            if len(self.freeze_params) == 0:
                raise ValueError("freeze_params must not be an empty list "
                                 "(omit it to train everything)")
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError("ema_decay must be in [0, 1) (0 disables)")
        if not 0.0 <= self.label_smoothing < 1.0:
            raise ValueError("label_smoothing must be in [0, 1)")
        if self.input_size is not None:
            if self.input_size <= 0:
                raise ValueError("input_size must be a positive pixel size "
                                 "(omit it to feed dataset-native frames)")
            if self.input_size % 32 != 0:
                # every zoo family downsamples 32x spatially; other sizes
                # lose pixels to stride truncation (and MobileViT's patch
                # fold needs even post-stem dims) — warn, don't reject
                warnings.warn(
                    f"input_size={self.input_size} is not a multiple of 32; "
                    "the stride-32 trunks truncate edge pixels")
        if self.sample_fps < 0:
            raise ValueError("sample_fps must be >= 0 (0 keeps every frame)")
        if self.sample_fps > 0 and self.data_backend in (
                "npy", "synthetic", "synthetic_learnable"):
            raise ValueError(
                f"sample_fps needs a video backend with fps metadata "
                f"(opencv/ffmpeg); data_backend={self.data_backend!r} "
                "carries none")
        if self.augment_crop < 0:
            raise ValueError("augment_crop must be >= 0 (a padding in "
                             "pixels; 0 disables)")
        if not 0.0 <= self.augment_brightness < 1.0:
            raise ValueError("augment_brightness must be in [0, 1) "
                             "(a relative jitter; 0 disables)")
        if self.checkpoint_every_steps < 0:
            raise ValueError("checkpoint_every_steps must be >= 0")
        if self.warm_start and not self.checkpoint:
            raise ValueError("warm_start requires `checkpoint` (the "
                             "snapshot to take the weights from)")
        if self.warm_start_partial and not self.warm_start:
            raise ValueError("warm_start_partial requires warm_start "
                             "(it qualifies WHICH donor weights load; a "
                             "full resume must restore every leaf)")
        if self.keep_checkpoints < 0:
            raise ValueError("keep_checkpoints must be >= 0 (0 keeps all)")
        if self.dcn_data_parallel < 1:
            raise ValueError("dcn_data_parallel must be >= 1")
        if self.dcn_data_parallel > 1 and self.data_parallel is not None \
                and self.data_parallel % self.dcn_data_parallel != 0:
            raise ValueError(
                f"dcn_data_parallel={self.dcn_data_parallel} must divide "
                f"data_parallel={self.data_parallel} (each slice carries "
                "an equal share of the batch)")
        if self.warmup_epochs < 0 or self.warmup_epochs >= max(
                self.max_iters, 1):
            if self.warmup_epochs != 0:
                raise ValueError(
                    f"warmup_epochs={self.warmup_epochs} must be in "
                    f"[0, max_iters={self.max_iters})")
        if int(self.remat) < 0:
            raise ValueError("remat must be >= 0 (a child-call depth; "
                             "true means 1)")
        if self.pipeline_microbatches is not None:
            if self.pipeline_microbatches < 1:
                raise ValueError("pipeline_microbatches must be >= 1")
            if self.batch_size % self.pipeline_microbatches != 0:
                raise ValueError(
                    f"pipeline_microbatches={self.pipeline_microbatches} "
                    f"must divide batch_size={self.batch_size} (microbatches "
                    f"split the per-device batch)")
        if self.fold_span is not None:
            # per-model vocabularies; a typo or another model's span name
            # must fail here, not silently run the shortest fold
            from picklebot_tpu.models.registry import fold_spans_for
            valid = fold_spans_for(self.model_name)
            if valid is not None and self.fold_span not in valid:
                raise ValueError(
                    f"fold_span={self.fold_span!r} is not valid for "
                    f"{self.model_name} (valid: {valid})")
        return self

    @property
    def grad_accum_steps(self) -> int:
        return self.effective_batch_size // self.batch_size

    def run_name(self) -> str:
        # reference: f"{model_name}_{criterion}" where criterion is the
        # torch repr (train.py:227); keep those exact strings so runs/
        # directories line up.
        crit = {"CE": "CrossEntropyLoss()",
                "BCE": "BCEWithLogitsLoss()"}[self.criterion]
        return f"{self.model_name}_{crit}"


def replicated_equivalent(config: Config) -> Config:
    """The same model with every sharded-execution axis stripped (TP/SP/PP/
    EP change execution layout, not weights). For surfaces that trace under
    plain jit with no mesh — serve, export, summary, the autotuner — where
    a mesh-axis collective (psum/ppermute/axis_size) would raise
    'unbound axis name'. Data parallelism is left untouched (callers that
    shard batches build their own mesh)."""
    if (config.model_parallel > 1 or config.sequence_parallel > 1
            or config.pipeline_parallel > 1 or config.expert_parallel > 1):
        return dataclasses.replace(config, model_parallel=1,
                                   sequence_parallel=1, pipeline_parallel=1,
                                   expert_parallel=1)
    return config


def load_config(path: str) -> Config:
    """json file -> validated Config (reference load_config train.py:97-100
    plus typing/validation)."""
    with open(path) as fh:
        raw: Dict[str, Any] = json.load(fh)
    known = {f.name for f in dataclasses.fields(Config)}
    unknown = {k: v for k, v in raw.items() if k not in known}
    if unknown:
        warnings.warn(f"unknown config keys ignored: {sorted(unknown)}")
    kwargs = {k: v for k, v in raw.items() if k in known}
    if kwargs.get("synthetic_shape") is not None:
        kwargs["synthetic_shape"] = tuple(kwargs["synthetic_shape"])
    elif "synthetic_shape" in kwargs:
        del kwargs["synthetic_shape"]  # JSON null -> the dataclass default
    if kwargs.get("autotune_shape") is not None:
        kwargs["autotune_shape"] = tuple(kwargs["autotune_shape"])
    return Config(**kwargs).validate()
