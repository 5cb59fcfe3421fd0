"""Benchmark: MobileNetLarge3D training-step throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's profiled steady state (SURVEY.md §6 /
BASELINE.md): MobileNetLarge3D, 13 classes, batch 16, bf16, CrossEntropy,
full forward + backward + 8-bit AdamW update. The reference sustains
~2.1 clips/s/GPU (train_stats.prof: ~7.5 s/batch of 16 on the training GPU);
vs_baseline = our clips/s/chip divided by 2.1.

Data is pre-placed on device so the number measures compute, not the host
tunnel; input clips are T=32 frames at 224x224 (a ~1s pitch clip at 30fps —
the artifact doesn't record the exact T the reference used; fixed here for
reproducibility across rounds).

Usage: python bench.py [--mode train|infer] [--batch 16] [--frames 32]
                       [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC = 2.1  # reference steady-state train step (BASELINE.md)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train", choices=["train", "infer"])
    p.add_argument("--model", default="MobileNetLarge3D",
                   help="any registry model (MobileViT uses xxs dims)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--s2d", action="store_true",
                   help="space-to-depth stem (exact rewrite; MobileNet3D)")
    p.add_argument("--early-fold", dest="early_fold", action="store_true",
                   default=None,
                   help="lane-folded stem+block2 (exact; MobileNetLarge3D)")
    p.add_argument("--no-early-fold", dest="early_fold", action="store_false")
    p.add_argument("--fold-span", default=None,
                   help="fold depth (Large3D: block2|block4|boundary)")
    args = p.parse_args()
    # measured per-(model, batch, mode) plan defaults live in ONE place —
    # utils/autotune.py default_plan (the static table backing the
    # cudnn.benchmark-analog autotuner); the evidence is in docs/BENCH.md.
    # Every plan is an exact rewrite (tests/test_early_fold*.py), so the
    # flags only move throughput.
    from picklebot_tpu.utils.autotune import default_plan
    plan_early, plan_span = default_plan(args.model, args.batch, args.mode)
    if args.fold_span is None:
        args.fold_span = plan_span
    if args.early_fold is None:
        args.early_fold = plan_early

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import (create_train_state, make_predict_fn,
                                          make_train_step)
    from picklebot_tpu.utils.config import Config

    cfg = Config(model_name=args.model, num_classes=13,
                 dims=[64, 80, 96],
                 channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320],
                 space_to_depth=args.s2d, early_fold=args.early_fold,
                 fold_span=args.fold_span)
    model = initialize_model(cfg)
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    # MobileViTV2 is the zoo's 2D image classifier (reference
    # mobilevitv2.py:266-305, (B, H, W, C) input, no clip dim)
    is_image = args.model == "MobileViTV2"
    shape = ((args.batch, args.size, args.size, 3) if is_image
             else (args.batch, args.frames, args.size, args.size, 3))
    feats_np = rng.randint(0, 255, shape).astype(np.uint8)

    if args.mode == "train":
        opt = AdamW8bit(weight_decay=5e-4)
        sched = cosine_annealing_lr(3e-4, 100)
        step = make_train_step(model, opt, "CE", sched, policy=policy)
        state = create_train_state(model, opt, jax.random.key(0))
        feats = jax.device_put(feats_np[None])          # accum=1
        labels = jax.device_put(
            rng.randint(0, 13, (1, args.batch)).astype(np.int32))

        def run(i):
            nonlocal state
            state, metrics = step(state, feats, labels, jax.random.key(i))
            return metrics["loss"]
    else:
        predict = make_predict_fn(model, policy)
        # device_put once — host-numpy params would re-transfer every call
        variables = jax.device_put(model.init(0))
        feats = jax.device_put(feats_np)

        def run(i):
            return predict(variables, feats)

    def sync(out):
        # a value readback is the only reliable barrier here: the
        # environment's remote-TPU tunnel returns from block_until_ready
        # before execution completes
        return float(jnp.sum(jnp.asarray(out, jnp.float32)))

    for i in range(args.warmup):
        sync(run(i))
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = run(args.warmup + i)
    sync(out)
    dt = (time.perf_counter() - t0) / args.steps
    clips_per_sec = args.batch / dt

    name = ("train step fwd+bwd+adamw8bit" if args.mode == "train"
            else "batched inference")
    tdesc = "" if is_image else f"T={args.frames} "
    sample = "images" if is_image else "clips"
    print(json.dumps({
        "metric": f"{sample}/sec/chip ({args.model} {name}, "
                  f"bs={args.batch} {tdesc}{args.size}x{args.size} "
                  f"bf16)",
        "value": round(clips_per_sec, 2),
        "unit": "images/s" if is_image else "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
