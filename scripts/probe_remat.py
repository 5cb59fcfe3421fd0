"""On-chip probe: activation-remat memory/time trade on the train step.

Run on the real TPU (the savings are realized by XLA:TPU's memory-aware
scheduler; XLA:CPU's buffer assignment does NOT exhibit them — measured
2026-08-18: a 16-layer MLP chain showed plain 285 MB vs per-layer-checkpoint
537 MB temp on CPU because the recomputes all get hoisted to the start of
the backward, while the TPU scheduler places each recompute right before
the layer's backward).

For remat depth 0/1/2 on the flagship MobileNetLarge3D train step
(bs/T/H configurable), prints one JSON line per depth with the compiled
memory analysis (temp/argument/output bytes) and a timed step.

Usage:  python scripts/probe_remat.py [--batch 16] [--frames 32] [--hw 224]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--depths", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--early-fold", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import create_train_state, make_train_step

    model = MobileNetLarge3D(num_classes=13, early_fold=args.early_fold)
    opt = AdamW8bit(weight_decay=5e-4)
    sched = cosine_annealing_lr(3e-4, 100)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randint(
        0, 255, (1, args.batch, args.frames, args.hw, args.hw, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 13, (1, args.batch)), jnp.int32)
    state0 = create_train_state(model, opt, 0)

    for depth in args.depths:
        step = make_train_step(model, opt, "CE", sched,
                               policy=DtypePolicy.bf16(), donate=False,
                               remat=depth)
        t0 = time.time()
        compiled = step.lower(state0, feats, labels,
                              jax.random.key(1)).compile()
        compile_s = time.time() - t0
        ma = compiled.memory_analysis()
        state, metrics = compiled(state0, feats, labels, jax.random.key(1))
        float(jnp.sum(metrics["loss"]))  # sync through the tunnel
        t0 = time.time()
        n = 5
        for i in range(n):
            state, metrics = compiled(state, feats, labels, jax.random.key(i))
        float(jnp.sum(metrics["loss"]))
        dt = (time.time() - t0) / n
        print(json.dumps({
            "remat": depth,
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "arg_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "out_mb": round(ma.output_size_in_bytes / 1e6, 1),
            "step_ms": round(dt * 1e3, 2),
            "clips_per_s": round(args.batch / dt, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
