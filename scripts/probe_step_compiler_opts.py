"""Whole-step effect of TPU compiler options (follow-up to
probe_compiler_opts.py, which found xla_tpu_scoped_vmem_limit_kib=65536
wins 10% on the isolated folded stem conv but loses 10% on a MoViNet-style
(3,3,3) conv). Options apply per-program, so the only number that matters
is the full train/infer step at bench shapes.

Usage: timeout 3600 python scripts/probe_step_compiler_opts.py
       [--mode train|infer|both] [--batch 16]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPTS = [
    ("baseline", None),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import (create_train_state,
                                          make_predict_fn, make_train_step)

    model = MobileNetLarge3D(num_classes=13, early_fold=True,
                             fold_span="boundary")
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    shape = (args.batch, args.frames, args.size, args.size, 3)
    feats_np = rng.randint(0, 255, shape).astype(np.uint8)

    def sync(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(run, batch, steps=10, min_window=0.3, repeats=2):
        it = 0
        for _ in range(3):
            sync(run(it)); it += 1

        def window(n):
            nonlocal it
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = run(it); it += 1
            sync(out)
            return time.perf_counter() - t0

        n, dt = steps, window(steps)
        while dt < min_window:
            n *= 2
            dt = window(n)
        best = batch * n / dt
        for _ in range(repeats - 1):
            best = max(best, batch * n / window(n))
        return best

    modes = ("train", "infer") if args.mode == "both" else (args.mode,)
    for mode in modes:
        for label, opts in OPTS:
            if mode == "train":
                opt = AdamW8bit(weight_decay=5e-4)
                sched = cosine_annealing_lr(3e-4, 100)
                step = make_train_step(model, opt, "CE", sched,
                                       policy=policy, donate=False)
                state = create_train_state(model, opt, jax.random.key(0))
                feats = jax.device_put(feats_np[None])
                labels = jax.device_put(
                    rng.randint(0, 13, (1, args.batch)).astype(np.int32))
                key = jax.random.key(1)
                compiled = step.lower(state, feats, labels, key).compile(
                    compiler_options=opts)
                st = jax.device_put(state)

                def run(i, _c=compiled, _f=feats, _l=labels):
                    nonlocal st
                    st, metrics = _c(st, _f, _l, jax.random.key(i))
                    return metrics["loss"]
            else:
                predict = make_predict_fn(model, policy)
                variables = jax.device_put(model.init(0))
                feats = jax.device_put(feats_np)
                compiled = predict.lower(variables, feats).compile(
                    compiler_options=opts)

                def run(i, _c=compiled, _v=variables, _f=feats):
                    return _c(_v, _f)

            cps = timed(run, args.batch)
            print(f"{mode:5s} {label:10s} {cps:8.1f} clips/s "
                  f"({1000 * args.batch / cps:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
