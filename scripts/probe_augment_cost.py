"""On-chip cost of in-graph training augmentation (data/augment.py).

Measures the bench-shape Large3D train step with augmentation off vs all
three augmentations on (flip + crop 8 + brightness 0.2). Same harness as
probe_step_compiler_opts (pipelined dispatch, value-readback sync).

Usage: timeout 2400 python scripts/probe_augment_cost.py [--batch 16]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.data.augment import Augment
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import create_train_state, make_train_step

    model = MobileNetLarge3D(num_classes=13, early_fold=True,
                             fold_span="boundary")
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    shape = (args.batch, args.frames, args.size, args.size, 3)
    feats_np = rng.randint(0, 255, shape).astype(np.uint8)

    def sync(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(run, steps=10, min_window=0.3, repeats=2):
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
        best = args.batch * n / dt
        for _ in range(repeats - 1):
            best = max(best, args.batch * n / window(n))
        return best

    for label, aug in (("augment_off", None),
                       ("augment_all", Augment(flip=True, crop=8,
                                               brightness=0.2))):
        opt = AdamW8bit(weight_decay=5e-4)
        sched = cosine_annealing_lr(3e-4, 100)
        step = make_train_step(model, opt, "CE", sched, policy=policy,
                               donate=False, augment=aug)
        st = jax.device_put(create_train_state(model, opt,
                                               jax.random.key(0)))
        feats = jax.device_put(feats_np[None])
        labels = jax.device_put(
            rng.randint(0, 13, (1, args.batch)).astype(np.int32))

        def run(i, _s=step, _f=feats, _l=labels):
            nonlocal st
            st, metrics = _s(st, _f, _l, jax.random.key(i))
            return metrics["loss"]

        cps = timed(run)
        print(f"{label:12s} {cps:8.1f} clips/s "
              f"({1000 * args.batch / cps:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
