"""Step-budget accounting: where the non-conv time of the train step goes.

The per-block profile accounts for the folded blocks; this probe splits
the OTHER axis — fwd / +bwd / +optimizer — at bench shapes (Large3D
early-fold boundary span, bs=16 T=32 224^2 bf16), so the residual between
block budgets and the 33 ms step stops being guesswork. Also measures the
8-bit optimizer against fp32 AdamW (the codec is supposed to be ~free —
CLAUDE.md's arithmetic frexp/exp2 rule).

Methodology mirrors bench.py: N pipelined dispatches, one value readback
(the remote tunnel returns early from block_until_ready).

Usage: timeout 1800 python scripts/probe_step_budget.py [--batch 16]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.models.registry import initialize_model  # noqa: E402
from picklebot_tpu.train.optim import (AdamW, AdamW8bit,  # noqa: E402
                                       cosine_annealing_lr)
from picklebot_tpu.train.step import (create_train_state,  # noqa: E402
                                      make_train_step, preprocess)
from picklebot_tpu.train.losses import LOSSES, prepare_labels  # noqa: E402
from picklebot_tpu.utils.config import Config  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(x)[0],
                                     jnp.float32)))


def timeit(run, steps=10, warmup=3):
    for i in range(warmup):
        sync(run(i))
    t0 = time.perf_counter()
    out = None
    for i in range(steps):
        out = run(warmup + i)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform, flush=True)

    cfg = Config(model_name="MobileNetLarge3D", num_classes=13,
                 early_fold=True, fold_span="boundary")
    model = initialize_model(cfg)
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    feats_np = rng.randint(
        0, 255, (args.batch, args.frames, 224, 224, 3)).astype(np.uint8)
    labels_np = rng.randint(0, 13, (args.batch,)).astype(np.int32)
    feats = jax.device_put(feats_np)
    labels = jax.device_put(labels_np)
    sched = cosine_annealing_lr(3e-4, 100)
    loss_fn, acc_fn = LOSSES["CE"]

    # --- fwd only (train mode, loss value)
    def micro_loss(params, model_state, f, l, key):
        x = preprocess(f, policy.compute_dtype, None, None)
        logits, new_state = model.apply(
            {"params": params, "state": model_state}, x,
            train=True, rng=key, policy=policy)
        return jnp.mean(loss_fn(logits, prepare_labels("CE", l))), new_state

    variables = jax.device_put(model.init(0))
    fwd = jax.jit(micro_loss)
    t_fwd = timeit(lambda i: fwd(variables["params"], variables["state"],
                                 feats, labels, jax.random.key(i))[0])
    print(f"fwd+loss (train mode): {t_fwd:.2f} ms", flush=True)

    # --- fwd + bwd (grads, no optimizer)
    grad_fn = jax.jit(jax.grad(lambda p, s, f, l, k:
                               micro_loss(p, s, f, l, k)[0]))
    t_grad = timeit(lambda i: grad_fn(variables["params"],
                                      variables["state"], feats, labels,
                                      jax.random.key(i)))
    print(f"fwd+bwd (grads only):  {t_grad:.2f} ms "
          f"(bwd ~{t_grad - t_fwd:.2f})", flush=True)

    # --- full step, fp32 AdamW vs 8-bit
    feats_a = jax.device_put(feats_np[None])
    labels_a = jax.device_put(labels_np[None])
    for name, opt in (("adamw fp32", AdamW(weight_decay=5e-4)),
                      ("adamw 8bit", AdamW8bit(weight_decay=5e-4))):
        step = make_train_step(model, opt, "CE", sched, policy=policy)
        state = jax.device_put(create_train_state(model, opt,
                                                  jax.random.key(0)))

        def run(i):
            nonlocal state
            state, metrics = step(state, feats_a, labels_a,
                                  jax.random.key(i))
            return metrics["loss"]

        t = timeit(run)
        print(f"full step ({name}):  {t:.2f} ms "
              f"(opt+scan ~{t - t_grad:.2f})", flush=True)


if __name__ == "__main__":
    main()
