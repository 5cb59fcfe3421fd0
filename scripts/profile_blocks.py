"""Per-block on-chip cost breakdown for MobileNetLarge3D at bench shapes.

Times jitted *prefixes* of the forward pass (block1, block1-2, ...) and the
same prefixes with a sum-loss backward, then prints per-block deltas. This
is the tunnel-safe way to localize the train step's 82 ms (bs=16): the
remote-TPU profiler trace isn't readable here, and deltas of >5 ms prefixes
sit above the tunnel-latency noise floor (CLAUDE.md).

Usage: python scripts/profile_blocks.py [--batch 16] [--frames 32]
       [--size 224] [--s2d] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.core.module import Ctx, DtypePolicy  # noqa: E402
from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D  # noqa: E402
from picklebot_tpu.ops import activations as act  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, steps=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--s2d", action="store_true")
    p.add_argument("--early-fold", action="store_true")
    args = p.parse_args()

    model = MobileNetLarge3D(num_classes=13, space_to_depth=args.s2d,
                             early_fold=args.early_fold)
    # device_put once — host-numpy params would re-transfer through the
    # tunnel on every call, swamping the measurement (see bench.py)
    params = jax.device_put(model.init(0))
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.rand(
        args.batch, args.frames, args.size, args.size, 3).astype(np.float32))

    stages = ["block1", "block2", "block3", "block4", "block5", "block6",
              "head"]

    def prefix_fwd(n_stages):
        def f(variables, x):
            cx = Ctx(model, variables["params"], variables["state"],
                     train=False, rng=None, policy=policy)
            h = x
            for name in stages[:n_stages]:
                if name == "head":
                    h = cx(model.pool, h)
                    h = act.hardswish(cx(model.fc1, h))
                    h = cx(model.fc2, h)
                elif name == "block1" and model._early_plans is not None:
                    from picklebot_tpu.ops.folded import fold_nd
                    plans = model._early_plans
                    h = cx(model.block1, fold_nd(h, plans["fold_in"]),
                           folded=plans["stem"])
                elif name == "block2" and model._early_plans is not None:
                    from picklebot_tpu.ops.folded import unfold_nd
                    plans = model._early_plans
                    for i, key in enumerate(("b0", "b1", "b2")):
                        h = cx(model.block2.layers[i], h, folded=plans[key])
                    if model._fold_span != "block4":
                        h = unfold_nd(h, plans["unfold"], 24)
                elif (name == "block3" and model._early_plans is not None
                      and model._fold_span == "block4"):
                    plans = model._early_plans
                    for i, key in enumerate(("b3_0", "b3_1", "b3_2")):
                        h = cx(model.block3.layers[i], h, folded=plans[key])
                elif (name == "block4" and model._early_plans is not None
                      and model._fold_span == "block4"):
                    h = cx(model.block4.layers[0], h,
                           folded=model._early_plans["b4_0"])
                    for layer in model.block4.layers[1:]:
                        h = cx(layer, h)
                else:
                    h = cx(getattr(model, name), h)
            return h
        return f

    print(f"# bs={args.batch} T={args.frames} {args.size}^2 bf16 "
          f"s2d={args.s2d} (ms, deltas vs previous prefix)")
    prev_f, prev_b = 0.0, 0.0
    for n in range(1, len(stages) + 1):
        f = prefix_fwd(n)
        fwd = jax.jit(f)
        t_f = timeit(fwd, params, x, steps=args.steps)

        def loss(variables, x, f=f):
            return jnp.sum(f(variables, x).astype(jnp.float32))
        bwd = jax.jit(jax.grad(loss))
        t_b = timeit(lambda v, xx: jax.tree_util.tree_leaves(bwd(v, xx))[0],
                     params, x, steps=args.steps)
        print(f"{stages[n-1]:8s} fwd {t_f:7.2f} (+{t_f - prev_f:6.2f})   "
              f"fwd+bwd {t_b:7.2f} (+{t_b - prev_b:6.2f})")
        prev_f, prev_b = t_f, t_b


if __name__ == "__main__":
    main()
