"""Per-block on-chip cost breakdown at bench shapes (Large3D + MoViNetA2).

Times jitted *prefixes* of the forward pass (block1, block1-2, ...) and the
same prefixes with a sum-loss backward, then prints per-block deltas. This
is the tunnel-safe way to localize the train step's cost: the remote-TPU
profiler trace isn't readable here, and deltas of >5 ms prefixes sit above
the tunnel-latency noise floor (CLAUDE.md).

Usage: python scripts/profile_blocks.py [--model MoViNetA2] [--batch 16]
       [--frames 32] [--size 224] [--s2d] [--steps 5] [--early-fold]
       [--per-layer]  (MoViNet: also prints every bottleneck inside stages)
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


def movinet_prefixes(model, per_layer: bool):
    """Prefix builders for MoViNetA2: each returns (name, forward_fn).
    Handles the early-fold block2 span (the bench default)."""
    from picklebot_tpu.ops.folded import fold_nd, unfold_nd
    import math as _math

    steps = []

    def stem(cx, h):
        if model._early_plans is not None:
            plans = model._early_plans
            z = fold_nd(h, plans["fold_in"])
            z = cx(model.stem_conv, z, folded=plans["stem"])
            F = _math.prod(plans["stem"].folds_out)
            z6 = cx(model.stem_bn, z.reshape(z.shape[:-1] + (F, 16)))
            return act.hardswish(z6).reshape(z.shape)
        return act.hardswish(cx(model.stem_bn, cx(model.stem_conv, h)))

    steps.append(("stem", stem))

    def block2(cx, h):
        if model._early_plans is not None:
            plans = model._early_plans
            for i, key in enumerate(("b2_0", "b2_1", "b2_2")):
                h = cx(model.block2.layers[i], h, folded=plans[key])
            assert model._fold_span == "block2", "profile: block2 span only"
            return unfold_nd(h, (1, 1, 4), 16)
        return cx(model.block2, h)

    steps.append(("block2", block2))
    for sname in ("block3", "block4", "block5", "block6"):
        stage = getattr(model, sname)
        if per_layer:
            for li in range(len(stage.layers)):
                def one(cx, h, stage=stage, li=li):
                    return cx(stage.layers[li], h)
                steps.append((f"{sname}[{li}]", one))
        else:
            def whole(cx, h, stage=stage):
                return cx(stage, h)
            steps.append((sname, whole))

    def head(cx, h):
        h = act.hardswish(cx(model.head_bn, cx(model.head_conv, h)))
        h = cx(model.pool, h)
        h = act.hardswish(cx(model.fc1_bn, cx(model.fc1, h)))
        return cx(model.fc2, h)

    steps.append(("head", head))
    return steps


def mobilevit_prefixes(model):
    """Prefix builders for MobileViT (trunk fold span — the bench
    default): folded stem chain, then per-trunk-stage bottleneck and ViT
    block, then the head. Fold/unfold transitions mirror forward()."""
    from picklebot_tpu.ops.folded import BoundaryFold, fold_nd, unfold_nd
    import jax.numpy as jnp

    ch = model._ch
    plans = model._early_plans

    def stem(cx, h):
        z = fold_nd(h, plans["fold_in"])
        z = cx(model.conv1, z, folded=plans["conv1"])
        for i, key in enumerate(("s0", "s1", "s2", "s3")):
            z = cx(model.stem[i], z, folded=plans[key])
        return z

    def t0_bneck(cx, z):
        z = cx(model.trunk[0].layers[0], z,
               folded=BoundaryFold(4, 2, ch[3], ch[4]))
        return unfold_nd(z, (1, 1, 2), ch[4])

    def t0_vit(cx, x):
        return cx(model.trunk[0].layers[1], x)

    def t1_bneck(cx, x):
        z = fold_nd(x, (1, 1, 2))
        return cx(model.trunk[1].layers[0], z,
                  folded=BoundaryFold(2, 1, ch[5], ch[6]))

    def t1_vit(cx, x):
        return cx(model.trunk[1].layers[1], x)

    def t2_bneck(cx, x):
        z = fold_nd(x, (1, 1, 2))
        return cx(model.trunk[2].layers[0], z,
                  folded=BoundaryFold(2, 1, ch[7], ch[8]))

    def t2_vit(cx, x):
        return cx(model.trunk[2].layers[1], x)

    def head(cx, x):
        x = cx(model.to_logits_conv, x)
        x = jnp.mean(x.astype(jnp.float32),
                     axis=(1, 2, 3)).astype(x.dtype)
        return cx(model.head, x)

    return [("stem", stem), ("t0_bneck", t0_bneck), ("t0_vit", t0_vit),
            ("t1_bneck", t1_bneck), ("t1_vit", t1_vit),
            ("t2_bneck", t2_bneck), ("t2_vit", t2_vit), ("head", head)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MobileNetLarge3D",
                   choices=["MobileNetLarge3D", "MoViNetA2", "MobileViT"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--s2d", action="store_true")
    p.add_argument("--early-fold", action="store_true")
    p.add_argument("--per-layer", action="store_true")
    p.add_argument("--fwd-only", action="store_true",
                   help="skip the fwd+bwd timing (inference profiling)")
    args = p.parse_args()

    if args.model == "MoViNetA2":
        from picklebot_tpu.models.movinet import MoViNetA2
        model = MoViNetA2(num_classes=13, space_to_depth=args.s2d,
                          early_fold=args.early_fold)
        params = jax.device_put(model.init(0))
        policy = DtypePolicy.bf16()
        rng = np.random.RandomState(0)
        x = jax.device_put(rng.rand(
            args.batch, args.frames, args.size, args.size,
            3).astype(np.float32))
        steps = movinet_prefixes(model, args.per_layer)

        print(f"# MoViNetA2 bs={args.batch} T={args.frames} {args.size}^2 "
              f"bf16 early_fold={args.early_fold} "
              f"(ms, deltas vs previous prefix)")
        prev_f, prev_b = 0.0, 0.0
        for n in range(1, len(steps) + 1):
            def f(variables, x, n=n):
                cx = Ctx(model, variables["params"], variables["state"],
                         train=False, rng=None, policy=policy)
                h = x
                for _, fn in steps[:n]:
                    h = fn(cx, h)
                return h
            fwd = jax.jit(f)
            t_f = timeit(fwd, params, x, steps=args.steps)
            if args.fwd_only:
                print(f"{steps[n-1][0]:10s} fwd {t_f:7.2f} "
                      f"(+{t_f - prev_f:6.2f})", flush=True)
                prev_f = t_f
                continue

            def loss(variables, x, f=f):
                return jnp.sum(f(variables, x).astype(jnp.float32))
            bwd = jax.jit(jax.grad(loss))
            t_b = timeit(lambda v, xx: jax.tree_util.tree_leaves(
                bwd(v, xx))[0], params, x, steps=args.steps)
            print(f"{steps[n-1][0]:10s} fwd {t_f:7.2f} "
                  f"(+{t_f - prev_f:6.2f})   "
                  f"fwd+bwd {t_b:7.2f} (+{t_b - prev_b:6.2f})", flush=True)
            prev_f, prev_b = t_f, t_b
        return

    if args.model == "MobileViT":
        from picklebot_tpu.models.mobilevit import (MOBILEVIT_CONFIGS,
                                                    MobileViT)
        cfgv = MOBILEVIT_CONFIGS["xxs"]
        model = MobileViT(dims=cfgv["dims"], channels=cfgv["channels"],
                          num_classes=13, early_fold=True,
                          fold_span="trunk")
        params = jax.device_put(model.init(0))
        policy = DtypePolicy.bf16()
        rng = np.random.RandomState(0)
        x = jax.device_put(rng.rand(
            args.batch, args.frames, args.size, args.size,
            3).astype(np.float32))
        steps = mobilevit_prefixes(model)

        print(f"# MobileViT-xxs bs={args.batch} T={args.frames} "
              f"{args.size}^2 bf16 trunk span "
              f"(ms, deltas vs previous prefix)")
        prev_f, prev_b = 0.0, 0.0
        for n in range(1, len(steps) + 1):
            def f(variables, x, n=n):
                cx = Ctx(model, variables["params"], variables["state"],
                         train=False, rng=None, policy=policy)
                h = x
                for _, fn in steps[:n]:
                    h = fn(cx, h)
                return h
            fwd = jax.jit(f)
            t_f = timeit(fwd, params, x, steps=args.steps)
            if args.fwd_only:
                print(f"{steps[n-1][0]:10s} fwd {t_f:7.2f} "
                      f"(+{t_f - prev_f:6.2f})", flush=True)
                prev_f = t_f
                continue

            def loss(variables, x, f=f):
                return jnp.sum(f(variables, x).astype(jnp.float32))
            bwd = jax.jit(jax.grad(loss))
            t_b = timeit(lambda v, xx: jax.tree_util.tree_leaves(
                bwd(v, xx))[0], params, x, steps=args.steps)
            print(f"{steps[n-1][0]:10s} fwd {t_f:7.2f} "
                  f"(+{t_f - prev_f:6.2f})   "
                  f"fwd+bwd {t_b:7.2f} (+{t_b - prev_b:6.2f})", flush=True)
            prev_f, prev_b = t_f, t_b
        return

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
        if args.fwd_only:
            print(f"{stages[n-1]:8s} fwd {t_f:7.2f} (+{t_f - prev_f:6.2f})",
                  flush=True)
            prev_f = t_f
            continue

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
