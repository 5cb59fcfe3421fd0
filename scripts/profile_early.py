"""Micro-decomposition of the early-stage cost (stem + block2) on-chip.

profile_blocks.py showed MobileNetLarge3D's 79 ms train step is ~85% stem +
block2 (C=16/24 @ 112^2/56^2). This script times the individual pieces —
stem conv plain vs space-to-depth, BN+hardswish elementwise, each block2
bottleneck fwd and fwd+bwd — to locate the binding constraint (MXU conv
layout vs VPU lane padding vs HBM traffic).

Usage: python scripts/profile_early.py [--batch 16] [--frames 32] [--size 224]
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

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.ops import activations as act  # noqa: E402
from picklebot_tpu.ops.bottleneck import Bottleneck3D  # noqa: E402
from picklebot_tpu.ops.conv import Conv3d  # noqa: E402
from picklebot_tpu.ops.norm import BatchNorm  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(
        jax.tree_util.tree_leaves(x)[0], jnp.float32)))


def timeit(fn, *args, steps=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def bench_module(name, mod, xshape, policy, train_bwd=True, dtype=np.float32):
    v = jax.device_put(mod.init(0))
    x = jax.device_put(
        np.random.RandomState(0).rand(*xshape).astype(dtype))
    fwd = jax.jit(lambda v, x: mod.apply(v, x, train=False, policy=policy)[0])
    t_f = timeit(fwd, v, x)
    line = f"{name:34s} fwd {t_f:7.2f} ms"
    if train_bwd:
        def loss(v, x):
            return jnp.sum(mod.apply(
                v, x, train=False, policy=policy)[0].astype(jnp.float32))
        bwd = jax.jit(jax.grad(loss))
        t_b = timeit(bwd, v, x)
        line += f"   grad {t_b:7.2f} ms"
    print(line)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()
    policy = DtypePolicy.bf16()
    B, T, S = args.batch, args.frames, args.size
    T2, S2 = T // 2, S // 2

    # 1. stem conv alone: plain vs space-to-depth
    bench_module("stem conv plain", Conv3d(3, 16, 3, stride=2, padding=1),
                 (B, T, S, S, 3), policy)
    bench_module("stem conv s2d",
                 Conv3d(3, 16, 3, stride=2, padding=1, space_to_depth=True),
                 (B, T, S, S, 3), policy)

    # 2. BN + hardswish elementwise at stem-output shape (C=16 @ 112^2)
    bn = BatchNorm(16)
    vbn = jax.device_put(bn.init(0))
    h = jax.device_put(np.random.RandomState(1).rand(
        B, T2, S2, S2, 16).astype(np.float32))
    f_bn = jax.jit(lambda v, x: act.hardswish(
        bn.apply(v, x, train=False, policy=policy)[0]))
    print(f"{'BN+hardswish C16@112^2':34s} fwd {timeit(f_bn, vbn, h):7.2f} ms")

    # 2b. pure elementwise (relu) on the same tensor, bf16 in/out
    hb = h.astype(jnp.bfloat16)
    f_ew = jax.jit(lambda x: jnp.maximum(x, 0))
    print(f"{'relu C16@112^2 bf16':34s} fwd {timeit(f_ew, hb):7.2f} ms")

    # 2c. same element count, lane-friendly shape (C=128)
    hc = jax.device_put(np.random.RandomState(2).rand(
        B, T2, S2, S2 // 8, 128).astype(np.float32)).astype(jnp.bfloat16)
    print(f"{'relu C128 same elems':34s} fwd {timeit(f_ew, hc):7.2f} ms")

    # 3. block2 bottlenecks individually (Large3D geometry)
    bench_module("B(16,16,16,s1)@112^2",
                 Bottleneck3D(16, 16, 16, stride=1, nonlinearity=act.relu,
                              dropout=0.0),
                 (B, T2, S2, S2, 16), policy)
    bench_module("B(16,24,64,s2)@112^2",
                 Bottleneck3D(16, 24, 64, stride=2, nonlinearity=act.relu,
                              dropout=0.0),
                 (B, T2 + 2, S2, S2, 16), policy)
    bench_module("B(24,24,72,s1)@56^2",
                 Bottleneck3D(24, 24, 72, stride=1, nonlinearity=act.relu,
                              dropout=0.0),
                 (B, (T2 + 2) // 2 + 2, S2 // 2, S2 // 2, 24), policy)


if __name__ == "__main__":
    main()
