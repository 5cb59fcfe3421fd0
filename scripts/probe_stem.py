"""Decompose the folded stem's on-chip cost (it's ~40% of the train step).

Pieces, each jitted separately at bench shapes (bs=16 T=32 224^2):
  fold       — fold_nd(x, (1,2,16)) alone (should be ~free: W phases are
               contiguous; H fold interleaves row pairs)
  conv       — the folded stem conv on a PRE-folded input
  fold+conv  — both fused in one jit (what the model runs)
  plain      — the canonical stride-2 stem conv for reference
Run with f32 input (profile_blocks convention) and uint8->preprocess
(bench/train convention).

Usage: python scripts/probe_stem.py [--batch 16] [--frames 32] [--size 224]
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

from jax import lax  # noqa: E402

from picklebot_tpu.models.mobilenet3d import _early_fold_plans  # noqa: E402
from picklebot_tpu.ops.folded import fold_nd, gather_weights  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, steps=10, warmup=3):
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
    args = p.parse_args()
    B, T, S = args.batch, args.frames, args.size

    plan = _early_fold_plans("w")["stem"]
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 16).astype(np.float32) * 0.1)
    wf = jnp.asarray(gather_weights(plan, w), jnp.bfloat16)

    x32 = jax.device_put(rng.rand(B, T, S, S, 3).astype(np.float32))
    xf = jax.device_put(np.asarray(
        fold_nd(jnp.asarray(rng.rand(B, T, S, S, 3), jnp.bfloat16),
                (1, 2, 16))))

    def folded_conv(z):
        dn = lax.conv_dimension_numbers((1, 1, 1, 1, z.shape[-1]), wf.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
        return lax.conv_general_dilated(z.astype(jnp.bfloat16), wf,
                                        plan.strides, list(plan.pads),
                                        dimension_numbers=dn)

    def plain_conv(x):
        wb = w.astype(jnp.bfloat16)
        dn = lax.conv_dimension_numbers((1, 1, 1, 1, 3), wb.shape,
                                        ("NTHWC", "THWIO", "NTHWC"))
        return lax.conv_general_dilated(x.astype(jnp.bfloat16), wb,
                                        (2, 2, 2), [(1, 1)] * 3,
                                        dimension_numbers=dn)

    print(f"# bs={B} T={T} {S}^2 (ms)")
    t = timeit(jax.jit(lambda x: fold_nd(x.astype(jnp.bfloat16),
                                         (1, 2, 16))), x32)
    print(f"fold_nd f32->bf16 alone        {t:7.2f}")
    t = timeit(jax.jit(folded_conv), xf)
    print(f"folded conv, pre-folded input  {t:7.2f}")
    t = timeit(jax.jit(lambda x: folded_conv(
        fold_nd(x.astype(jnp.bfloat16), (1, 2, 16)))), x32)
    print(f"fold + conv fused (model path) {t:7.2f}")
    t = timeit(jax.jit(plain_conv), x32)
    print(f"plain stride-2 stem conv       {t:7.2f}")

    # uint8 path (bench/train): preprocess normalize + fold + conv
    xu8 = jax.device_put(rng.randint(0, 255, (B, T, S, S, 3)).astype(np.uint8))

    def pre(x):
        return (x.astype(jnp.bfloat16) / 255.0 - 0.5) / 0.25

    t = timeit(jax.jit(lambda x: folded_conv(fold_nd(pre(x), (1, 2, 16)))),
               xu8)
    print(f"uint8 pre + fold + conv        {t:7.2f}")
    t = timeit(jax.jit(lambda x: plain_conv(pre(x))), xu8)
    print(f"uint8 pre + plain conv         {t:7.2f}")


if __name__ == "__main__":
    main()
