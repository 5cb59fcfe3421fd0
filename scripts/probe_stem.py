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
                (1, 1, 16))))

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
                                         (1, 1, 16))), x32)
    print(f"fold_nd f32->bf16 alone        {t:7.2f}")
    t = timeit(jax.jit(folded_conv), xf)
    print(f"folded conv, pre-folded input  {t:7.2f}")
    t = timeit(jax.jit(lambda x: folded_conv(
        fold_nd(x.astype(jnp.bfloat16), (1, 1, 16)))), x32)
    print(f"fold + conv fused (model path) {t:7.2f}")
    t = timeit(jax.jit(plain_conv), x32)
    print(f"plain stride-2 stem conv       {t:7.2f}")

    # parity decomposition: the strided (T,H) window splits into 4
    # STRIDE-1 convs over the T/H parity planes (slices partition the
    # input, so total MACs and bytes are unchanged — only the conv
    # becomes XLA's best case)
    def parity_conv(z):
        # out[t',h'] = sum_{dt,dh,dw} zpad[2t'+dt, 2h'+dh, w'+dw-1]·w[...]
        # split zpad by (T,H) parity: even planes carry taps {0,2} (k=2,
        # stride 1), odd planes the center tap {1} (k=1)
        z = z.astype(jnp.bfloat16)
        wb = jnp.asarray(gather_weights(plan, w), jnp.bfloat16)  # (3,3,2,..)
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        to, ho = T // 2, S // 2
        pieces = []
        for tp in (0, 1):
            for hp in (0, 1):
                zs = zp[:, tp::2, hp::2]
                kt = (0, 2) if tp == 0 else (1,)
                kh = (0, 2) if hp == 0 else (1,)
                wk = wb[jnp.asarray(kt)][:, jnp.asarray(kh)]
                dn = lax.conv_dimension_numbers(
                    (1, 1, 1, 1, 48), wk.shape, ("NTHWC", "THWIO", "NTHWC"))
                out = lax.conv_general_dilated(
                    zs, wk, (1, 1, 1), [(0, 0), (0, 0), (1, 0)],
                    dimension_numbers=dn)
                pieces.append(out[:, :to, :ho])
        return sum(pieces)

    want = jax.jit(folded_conv)(xf)
    got = jax.jit(parity_conv)(xf)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    t = timeit(jax.jit(parity_conv), xf)
    print(f"parity-split stride-1 convs     {t:7.2f}   (max err {err:.2e})")

    # uint8 path (bench/train): preprocess normalize + fold + conv
    xu8 = jax.device_put(rng.randint(0, 255, (B, T, S, S, 3)).astype(np.uint8))

    def pre(x):
        return (x.astype(jnp.bfloat16) / 255.0 - 0.5) / 0.25

    t = timeit(jax.jit(lambda x: folded_conv(fold_nd(pre(x), (1, 1, 16)))),
               xu8)
    print(f"uint8 pre + fold + conv        {t:7.2f}")
    t = timeit(jax.jit(lambda x: plain_conv(pre(x))), xu8)
    print(f"uint8 pre + plain conv         {t:7.2f}")


if __name__ == "__main__":
    main()
