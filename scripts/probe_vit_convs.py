"""Probe: MobileViT stage-1's dense local/fusion convs (round 3).

The per-stage budget (BENCH.md) puts +11.5 ms fwd+bwd on the stage-1
MobileViTBlock of which attention is 3.43 — and its conv1/conv4 are
DENSE 3x3x3 convs (48->48 and 96->48 at (8,16,28,28)): ~12.4 GFLOP each,
more FLOPs than the entire Large3D forward, at C=48 paying 128/48 = 2.7x
lane padding. A W2 channel fold (ops/folded.py geometry, stride 1 so
in-fold == out-fold == 2, kernel W-taps 3 -> 3) doubles MACs with
structural zeros but cuts lane waste to 128/96 = 1.33x — a net 1.33x
theoretical win, untested at this (stride-1, mid-C) point of the folding
design space. Measured here with in-graph-loop timing.

Usage: timeout 1800 python scripts/probe_vit_convs.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.ops.folded import (fold_nd, folded_conv_map,  # noqa: E402
                                      gather_weights, unfold_nd)

B, T, H, W = 8, 16, 28, 28


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, x, w, reps=20):
    def body(_, carry):
        out = fn(carry, w)
        s = jnp.sum(out, axis=-1, keepdims=True)
        return carry.at[:, :out.shape[1], :out.shape[2], :out.shape[3]].add(
            (1e-6 * s).astype(carry.dtype))

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def timeit_bwd(fn, x, w, reps=20):
    """Time grad-wrt-w of sum(fn(x, w)) in-graph."""
    g = jax.grad(lambda w, x: jnp.sum(fn(x, w).astype(jnp.float32)))

    def body(_, carry):
        dw = g(carry, x)
        s = jnp.sum(jnp.asarray(dw, jnp.float32))
        return carry + (1e-6 * s).astype(carry.dtype)

    looped = jax.jit(lambda w: lax.fori_loop(0, reps, body, w))
    sync(looped(w))
    t0 = time.perf_counter()
    sync(looped(w))
    return (time.perf_counter() - t0) / reps * 1e3


def make_dense(cin, cout):
    dn = lax.conv_dimension_numbers((1, 1, 1, 1, cin), (3, 3, 3, cin, cout),
                                    ("NTHWC", "THWIO", "NTHWC"))

    def f(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
    return f


def make_folded(cin, cout):
    plan = folded_conv_map((3, 3, 3), (1, 1, 1), (1, 1, 1),
                           (1, 1, 2), (1, 1, 2), cin, cout)
    dn = lax.conv_dimension_numbers(
        (1, 1, 1, 1, 2 * cin), plan.kernel + (2 * cin, 2 * cout),
        ("NTHWC", "THWIO", "NTHWC"))

    def f(x, w):
        z = fold_nd(x, (1, 1, 2))
        wf = gather_weights(plan, w).astype(x.dtype)
        z = lax.conv_general_dilated(z, wf, plan.strides, list(plan.pads),
                                     dimension_numbers=dn)
        return unfold_nd(z, (1, 1, 2), cout)
    return f


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    for name, cin, cout in (("conv1 48->48", 48, 48),
                            ("conv4 96->48", 96, 48)):
        x = jnp.asarray(rng.randn(B, T, H, W, cin) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.05, jnp.bfloat16)
        dense = make_dense(cin, cout)
        folded = make_folded(cin, cout)
        want = np.asarray(jax.jit(dense)(x, w), np.float32)
        got = np.asarray(jax.jit(folded)(x, w), np.float32)
        err = float(np.max(np.abs(got - want))) / (np.abs(want).max() or 1)
        t0f = timeit_loop(dense, x, w)
        t1f = timeit_loop(folded, x, w)
        t0b = timeit_bwd(dense, x, w)
        t1b = timeit_bwd(folded, x, w)
        print(f"{name}: dense fwd {t0f:.2f} / wgrad {t0b:.2f} ms | "
              f"W2-folded fwd {t1f:.2f} / wgrad {t1b:.2f} ms "
              f"(rel err {err:.4f})", flush=True)


if __name__ == "__main__":
    main()
