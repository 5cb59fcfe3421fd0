"""Probe XLA reformulations of the folded stem conv (round-3 VERDICT #2).

The folded stem (W-fold 16) is a dense (3,3,2)-kernel (2,2,1)-strided
48->128 conv over (B, 32, 224, 14, 48) that XLA runs in ~4.5 ms at bs=16 —
3x above its ~1.5 ms roofline (docs/BENCH.md). MXU floor is ~0.45 ms
(89 GFLOP of dense-folded MACs), HBM floor ~0.32 ms (154 MB in + 103 MB
out). Each variant below computes the IDENTICAL math; timing uses an
in-graph fori_loop so tunnel dispatch latency can't pollute the numbers.

Usage: timeout 1800 python scripts/probe_stem2.py [--batch 16]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B_, T_, H_, WB, CI, CO = 16, 32, 224, 14, 48, 128
DN = lax.conv_dimension_numbers((1, 1, 1, 1, CI), (3, 3, 2, CI, CO),
                                ("NTHWC", "THWIO", "NTHWC"))
DN_T1 = lax.conv_dimension_numbers((1, 1, 1, 1, CI), (1, 3, 2, CI, CO),
                                   ("NTHWC", "THWIO", "NTHWC"))
DN_TW1 = lax.conv_dimension_numbers((1, 1, 1, 1, CI), (1, 3, 1, CI, CO),
                                    ("NTHWC", "THWIO", "NTHWC"))


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, x, w, reps=20):
    def body(_, carry):
        out = fn(carry, w)
        # data-depend the next iteration on ALL output channels (sum) so
        # nothing is dead-code-eliminated; shapes: out (B,16,112,14,128)
        # feeds back into the (B,32,224,14,48) input's top corner
        s = jnp.sum(out, axis=-1, keepdims=True)
        return carry.at[:, :16, :112, :, :].add(
            (1e-6 * s).astype(carry.dtype))

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def v0_dense(x, w):
    """Baseline: what ops/conv.py runs today."""
    return lax.conv_general_dilated(
        x, w, (2, 2, 1), [(1, 1), (1, 1), (1, 0)], dimension_numbers=DN)


def v1_patches_dot(x, w):
    """im2col via conv_general_dilated_patches + one dense dot."""
    p = lax.conv_general_dilated_patches(
        x, (3, 3, 2), (2, 2, 1), [(1, 1), (1, 1), (1, 0)],
        dimension_numbers=DN)                    # (B, 16, 112, 14, 864)
    wm = jnp.moveaxis(w, 3, 0).reshape(CI * 3 * 3 * 2, CO)
    return jnp.einsum("bthwk,kc->bthwc", p, wm)


def v2_w_split(x, w):
    """Split the 2 W-taps: two (3,3,1) convs on Wb-shifted inputs."""
    x_m1 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :, :-1]
    out = lax.conv_general_dilated(
        x_m1, w[:, :, :1], (2, 2, 1), [(1, 1), (1, 1), (0, 0)],
        dimension_numbers=DN)
    out += lax.conv_general_dilated(
        x, w[:, :, 1:], (2, 2, 1), [(1, 1), (1, 1), (0, 0)],
        dimension_numbers=DN)
    return out


def v3_t_split(x, w):
    """T phases via pure reshape: 3 stride-1-in-T convs of kernel (1,3,2).

    out frame t needs in frames 2t+dt-1: dt=1 -> even phase frame t;
    dt=0/2 -> odd phase frames t-1 / t."""
    xr = x.reshape(B_, T_ // 2, 2, H_, WB, CI)
    xe, xo = xr[:, :, 0], xr[:, :, 1]
    pads = [(1, 1), (1, 0)]

    def c(inp, tap):
        return lax.conv_general_dilated(
            inp, w[tap:tap + 1], (1, 2, 1), [(0, 0)] + pads,
            dimension_numbers=DN_T1)

    xo_m1 = jnp.pad(xo, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
    return c(xo_m1, 0) + c(xe, 1) + c(xo, 2)


def v4_th_split(x, w):
    """T AND H phases via reshape+slice: 9 stride-1 convs of kernel (1,1,2).
    (The round-2 parity probe split H/W but kept the strided T window —
    this one removes every stride.)"""
    xr = x.reshape(B_, T_ // 2, 2, H_ // 2, 2, WB, CI)
    ph = {(pt, phh): xr[:, :, pt, :, phh] for pt in (0, 1) for phh in (0, 1)}

    def shift_t(a):
        return jnp.pad(a, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]

    def shift_h(a):
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))[:, :, :-1]

    out = None
    for dt in range(3):
        pt, st = (1, True) if dt == 0 else ((0, False) if dt == 1
                                            else (1, False))
        for dh in range(3):
            phh, sh = (1, True) if dh == 0 else ((0, False) if dh == 1
                                                 else (1, False))
            a = ph[(pt, phh)]
            if st:
                a = shift_t(a)
            if sh:
                a = shift_h(a)
            o = lax.conv_general_dilated(
                a, w[dt:dt + 1, dh:dh + 1], (1, 1, 1),
                [(0, 0), (0, 0), (1, 0)], dimension_numbers=DN_T1)
            out = o if out is None else out + o
    return out


def v5_slices_dot(x, w):
    """Explicit 18-slice patches + one dot_general (XLA decides fusion)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 0), (0, 0)))
    cols = []
    for dt in range(3):
        for dh in range(3):
            for dw in range(2):
                cols.append(lax.slice(
                    xp, (0, dt, dh, dw, 0),
                    (B_, dt + 2 * 16 - 1, dh + 2 * 112 - 1, dw + WB, CI),
                    (1, 2, 2, 1, 1)))
    p = jnp.concatenate(cols, axis=-1)           # (B, 16, 112, 14, 864)
    wm = jnp.stack([w[dt, dh, dw]
                    for dt in range(3) for dh in range(3)
                    for dw in range(2)]).reshape(18 * CI, CO)
    return jnp.einsum("bthwk,kc->bthwc", p, wm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    global B_
    B_ = args.batch
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B_, T_, H_, WB, CI) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 2, CI, CO) * 0.05, jnp.bfloat16)

    want = np.asarray(jax.jit(v0_dense)(x, w), np.float32)
    base = timeit_loop(v0_dense, x, w)
    print(f"v0 dense folded conv: {base:.2f} ms", flush=True)
    for name, fn in [("v1 patches+dot", v1_patches_dot),
                     ("v2 W-split 2x(3,3,1)", v2_w_split),
                     ("v3 T-split 3x(1,3,2)", v3_t_split),
                     ("v4 TH-split 9x(1,1,2)", v4_th_split),
                     ("v5 18-slice+dot", v5_slices_dot)]:
        try:
            got = np.asarray(jax.jit(fn)(x, w), np.float32)
            err = float(np.max(np.abs(got - want)))
            t = timeit_loop(fn, x, w)
            print(f"{name}: {t:.2f} ms (err {err:.4f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
