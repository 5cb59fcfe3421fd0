"""Probe: the folded stem conv's WEIGHT GRADIENT (round-3 follow-up).

Every round-3 stem probe attacked the forward (probe_stem2.py) — but the
per-block budget says the stem costs ~12 ms fwd+bwd vs 3.19 ms fwd, and
the stem's input gradient is dead (first layer, grads taken w.r.t. params
only, no remat), so ~8.8 ms is wgrad: 20x above its ~0.45 ms MXU floor
(wgrad FLOPs == fwd FLOPs, 89 GFLOP).

The wgrad contraction dw[dt,dh,dw',ci,co] = sum_{b,t,h,w} xp[b, 2t+dt,
2h+dh, w+dw', ci] * dy[b,t,h,w,co] has a property the forward lacks: the
stride-2 tap views become STRIDE-1 slices after a pure reshape of the
padded input (T 34 = 17x2 phases, H 226 = 113x2 phases), so each tap is a
skinny reduction GEMM (K=B*16*112*14 ~ 401k, M=48, N=128) — no strided
slices, no conv codegen. Variants below compute the identical dw.

Usage: timeout 1800 python scripts/probe_stem_wgrad.py [--batch 16]
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


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def fwd(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2, 1), [(1, 1), (1, 1), (1, 0)], dimension_numbers=DN)


def timeit_loop(fn, x, dy, reps=20):
    """Time reps in-graph iterations of dw = fn(x, dy); each iteration's dw
    feeds back into dy's top corner so nothing is dead-code-eliminated."""

    def body(_, carry):
        dw = fn(x, carry)
        s = jnp.sum(jnp.asarray(dw, jnp.float32))
        return carry.at[:1, :1, :1, :1, :].add(
            (1e-6 * s).astype(carry.dtype))

    looped = jax.jit(lambda dy: lax.fori_loop(0, reps, body, dy))
    sync(looped(dy))
    t0 = time.perf_counter()
    sync(looped(dy))
    return (time.perf_counter() - t0) / reps * 1e3


def w0_xla(x, dy):
    """What autodiff runs today: the conv VJP's wgrad."""
    _, vjp = jax.vjp(lambda w: fwd(x, w),
                     jnp.zeros((3, 3, 2, CI, CO), x.dtype))
    return vjp(dy)[0]


def _phase_views(x):
    """Padded input reshaped so every (dt, dh, dw') tap is a stride-1
    slice: (B, 17, 2, 113, 2, 15, CI)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 0), (0, 0)))
    return xp.reshape(x.shape[0], 17, 2, 113, 2, 15, CI)


def _tap(xpp, dt, dh, dw):
    t0, pt = divmod(dt, 2)
    h0, ph = divmod(dh, 2)
    return xpp[:, t0:t0 + 16, pt, h0:h0 + 112, ph, dw:dw + 14]


def w1_tapdots(x, dy):
    """18 per-tap reduction GEMMs on phase views (stride-1 slices only)."""
    xpp = _phase_views(x)
    dyf = dy.reshape(-1, CO)
    rows = []
    for dt in range(3):
        for dh in range(3):
            for dw in range(2):
                tap = _tap(xpp, dt, dh, dw).reshape(-1, CI)
                rows.append(lax.dot_general(
                    tap, dyf, (((0,), (0,)), ((), ()))))
    return jnp.stack(rows).reshape(3, 3, 2, CI, CO)


def w2_packed(x, dy):
    """Pack the 18 taps into one 864-channel patch tensor (concat of
    stride-1 phase views), then a single (864 x 401k)@(401k x 128) GEMM."""
    xpp = _phase_views(x)
    cols = [_tap(xpp, dt, dh, dw)
            for dt in range(3) for dh in range(3) for dw in range(2)]
    p = jnp.concatenate(cols, axis=-1).reshape(-1, 18 * CI)
    dw_flat = lax.dot_general(p, dy.reshape(-1, CO), (((0,), (0,)), ((), ())))
    return dw_flat.reshape(3, 3, 2, CI, CO)


def w3_wpair(x, dy):
    """9 GEMMs with the 2 W-taps packed along M (96 rows per GEMM)."""
    xpp = _phase_views(x)
    dyf = dy.reshape(-1, CO)
    rows = []
    for dt in range(3):
        for dh in range(3):
            pair = jnp.concatenate(
                [_tap(xpp, dt, dh, 0), _tap(xpp, dt, dh, 1)], axis=-1)
            rows.append(lax.dot_general(
                pair.reshape(-1, 2 * CI), dyf, (((0,), (0,)), ((), ()))))
    return jnp.stack(rows).reshape(3, 3, 2, CI, CO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    global B_
    B_ = args.batch
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B_, T_, H_, WB, CI) * 0.1, jnp.bfloat16)
    dy = jnp.asarray(rng.randn(B_, T_ // 2, H_ // 2, WB, CO) * 0.1,
                     jnp.bfloat16)

    want = np.asarray(jax.jit(w0_xla)(x, dy), np.float32)
    scale = float(np.max(np.abs(want))) or 1.0
    base = timeit_loop(w0_xla, x, dy)
    print(f"w0 XLA conv-VJP wgrad: {base:.2f} ms", flush=True)
    for name, fn in [("w1 18 tap-dots", w1_tapdots),
                     ("w2 packed 864-chan GEMM", w2_packed),
                     ("w3 9 W-paired dots", w3_wpair)]:
        try:
            got = np.asarray(jax.jit(fn)(x, dy), np.float32)
            rel = float(np.max(np.abs(got - want))) / scale
            t = timeit_loop(fn, x, dy)
            print(f"{name}: {t:.2f} ms (rel err {rel:.4f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
