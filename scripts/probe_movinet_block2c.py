"""Round-3 probe: tap->channel packing for MoViNetA2's folded b2_1/b2_2.

probe_movinet_block2.py established both convs run ~7x above their MXU
floor (b2_1: 3.97 ms fwd vs ~0.56 floor) and probe_movinet_block2b.py
showed spatial reorders (wbmajor) and split-taps (t2d/wb2d) don't move it.
Untried family: CONCATENATE shifted copies of the input along channels so
the conv's window shrinks and its contraction dim grows lane-dense —
forcing XLA toward an implicit-GEMM strategy instead of whatever it picks
for a (3,3,3) window with a 14-wide minor spatial dim:

  dense   — shipping formulation: (3,3,3) conv over (B,32,56,14,C)
  tcat    — kt taps into channels: one (3,3) conv over (B*T,56,14,3C)
  thcat   — kt,kh taps into channels: one (1,3) conv over (B*T,56,14,9C)
  im2col  — all taps into channels: one matmul (B*T*56*14, 27C) @ (27C, O)

Extra HBM traffic for the concatenated tensors is paid knowingly: these
convs sit ~15x above their HBM floor, so bandwidth headroom exists if the
GEMM strategy lands. All variants exact vs dense (max-abs printed).

Usage: timeout 2400 python scripts/probe_movinet_block2c.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.models.movinet import _early_fold_plans_a2  # noqa: E402
from picklebot_tpu.ops.folded import gather_weights  # noqa: E402

B = 8


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, x, w, reps=10):
    def body(_, carry):
        out = fn(carry, w)
        s = jnp.sum(out, axis=-1, keepdims=True)
        sl = tuple(slice(0, min(cd, sd))
                   for cd, sd in zip(carry.shape, s.shape))
        return carry.at[sl].add((1e-6 * s[sl]).astype(carry.dtype))

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def timeit_grad(fn, x, w, reps=10):
    def loss(x, w):
        return jnp.sum(fn(x, w).astype(jnp.float32))
    g = jax.grad(loss, argnums=(0, 1))

    def body(_, carry):
        gx, gw = g(carry, w)
        carry = carry + (1e-6 * gx).astype(carry.dtype)
        return carry + jnp.sum(gw).astype(carry.dtype) * 1e-12

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def shifts(x, k, p, axis):
    """k aligned copies of x shifted along axis (tap d reads index i+d-p)."""
    outs = []
    n = x.shape[axis]
    for d in range(k):
        off = d - p
        npad = [(0, 0)] * x.ndim
        if off < 0:
            npad[axis] = (-off, 0)
            xs = lax.slice_in_dim(jnp.pad(x, npad), 0, n, axis=axis)
        elif off > 0:
            npad[axis] = (0, off)
            xs = lax.slice_in_dim(jnp.pad(x, npad), off, off + n, axis=axis)
        else:
            xs = x
        outs.append(xs)
    return outs


def make_variants(plan):
    kt, kh, kw = plan.kernel
    pads = list(plan.pads)
    st = plan.strides
    assert st == (1, 1, 1), "tap-concat probe: stride-1 convs only"

    def dense(x, wf):
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, x.shape[-1]), wf.shape, ("NTHWC", "THWIO", "NTHWC"))
        return lax.conv_general_dilated(
            x, wf, st, pads, dimension_numbers=dn)

    def tcat(x, wf):
        b, t = x.shape[0], x.shape[1]
        xs = jnp.concatenate(shifts(x, kt, pads[0][0], 1), axis=-1)
        xs2 = xs.reshape((b * t,) + xs.shape[2:])
        wcat = jnp.concatenate([wf[d] for d in range(kt)], axis=-2)
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, xs2.shape[-1]), wcat.shape, ("NHWC", "HWIO", "NHWC"))
        o = lax.conv_general_dilated(
            xs2, wcat, st[1:], pads[1:], dimension_numbers=dn)
        return o.reshape((b, t) + o.shape[1:])

    def thcat(x, wf):
        b, t = x.shape[0], x.shape[1]
        cols = []
        wcols = []
        for dt in range(kt):
            xt = shifts(x, kt, pads[0][0], 1)[dt]
            for dh in range(kh):
                cols.append(shifts(xt, kh, pads[1][0], 2)[dh])
                wcols.append(wf[dt, dh])          # (kw, C, O)
        xs = jnp.concatenate(cols, axis=-1)
        xs2 = xs.reshape((b * t,) + xs.shape[2:])
        wcat = jnp.concatenate(wcols, axis=-2)[None]   # (1, kw, kt*kh*C, O)
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, xs2.shape[-1]), wcat.shape, ("NHWC", "HWIO", "NHWC"))
        o = lax.conv_general_dilated(
            xs2, wcat, (1, 1), [(0, 0), pads[2]], dimension_numbers=dn)
        return o.reshape((b, t) + o.shape[1:])

    def im2col(x, wf):
        cols = []
        wcols = []
        for dt in range(kt):
            xt = shifts(x, kt, pads[0][0], 1)[dt]
            for dh in range(kh):
                xh = shifts(xt, kh, pads[1][0], 2)[dh]
                for dw in range(kw):
                    cols.append(shifts(xh, kw, pads[2][0], 3)[dw])
                    wcols.append(wf[dt, dh, dw])   # (C, O)
        xs = jnp.concatenate(cols, axis=-1)        # (B,T,H,Wb, ktap*C)
        wcat = jnp.concatenate(wcols, axis=0)      # (ktap*C, O)
        return jnp.einsum("bthwc,co->bthwo", xs, wcat)

    return dense, tcat, thcat, im2col


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    plans = _early_fold_plans_a2()
    rng = np.random.RandomState(0)
    shapes = {"b2_1": (B, 32, 56, 14, 64), "b2_2": (B, 32, 56, 14, 64)}
    for name in ("b2_1", "b2_2"):
        plan = plans[name]
        x = jnp.asarray(rng.rand(*shapes[name]) * 0.1, jnp.bfloat16)
        nflat = int(plan.idx.max())
        wflat = jnp.asarray(rng.randn(nflat) * 0.05, jnp.float32)
        wf = gather_weights(plan, wflat).astype(jnp.bfloat16)

        dense, tcat, thcat, im2col = make_variants(plan)
        want = np.asarray(jax.jit(dense)(x, wf), np.float32)
        res = [f"{name}: dense f {timeit_loop(dense, x, wf):5.2f} "
               f"f+b {timeit_grad(dense, x, wf):5.2f}"]
        for vname, fn in (("tcat", tcat), ("thcat", thcat),
                          ("im2col", im2col)):
            got = np.asarray(jax.jit(fn)(x, wf), np.float32)
            err = float(np.max(np.abs(got - want)))
            res.append(f"{vname} f {timeit_loop(fn, x, wf):5.2f} "
                       f"f+b {timeit_grad(fn, x, wf):5.2f} (e{err:.3f})")
        print(" | ".join(res), flush=True)


if __name__ == "__main__":
    main()
