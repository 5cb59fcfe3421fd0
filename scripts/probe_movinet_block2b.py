"""Round-2 probe of MoViNetA2 folded-block2 conv reformulations.

probe_movinet_block2.py showed XLA runs the folded convs 7-27x above both
the MXU and HBM rooflines (b2_1, a vanilla stride-1 (3,3,3) 64->160 conv
over (8,32,56,14,64), takes 3.94 ms vs a 0.56 ms MXU floor). Suspects: the
tiny minor spatial dim (Wb=14) degrading XLA's window tiling, and 3D conv
lowering. Variants (all exact, verified vs dense):

  dense     — shipping formulation (B,T,H,Wb,C), kernel (kt,kh,Kw)
  wbmajor   — spatial order swapped to (B,T,Wb,H,C): H=56 becomes the
              minor spatial dim (transpose cost EXCLUDED — if this wins,
              block2 would keep the layout end-to-end)
  t2d       — kt shifted slices summed, each a 2D conv over (B*T,H,Wb,C)
  wb2d      — both: 2D convs in (B*T,Wb,H,C)

Usage: timeout 2400 python scripts/probe_movinet_block2b.py
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


def make_variants(plan):
    kt = plan.kernel[0]
    st = plan.strides
    pads = list(plan.pads)

    def dense(x, wf):
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, x.shape[-1]), wf.shape, ("NTHWC", "THWIO", "NTHWC"))
        return lax.conv_general_dilated(
            x, wf, st, pads, dimension_numbers=dn)

    def wbmajor(xw, wf):
        # xw: (B, T, Wb, H, C); kernel reordered (kt, Kw, kh)
        wfw = jnp.swapaxes(wf, 1, 2)
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, xw.shape[-1]), wfw.shape,
            ("NTHWC", "THWIO", "NTHWC"))
        return lax.conv_general_dilated(
            xw, wfw, (st[0], st[2], st[1]), [pads[0], pads[2], pads[1]],
            dimension_numbers=dn)

    def t_shifts(x, axis=1):
        p0 = pads[0][0]
        outs = []
        for dt in range(kt):
            shift = dt - p0
            xs = x
            npad = [(0, 0)] * x.ndim
            if shift < 0:
                npad[axis] = (-shift, 0)
                xs = jnp.pad(x, npad)
                xs = lax.slice_in_dim(xs, 0, x.shape[axis], axis=axis)
            elif shift > 0:
                npad[axis] = (0, shift)
                xs = jnp.pad(x, npad)
                xs = lax.slice_in_dim(xs, shift, shift + x.shape[axis],
                                      axis=axis)
            outs.append(xs)
        return outs

    def t2d(x, wf):
        b, t = x.shape[0], x.shape[1]
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, x.shape[-1]), wf.shape[1:], ("NHWC", "HWIO", "NHWC"))
        out = None
        for dt, xs in enumerate(t_shifts(x)):
            xs2 = xs.reshape((b * t,) + xs.shape[2:])
            o = lax.conv_general_dilated(
                xs2, wf[dt], st[1:], pads[1:], dimension_numbers=dn)
            out = o if out is None else out + o
        return out.reshape((b, t) + out.shape[1:])

    def wb2d(xw, wf):
        b, t = xw.shape[0], xw.shape[1]
        wfw = jnp.swapaxes(wf, 1, 2)
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, xw.shape[-1]), wfw.shape[1:], ("NHWC", "HWIO", "NHWC"))
        out = None
        for dt, xs in enumerate(t_shifts(xw)):
            xs2 = xs.reshape((b * t,) + xs.shape[2:])
            o = lax.conv_general_dilated(
                xs2, wfw[dt], (st[2], st[1]), [pads[2], pads[1]],
                dimension_numbers=dn)
            out = o if out is None else out + o
        return out.reshape((b, t) + out.shape[1:])

    return dense, wbmajor, t2d, wb2d


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    plans = _early_fold_plans_a2()
    rng = np.random.RandomState(0)
    shapes = {
        "stem": (B, 32, 224, 14, 48),
        "b2_0": (B, 32, 112, 14, 128),
        "b2_1": (B, 32, 56, 14, 64),
        "b2_2": (B, 32, 56, 14, 64),
    }
    for name in ("stem", "b2_0", "b2_1", "b2_2"):
        plan = plans[name]
        x = jnp.asarray(rng.rand(*shapes[name]) * 0.1, jnp.bfloat16)
        xw = jnp.asarray(np.transpose(np.asarray(x, np.float32),
                                      (0, 1, 3, 2, 4)), jnp.bfloat16)
        nflat = int(plan.idx.max())
        wflat = jnp.asarray(rng.randn(nflat) * 0.05, jnp.float32)
        wf = gather_weights(plan, wflat).astype(jnp.bfloat16)

        dense, wbmajor, t2d, wb2d = make_variants(plan)
        want = np.asarray(jax.jit(dense)(x, wf), np.float32)
        res = [f"{name}: dense f {timeit_loop(dense, x, wf):5.2f} "
               f"f+b {timeit_grad(dense, x, wf):5.2f}"]
        for vname, fn, arg in (("wbmajor", wbmajor, xw),
                               ("t2d", t2d, x), ("wb2d", wb2d, xw)):
            got = np.asarray(jax.jit(fn)(arg, wf), np.float32)
            if vname in ("wbmajor", "wb2d"):
                got = np.transpose(got, (0, 1, 3, 2, 4))
            err = float(np.max(np.abs(got - want)))
            res.append(f"{vname} f {timeit_loop(fn, arg, wf):5.2f} "
                       f"f+b {timeit_grad(fn, arg, wf):5.2f} (e{err:.3f})")
        print(" | ".join(res), flush=True)


if __name__ == "__main__":
    main()
