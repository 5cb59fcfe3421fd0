"""Probe MoViNetA2's folded block2 — 54% of the 69 ms train step
(scripts/profile_blocks.py --model MoViNetA2 --per-layer, round 3).

Isolates the three collapsed (expand->depthwise) folded convs at bench
shape (bs=8 T=32 224^2) and times fwd and fwd+bwd for each, plus
reformulations:

  dense    — the shipping dense folded conv (ops/folded.py plan)
  tsplit   — k_t decomposed into k_t shifted (1,kh,Kw) convs (does XLA
             handle temporal-kernel-free convs better?)
  wgradoff — dense conv, gradient only w.r.t. input (isolates whether the
             weight-gradient (wgrad) conv is the backward hotspot)

In-graph fori_loop timing (tunnel-noise-proof). Usage:
  timeout 2400 python scripts/probe_movinet_block2.py
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
    if isinstance(x, (tuple, list)):
        return sum(sync(t) for t in x)
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, x, w, reps=10):
    def body(_, carry):
        out = fn(carry, w)
        s = jnp.sum(out, axis=-1, keepdims=True)
        sl = tuple(slice(0, d) for d in s.shape)
        return carry.at[sl].add(
            (1e-6 * s).astype(carry.dtype))

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def timeit_grad(fn, x, w, wrt=(0, 1), reps=10):
    def loss(x, w):
        return jnp.sum(fn(x, w).astype(jnp.float32))
    g = jax.grad(loss, argnums=wrt)

    def body(_, carry):
        gs = g(carry, w)
        gx = gs[0]
        carry = carry + (1e-6 * gx).astype(carry.dtype)
        if len(gs) > 1:   # consume the weight grad so it can't be DCE'd
            carry = carry + jnp.sum(gs[1]).astype(carry.dtype) * 1e-12
        return carry

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def conv_fn(plan, tsplit=False):
    kt = plan.kernel[0]

    def dense(x, wf):
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, x.shape[-1]), wf.shape, ("NTHWC", "THWIO", "NTHWC"))
        return lax.conv_general_dilated(
            x, wf, plan.strides, list(plan.pads), dimension_numbers=dn)

    if not tsplit or kt == 1:
        return dense

    def split(x, wf):
        # k_t shifted (1, kh, Kw) convs summed; T stride is 1 for every
        # block2 plan so the shift is a pad+slice
        p0, p1 = plan.pads[0]
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, x.shape[-1]), (1,) + wf.shape[1:],
            ("NTHWC", "THWIO", "NTHWC"))
        out = None
        for dt in range(kt):
            shift = dt - p0
            xs = x
            if shift < 0:
                xs = jnp.pad(x, ((0, 0), (-shift, 0), (0, 0), (0, 0),
                                 (0, 0)))[:, :x.shape[1]]
            elif shift > 0:
                xs = jnp.pad(x, ((0, 0), (0, shift), (0, 0), (0, 0),
                                 (0, 0)))[:, shift:]
            o = lax.conv_general_dilated(
                xs, wf[dt:dt + 1], plan.strides,
                [(0, 0)] + list(plan.pads[1:]), dimension_numbers=dn)
            out = o if out is None else out + o
        return out

    return split


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
        nflat = int(plan.idx.max())
        wflat = jnp.asarray(rng.randn(nflat) * 0.05, jnp.float32)
        wf = gather_weights(plan, wflat).astype(jnp.bfloat16)

        f = conv_fn(plan)
        t_f = timeit_loop(f, x, wf)
        t_fb = timeit_grad(f, x, wf)
        t_fx = timeit_grad(f, x, wf, wrt=(0,))
        line = (f"{name}: dense fwd {t_f:6.2f}  fwd+bwd {t_fb:6.2f}  "
                f"fwd+dgrad-only {t_fx:6.2f}")
        if plan.kernel[0] > 1:
            fs = conv_fn(plan, tsplit=True)
            err = float(jnp.max(jnp.abs(
                (f(x, wf) - fs(x, wf)).astype(jnp.float32))))
            line += (f" | tsplit fwd {timeit_loop(fs, x, wf):6.2f}  "
                     f"fwd+bwd {timeit_grad(fs, x, wf):6.2f} (err {err:.4f})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
