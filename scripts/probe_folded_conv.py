"""On-chip bench: Pallas stride-1 folded-conv kernel vs XLA dense conv.

Shapes = MoViNetA2's folded b2_1/b2_2 (the two largest single costs in the
zoo's slowest train step, docs/BENCH.md). In-graph loop timing.

Usage: timeout 2400 python scripts/probe_folded_conv.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.ops.pallas.folded_conv import folded_conv_s1, _ref_conv  # noqa: E402


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, x, w, reps=10):
    def body(_, carry):
        out = fn(carry, w)
        s = jnp.sum(out, axis=-1, keepdims=True)
        return carry + (1e-6 * s).astype(carry.dtype)

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def timeit_grad(fn, x, w, reps=10):
    def loss(x, w):
        return jnp.sum(fn(x, w).astype(jnp.float32) ** 2)
    g = jax.grad(loss, argnums=(0, 1))

    def body(_, carry):
        gx, gw = g(carry, w)
        return (carry + (1e-6 * gx).astype(carry.dtype)
                + jnp.sum(gw).astype(carry.dtype) * 1e-12)

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    cases = [
        ("b2_1", (8, 32, 56, 14, 64), 160, (3, 3, 3)),
        ("b2_2", (8, 32, 56, 14, 64), 256, (3, 3, 3)),
        ("vit_s0ish", (16, 32, 112, 14, 128), 128, (1, 3, 3)),
    ]
    for name, xshape, co, k in cases:
        kt, kh, kw = k
        pads = (((kt - 1) // 2,) * 2, ((kh - 1) // 2,) * 2,
                ((kw - 1) // 2,) * 2)
        wb = xshape[3]
        x = jnp.asarray(rng.rand(*xshape) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(kt, kh, kw, xshape[-1], co) * 0.05,
                        jnp.bfloat16)
        f_pk = lambda x, w: folded_conv_s1(x, w, pads, wb)
        f_xla = lambda x, w: _ref_conv(x, w, pads)
        want = np.asarray(jax.jit(f_xla)(x, w), np.float32)
        got = np.asarray(jax.jit(f_pk)(x, w), np.float32)
        err = float(np.max(np.abs(got - want)))
        print(f"{name} {xshape}->{co} k{k}: err {err:.4f} | "
              f"fwd pallas {timeit_loop(f_pk, x, w):5.2f} "
              f"xla {timeit_loop(f_xla, x, w):5.2f} | "
              f"f+b pallas {timeit_grad(f_pk, x, w):5.2f} "
              f"xla {timeit_grad(f_xla, x, w):5.2f}", flush=True)


if __name__ == "__main__":
    main()
