"""On-chip probe: head-packed flash kernel vs XLA at MobileViT shapes.

Timing uses an in-graph fori_loop (each iteration data-depends on the last)
so per-step tunnel dispatch latency cannot pollute sub-30ms measurements
(CLAUDE.md environment caveat).

Usage: timeout 1800 python scripts/probe_flash_packed.py [--reps 20]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.ops.attention import sdpa_xla  # noqa: E402
from picklebot_tpu.ops.pallas.flash_packed import flash_attention_packed  # noqa: E402


def sync(x):
    if isinstance(x, (tuple, list)):
        return sum(sync(t) for t in x)
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, q, k, v, reps):
    """ms per call of fn(q,k,v) measured inside one jitted fori_loop."""
    def body(_, carry):
        out = fn(carry, k, v)
        if isinstance(out, tuple):
            out = out[0]
        return carry + 1e-6 * out.astype(carry.dtype)

    looped = jax.jit(lambda q: jax.lax.fori_loop(0, reps, body, q))
    sync(looped(q))                      # compile + warm
    t0 = time.perf_counter()
    sync(looped(q))
    return (time.perf_counter() - t0) / reps * 1e3


def sdpa_packed(q, k, v, heads, scale):
    def split(t):
        t = t.reshape(t.shape[:-1] + (heads, t.shape[-1] // heads))
        return jnp.swapaxes(t, -2, -3)
    out = sdpa_xla(split(q), split(k), split(v), scale)
    out = jnp.swapaxes(out, -2, -3)
    return out.reshape(out.shape[:-2] + (q.shape[-1],))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--blocks", type=int, nargs=2, default=None,
                    help="block_q block_k override")
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    heads, scale = 8, 16 ** -0.5
    kw = {}
    if args.blocks:
        kw = dict(block_q=args.blocks[0], block_k=args.blocks[1])

    for name, (b, n) in [("mobilevit_stage1", (8, 1568)),
                         ("stage2", (8, 200)),
                         ("long4k", (4, 4096))]:
        q = jnp.asarray(rng.randn(b, n, 128), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, n, 128), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, n, 128), jnp.bfloat16)

        f_pk = lambda q, k, v: flash_attention_packed(q, k, v, heads, scale,
                                                      **kw)
        f_xla = lambda q, k, v: sdpa_packed(q, k, v, heads, scale)
        want = np.asarray(jax.jit(f_xla)(q, k, v), np.float32)
        got = np.asarray(jax.jit(f_pk)(q, k, v), np.float32)
        err = float(np.max(np.abs(got - want)))

        def grad_of(fn):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))

        ga = jax.jit(grad_of(f_pk))(q, k, v)
        gb = jax.jit(grad_of(f_xla))(q, k, v)
        gerr = float(max(np.max(np.abs(np.asarray(x, np.float32)
                                       - np.asarray(y, np.float32)))
                         for x, y in zip(ga, gb)))

        t_fwd_pk = timeit_loop(f_pk, q, k, v, args.reps)
        t_fwd_xla = timeit_loop(f_xla, q, k, v, args.reps)
        t_bwd_pk = timeit_loop(grad_of(f_pk), q, k, v, args.reps)
        t_bwd_xla = timeit_loop(grad_of(f_xla), q, k, v, args.reps)
        print(f"{name} (b={b} n={n}): fwd_err={err:.5f} bwd_err={gerr:.5f} "
              f"fwd pallas={t_fwd_pk:.2f}ms xla={t_fwd_xla:.2f}ms | "
              f"fwd+bwd pallas={t_bwd_pk:.2f}ms xla={t_bwd_xla:.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
