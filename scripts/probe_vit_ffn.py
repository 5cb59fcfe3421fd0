"""MobileViT stage-1 FFN token-pair fold probe (VERDICT r3 item 3).

Stage-1's non-attention residue is the d=64 FFN/residual chain: bf16
arrays tile (16, 128) on TPU, so every (..., 64) tensor occupies 2x its
logical bytes and every VPU/MXU op runs half-lane-empty. Folding two
ADJACENT TOKENS into the lane dim — (B, P, N, 64) -> (B, P, N/2, 128) —
is the cheapest possible relayout (token n and n+1 are contiguous in
memory, unlike patch-position groups which would pay a real transpose,
cf. the H-fold lesson in probe_stem.py), makes every elementwise/IO op
lane-dense, and turns the FFN matmuls into block-diagonal ones:

    W1f = [[W1, 0], [0, W1]]  (128, 256)     silu(xf @ W1f) @ W2f
    W2f = [[W2, 0], [0, W2]]  (256, 128)

2x the MACs (structural zeros) for lane-dense operands + halved HBM
bytes — the early_fold trade, applied to the transformer. Exact: the
extra terms are multiplications by structural zeros.

Measures (in-graph fori_loop timing, the kernel_evidence standard):
baseline vs folded FFN+residual chain at the xxs stage-1 bench shape,
fwd and fwd+bwd, plus exactness. Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, P, N, D, H = 8, 8, 1568, 64, 128   # xxs stage-1 at bench bs=8 T=16
DT = jnp.bfloat16


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def block_diag2(w):
    z = jnp.zeros_like(w)
    return jnp.concatenate([jnp.concatenate([w, z], 1),
                            jnp.concatenate([z, w], 1)], 0)


def ff_base(x, ws):
    w1, w2 = ws
    return jax.nn.silu(x @ w1) @ w2 + x


def ff_folded(x, ws):
    w1, w2 = ws
    xf = x.reshape(B, P, N // 2, 2 * D)
    w1f = block_diag2(w1)
    w2f = block_diag2(w2)
    y = jax.nn.silu(xf @ w1f) @ w2f + xf
    return y.reshape(B, P, N, D)


def ff_folded_dense(x, ws):
    """Upper bound: folded layout with a DENSE (128, 256) weight — what a
    d=128 model would pay. Not exact (mixes tokens); timing only."""
    w1f, w2f = ws
    xf = x.reshape(B, P, N // 2, 2 * D)
    y = jax.nn.silu(xf @ w1f) @ w2f + xf
    return y.reshape(B, P, N, D)


def timeit_fwd(fn, x, ws, reps=30):
    def body(_, carry):
        out = fn(carry, ws)
        return carry + (1e-6 * jnp.sum(out, -1, keepdims=True)
                        ).astype(carry.dtype)

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def timeit_fwd_bwd(fn, x, ws, reps=30):
    def loss(x, ws):
        return jnp.sum(fn(x, ws).astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1))

    def body(_, carry):
        dx, (dw1, dw2) = g(carry, ws)
        return carry + (1e-6 * dx).astype(carry.dtype) \
            + (1e-9 * jnp.sum(dw1).astype(carry.dtype)
               + 1e-9 * jnp.sum(dw2).astype(carry.dtype))

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, P, N, D), DT)
    w1 = jnp.asarray(rng.randn(D, H) / np.sqrt(D), DT)
    w2 = jnp.asarray(rng.randn(H, D) / np.sqrt(H), DT)
    wsd = (jnp.asarray(rng.randn(2 * D, 2 * H) / np.sqrt(2 * D), DT),
           jnp.asarray(rng.randn(2 * H, 2 * D) / np.sqrt(2 * H), DT))

    a = np.asarray(ff_base(x, (w1, w2)), np.float32)
    b = np.asarray(ff_folded(x, (w1, w2)), np.float32)
    err = np.max(np.abs(a - b))
    print(f"exactness |base - folded| max = {err:.2e}")

    for name, fn, ws in (("base  ", ff_base, (w1, w2)),
                         ("folded", ff_folded, (w1, w2)),
                         ("dense128 (bound)", ff_folded_dense, wsd)):
        f = timeit_fwd(fn, x, ws)
        fb = timeit_fwd_bwd(fn, x, ws)
        print(f"{name}: fwd {f:.3f} ms   fwd+bwd {fb:.3f} ms")


if __name__ == "__main__":
    main()
