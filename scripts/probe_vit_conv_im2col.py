"""MobileViT stage-1 dense-conv reformulation probe (VERDICT r3 item 3).

probe_vit_ffn measured the d=64 FFN/residual chain at ~1.0 ms fwd+bwd —
NOT the stage-1 residue (and its token-pair fold LOSES: 1.25 vs 1.00).
The residue is the block's conv1/conv4: dense 27-tap 3D convs (48→48 /
96→48 at (8,16,28,28)) running ~1.9/2.0 ms fwd each (~6.6% MFU — the
mid-C small-spatial conv wall). The W2 channel fold already tied/lost
(probe_vit_convs). Last untried reformulation family: express the conv
as matmuls the MXU likes —

  im2col   27 shifted views concatenated to (..., 27C) @ (27C, Cout):
           one big K-dense dot; costs a 27x materialization unless XLA
           fuses the concat into the dot.
  tapsum   27 separate (..., C) @ (C, Cout) dots accumulated: no
           materialization, but K=48 pads the MXU 2.7x per dot.

Measures fwd and fwd+bwd (in-graph fori_loop) for conv1 and conv4
shapes vs the conv_general_dilated baseline; exactness asserted.

CAVEAT (measured round 4): trust the fwd columns only. The fwd+bwd loop
differentiates sum(fn(x, w)), whose cotangent is constant ones — XLA
then constant-folds the whole dx chain (conv_transpose(ones, w) with w a
closed-over constant) and DCEs the forward, so "fwd+bwd" can measure
LESS than fwd (e.g. conv_dilated 1.43 vs 1.70 ms). The fwd comparison
alone decides: im2col 5.6-6.7 ms, tapsum 3.7-27 ms vs conv 1.7-1.8 ms.
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

DT = jnp.bfloat16
B, T, H, W = 8, 16, 28, 28


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def conv_ref(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NTHWC", "THWIO", "NTHWC"))
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                    dimension_numbers=dn)


def _views(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return [xp[:, dt:dt + T, dh:dh + H, dw:dw + W, :]
            for dt in range(3) for dh in range(3) for dw in range(3)]


def conv_im2col(x, w):
    cin, cout = w.shape[3], w.shape[4]
    xcat = jnp.concatenate(_views(x), -1)
    return xcat @ w.reshape(27 * cin, cout)


def conv_tapsum(x, w):
    cin, cout = w.shape[3], w.shape[4]
    wf = w.reshape(27, cin, cout)
    views = _views(x)
    acc = views[0] @ wf[0]
    for i in range(1, 27):
        acc = acc + views[i] @ wf[i]
    return acc


def timeit_fwd(fn, x, w, reps=20):
    def body(_, carry):
        out = fn(carry, w)
        # shape-agnostic data dependency (conv4 has cout < cin: a
        # channel slice of out can't broadcast back onto carry)
        upd = jnp.sum(out, axis=-1, keepdims=True).astype(carry.dtype)
        return carry + 1e-6 * upd

    looped = jax.jit(lambda x0: lax.fori_loop(0, reps, body, x0))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def timeit_fwd_bwd(fn, x, w, reps=20):
    g = jax.grad(lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32)),
                 argnums=(0, 1))

    def body(_, carry):
        dx, dw = g(carry, w)
        return carry + (1e-6 * dx).astype(carry.dtype) + (
            1e-9 * jnp.sum(dw).astype(carry.dtype))

    looped = jax.jit(lambda x0: lax.fori_loop(0, reps, body, x0))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.RandomState(0)
    for name, cin, cout in (("conv1 48->48", 48, 48),
                            ("conv4 96->48", 96, 48)):
        x = jnp.asarray(rng.randn(B, T, H, W, cin), DT)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.05, DT)
        ref = np.asarray(conv_ref(x, w), np.float32)
        for variant, fn in (("im2col", conv_im2col),
                            ("tapsum", conv_tapsum)):
            got = np.asarray(fn(x, w), np.float32)
            err = np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-6)
            assert err < 2e-2, (name, variant, err)  # bf16 order-of-sum
        print(f"{name}:")
        for variant, fn in (("conv_dilated", conv_ref),
                            ("im2col", conv_im2col),
                            ("tapsum", conv_tapsum)):
            f = timeit_fwd(fn, x, w)
            fb = timeit_fwd_bwd(fn, x, w)
            print(f"  {variant:13s} fwd {f:7.3f} ms   fwd+bwd {fb:7.3f} ms")


if __name__ == "__main__":
    main()
