"""Probe: does int8 buy anything on v5e through this toolchain?

Two questions, measured with the in-graph fori_loop methodology
(tunnel-noise-proof, see probe_stem2.py):
  1. MXU: does an int8 dot actually run ~2x bf16 at a compute-bound
     shape (4096^3 matmul)?
  2. The folded stem conv (the measured XLA-codegen wall, BENCH.md):
     does feeding it int8 inputs (int32 accumulation) move it at all?
     It is bandwidth-bound in theory (154 MB in) so halving the input
     bytes could pay even if the MXU path is unchanged.

This decides whether a post-training-int8 inference path is worth
building. Usage: timeout 1800 python scripts/probe_int8.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B_, T_, H_, WB, CI, CO = 16, 32, 224, 14, 48, 128


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_loop(fn, x, w, reps=20, feedback=None):
    """Time reps in-graph iterations of fn(x, w); feedback folds the output
    back into x so iterations serialize (no DCE, no overlap)."""
    def body(_, carry):
        out = fn(carry, w)
        return feedback(carry, out)

    looped = jax.jit(lambda x: lax.fori_loop(0, reps, body, x))
    sync(looped(x))  # compile
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def probe_matmul():
    n = 4096
    rng = np.random.RandomState(0)
    a16 = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    b16 = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
    a8 = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)

    def mm_bf16(x, w):
        return jnp.dot(x, w)

    def mm_int8(x, w):
        return lax.dot(x, w, preferred_element_type=jnp.int32)

    fb16 = lambda carry, out: (carry + (1e-6 * out.astype(jnp.float32)
                                        ).astype(carry.dtype))
    fb8 = lambda carry, out: carry + (out & 1).astype(jnp.int8)
    t16 = timeit_loop(mm_bf16, a16, b16, feedback=fb16)
    t8 = timeit_loop(mm_int8, a8, b8, feedback=fb8)
    gflop = 2 * n**3 / 1e9
    print(f"matmul {n}^3: bf16 {t16:.3f} ms ({gflop/t16:.0f} TFLOP/s)  "
          f"int8 {t8:.3f} ms ({gflop/t8:.0f} TOP/s)  speedup {t16/t8:.2f}x",
          flush=True)


def probe_stem():
    rng = np.random.RandomState(0)
    x_np = rng.randn(B_, T_, H_, WB, CI)
    w_np = rng.randn(3, 3, 2, CI, CO)
    dn = lax.conv_dimension_numbers(x_np.shape, w_np.shape,
                                    ("NTHWC", "THWIO", "NTHWC"))

    def conv_bf16(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(2, 2, 1),
            padding=((0, 1), (0, 1), (0, 1)), dimension_numbers=dn)

    def conv_int8(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(2, 2, 1),
            padding=((0, 1), (0, 1), (0, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def fb_f(carry, out):
        s = jnp.sum(out, axis=-1, keepdims=True)
        return carry.at[:, :16, :112, :, :].add(
            (1e-6 * s).astype(carry.dtype))

    def fb_i(carry, out):
        s = jnp.sum(out & 1, axis=-1, keepdims=True).astype(jnp.int8)
        return carry.at[:, :16, :112, :, :].add(s)

    x16 = jnp.asarray(x_np, jnp.bfloat16)
    w16 = jnp.asarray(w_np, jnp.bfloat16)
    x8 = jnp.asarray(np.clip(x_np * 30, -127, 127), jnp.int8)
    w8 = jnp.asarray(np.clip(w_np * 30, -127, 127), jnp.int8)
    t16 = timeit_loop(conv_bf16, x16, w16, feedback=fb_f)
    t8 = timeit_loop(conv_int8, x8, w8, feedback=fb_i)
    print(f"folded stem conv bs={B_}: bf16 {t16:.3f} ms  int8 {t8:.3f} ms  "
          f"speedup {t16/t8:.2f}x", flush=True)

    # pointwise expand conv at a mid-network bandwidth-bound shape:
    # block4 expand 80->480 @ (16, 16, 14, 14)
    e_np = rng.randn(16, 16, 14, 14, 80)
    we_np = rng.randn(1, 1, 1, 80, 480)
    dne = lax.conv_dimension_numbers(e_np.shape, we_np.shape,
                                     ("NTHWC", "THWIO", "NTHWC"))

    def pw_bf16(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "VALID",
                                        dimension_numbers=dne)

    def pw_int8(x, w):
        return lax.conv_general_dilated(x, w, (1, 1, 1), "VALID",
                                        dimension_numbers=dne,
                                        preferred_element_type=jnp.int32)

    def fb_pf(carry, out):
        s = jnp.sum(out, axis=-1, keepdims=True)
        return carry + (1e-6 * s).astype(carry.dtype)

    def fb_pi(carry, out):
        s = jnp.sum(out & 1, axis=-1, keepdims=True).astype(jnp.int8)
        return carry + s

    te16 = timeit_loop(pw_bf16, jnp.asarray(e_np, jnp.bfloat16),
                       jnp.asarray(we_np, jnp.bfloat16), feedback=fb_pf)
    te8 = timeit_loop(pw_int8,
                      jnp.asarray(np.clip(e_np * 30, -127, 127), jnp.int8),
                      jnp.asarray(np.clip(we_np * 30, -127, 127), jnp.int8),
                      feedback=fb_pi)
    print(f"pointwise 80->480 @14^2 bs=16: bf16 {te16:.3f} ms  "
          f"int8 {te8:.3f} ms  speedup {te16/te8:.2f}x", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_matmul()
    probe_stem()
