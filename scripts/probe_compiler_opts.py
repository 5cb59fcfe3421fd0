"""Probe per-program XLA compiler options against the folded-conv wall.

Every *reformulation* family (spatial reorder, tap split/packing, im2col,
bespoke Pallas) has been measured against the folded convs (docs/BENCH.md
"MoViNet per-block budget", "Round-3 stem probes") — all plateau at the
same XLA-conv-codegen wall. This probe tries the remaining axis the
toolchain exposes: TPU compiler options shipped per-program via
``jit(...).lower(...).compile({...})`` (the sanctioned per-module XLA
flag channel), on the two canonical wall shapes:

  * the Large3D folded stem: dense (3,3,2) s(2,2,1) 48->128 over
    (16, 32, 224, 14, 48)  — measured 3.19 ms vs ~1 ms roofline
  * MoViNet b2_1: vanilla (3,3,3) s1 64->160 over (8, 32, 56, 14, 64)
    — measured 3.97 ms vs ~0.56 ms MXU floor

Unknown option names are rejected by the compiler -> reported and
skipped, so the candidate list can include speculative knobs. In-graph
fori_loop timing (tunnel-noise-proof, same harness as probe_stem2).

Usage: timeout 1800 python scripts/probe_compiler_opts.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_compiled(compiled, x, reps):
    sync(compiled(x))
    t0 = time.perf_counter()
    sync(compiled(x))
    return (time.perf_counter() - t0) / reps * 1e3


def make_loop(conv, shape_in, reps):
    def body(_, carry):
        out = conv(carry)
        s = jnp.sum(out, axis=-1, keepdims=True)
        # feed a tiny function of the output back into the input's top
        # corner so iterations are data-dependent (no DCE/overlap cheats)
        t, h, w = out.shape[1], out.shape[2], out.shape[3]
        return carry.at[:, :t, :h, :w, :].add(
            (1e-6 * jnp.broadcast_to(s, (carry.shape[0], t, h, w, 1))
             ).astype(carry.dtype))

    return jax.jit(lambda x: lax.fori_loop(0, reps, body, x))


CASES = {
    "stem_fold16": dict(
        shape=(16, 32, 224, 14, 48), kernel=(3, 3, 2), cout=128,
        strides=(2, 2, 1), padding=[(1, 1), (1, 1), (1, 0)]),
    "movinet_b2_1": dict(
        shape=(8, 32, 56, 14, 64), kernel=(3, 3, 3), cout=160,
        strides=(1, 1, 1), padding=[(1, 1), (1, 1), (1, 1)]),
}

# Candidate option sets. Names the compiler rejects are reported+skipped.
CANDIDATES = [
    ("baseline", {}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("no_rewrites", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("flm_latency", {"xla_tpu_memory_bound_loop_optimizer_options":
                     "enabled:true"}),
    ("async_fusion", {"xla_tpu_enable_async_collective_fusion": "true"}),
    ("lic_large", {"xla_tpu_licm_size_inflation_ratio": "4.0"}),
]


def main():
    reps = 20
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    for name, c in CASES.items():
        shape, k, co = c["shape"], c["kernel"], c["cout"]
        ci = shape[-1]
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, ci), k + (ci, co), ("NTHWC", "THWIO", "NTHWC"))
        w = jnp.asarray(rng.randn(*k, ci, co) * 0.05, jnp.bfloat16)
        x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)

        def conv(t):
            return lax.conv_general_dilated(
                t, w, c["strides"], c["padding"], dimension_numbers=dn)

        looped = make_loop(conv, shape, reps)
        lowered = looped.lower(x)
        base_ms = None
        for label, opts in CANDIDATES:
            try:
                compiled = lowered.compile(compiler_options=opts or None)
            except Exception as e:  # noqa: BLE001 — unknown option names
                print(f"{name:14s} {label:12s} REJECTED "
                      f"({type(e).__name__}: {str(e)[:90]})")
                continue
            ms = timeit_compiled(compiled, x, reps)
            if label == "baseline":
                base_ms = ms
            rel = "" if base_ms is None else f"  ({ms / base_ms:5.2f}x)"
            print(f"{name:14s} {label:12s} {ms:7.3f} ms{rel}")


if __name__ == "__main__":
    main()
