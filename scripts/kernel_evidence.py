"""On-chip Pallas kernel evidence: correctness + timing JSON artifact.

Runs the flash-attention forward AND backward kernels and the fused
inverted-bottleneck kernel on the real TPU (default jax platform), compares
against their XLA references, times both paths, and writes
``docs/kernel_evidence.json`` — the mechanically-reproducible record behind
the kernel claims in README/BENCH (round-1 review: those claims rested on
unrecorded manual runs).

Usage: python scripts/kernel_evidence.py [--out docs/kernel_evidence.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.ops.attention import sdpa_xla  # noqa: E402
from picklebot_tpu.ops.pallas.flash_attention import flash_attention  # noqa: E402
from picklebot_tpu.ops.pallas.flash_packed import flash_attention_packed  # noqa: E402


def sync(x):
    if isinstance(x, (tuple, list)):
        return sum(sync(t) for t in x)
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, steps=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def timeit_loop(fn, q, k, v, reps=20):
    """ms per fn(q, k, v) call inside ONE jitted fori_loop (each iteration
    data-depends on the last) — immune to the remote-TPU tunnel's per-call
    dispatch latency, which pollutes sub-30ms host-side timings."""
    def body(_, carry):
        out = fn(carry, k, v)
        if isinstance(out, tuple):
            out = out[0]
        return carry + 1e-6 * out.astype(carry.dtype)

    looped = jax.jit(lambda q: jax.lax.fori_loop(0, reps, body, q))
    sync(looped(q))
    t0 = time.perf_counter()
    sync(looped(q))
    return (time.perf_counter() - t0) / reps * 1e3


def flash_evidence(results):
    rng = np.random.RandomState(0)
    # MobileViT stage-1 at the long-clip shape: thousands of tokens, 8 heads,
    # dim_head 16 (reference mobilevit.py:116); plus a wide-head shape where
    # blockwise kernels are at home
    shapes = [
        ("mobilevit_stage1", (8, 8, 1568, 16)),   # (B*P, H, N, D)
        ("wide_heads", (4, 8, 2048, 64)),
    ]
    for name, (b, h, n, d) in shapes:
        q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
        scale = d ** -0.5

        fwd_flash = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        fwd_xla = jax.jit(lambda q, k, v: sdpa_xla(q, k, v, scale))
        want = np.asarray(fwd_xla(q, k, v), np.float32)
        got = np.asarray(fwd_flash(q, k, v), np.float32)
        fwd_err = float(np.max(np.abs(got - want)))

        def make_grad(bwd):
            def loss(q, k, v):
                return jnp.sum(flash_attention(
                    q, k, v, scale, backward=bwd).astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        def xla_grad():
            def loss(q, k, v):
                return jnp.sum(sdpa_xla(q, k, v, scale
                                        ).astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        g_ref = xla_grad()(q, k, v)
        g_pallas = make_grad("pallas")(q, k, v)
        bwd_err = float(max(
            np.max(np.abs(np.asarray(a, np.float32) -
                          np.asarray(b, np.float32)))
            for a, b in zip(g_pallas, g_ref)))

        entry = {
            "shape": dict(batch=b, heads=h, seq=n, dim_head=d,
                          dtype="bfloat16"),
            "fwd_max_abs_err_vs_xla": fwd_err,
            "bwd_max_abs_err_vs_xla": bwd_err,
            "fwd_ms": {"pallas": timeit(fwd_flash, q, k, v),
                       "xla": timeit(fwd_xla, q, k, v)},
            "bwd_ms": {"pallas": timeit(make_grad("pallas"), q, k, v),
                       "xla_remat_vjp": timeit(make_grad("xla"), q, k, v),
                       "xla_native": timeit(xla_grad(), q, k, v)},
        }
        results["flash_attention"][name] = entry
        print(name, json.dumps(entry, indent=1))


def flash_packed_evidence(results):
    """Head-packed kernel (ops/pallas/flash_packed.py) vs XLA on the SAME
    packed (..., N, H*D) layout, timed with the in-graph loop. This is the
    kernel 'auto' ships on the default path (ops/attention.py)."""
    rng = np.random.RandomState(0)
    heads, dim_head = 8, 16
    scale = dim_head ** -0.5

    def sdpa_packed(q, k, v):
        def split(t):
            t = t.reshape(t.shape[:-1] + (heads, dim_head))
            return jnp.swapaxes(t, -2, -3)
        out = sdpa_xla(split(q), split(k), split(v), scale)
        out = jnp.swapaxes(out, -2, -3)
        return out.reshape(out.shape[:-2] + (heads * dim_head,))

    def f_packed(q, k, v):
        return flash_attention_packed(q, k, v, heads, scale)

    def grad_of(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))

    out = {}
    for name, (b, n) in [("mobilevit_stage1", (8, 1568)),
                         ("stage2", (8, 200)),
                         ("long4k", (4, 4096))]:
        q = jnp.asarray(rng.randn(b, n, heads * dim_head), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, n, heads * dim_head), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, n, heads * dim_head), jnp.bfloat16)
        want = np.asarray(jax.jit(sdpa_packed)(q, k, v), np.float32)
        got = np.asarray(jax.jit(f_packed)(q, k, v), np.float32)
        ga = jax.jit(grad_of(f_packed))(q, k, v)
        gb = jax.jit(grad_of(sdpa_packed))(q, k, v)
        entry = {
            "shape": dict(batch=b, heads=heads, seq=n, dim_head=dim_head,
                          dtype="bfloat16", layout="packed (N, H*D)"),
            "fwd_max_abs_err_vs_xla": float(np.max(np.abs(got - want))),
            "bwd_max_abs_err_vs_xla": float(max(
                np.max(np.abs(np.asarray(x, np.float32)
                              - np.asarray(y, np.float32)))
                for x, y in zip(ga, gb))),
            "fwd_ms": {"pallas_packed": timeit_loop(f_packed, q, k, v),
                       "xla": timeit_loop(sdpa_packed, q, k, v)},
            "fwd_bwd_ms": {
                "pallas_packed": timeit_loop(grad_of(f_packed), q, k, v),
                "xla": timeit_loop(grad_of(sdpa_packed), q, k, v)},
        }
        out[name] = entry
        print("packed", name, json.dumps(entry, indent=1))
    results["flash_attention_packed"] = out


def fused_bottleneck_evidence(results):
    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.ops.bottleneck import Bottleneck3D
    rng = np.random.RandomState(0)
    cases = [  # stride-1 Large3D blocks (kernel-eligible)
        ("c16_e16_k3_112", 16, 16, 16, 3, (4, 8, 112, 112, 16)),
        ("c112_e672_k3_14", 112, 112, 672, 3, (16, 18, 14, 14, 112)),
        # the boundary-fold regime (round-3 VERDICT item 7): Large3D
        # block3's stride-1 bottlenecks run canonically inside BoundaryFold
        # — C=40, E=120, k5, SE @ 28^2, the wide-channel shape the kernel's
        # docstring predicted it should win
        ("c40_e120_k5_28_boundary", 40, 40, 120, 5, (16, 14, 28, 28, 40)),
    ]
    policy = DtypePolicy.bf16()

    def timeit_xloop(fn, v, x, reps=10):
        """In-graph loop timing (see timeit_loop) for apply-style fns."""
        def body(_, carry):
            out = fn(v, carry)
            s = jnp.sum(out, axis=-1, keepdims=True)
            # crop to the common extent (the T-inflation quirk can make the
            # output LONGER than the input on the temporal dim)
            sl = tuple(slice(0, min(cd, sd))
                       for cd, sd in zip(carry.shape, s.shape))
            return carry.at[sl].add((1e-6 * s[sl]).astype(carry.dtype))
        looped = jax.jit(lambda x: jax.lax.fori_loop(0, reps, body, x))
        sync(looped(x))
        t0 = time.perf_counter()
        sync(looped(x))
        return (time.perf_counter() - t0) / reps * 1e3

    from picklebot_tpu.ops import activations as act
    from picklebot_tpu.ops.pallas.fused_bottleneck import (
        apply_fused_bottleneck)
    for name, cin, cout, e, k, xshape in cases:
        x = jnp.asarray(rng.rand(*xshape), jnp.bfloat16)
        plain = Bottleneck3D(cin, cout, e, stride=1, kernel_size=k,
                             use_se=True, dropout=0.0)
        v = plain.init(0)

        def f_fused(v, x, k=k):
            # the retired kernel, called directly, plus the module's
            # eval-mode BN + hardswish tail so the comparison stays
            # block-for-block with the XLA path
            dt = policy.compute_dtype
            out = apply_fused_bottleneck(v["params"], x, k, 1, True, dt)
            bn_p = v["params"]["batchnorm"]
            bn_s = v["state"]["batchnorm"]
            inv = jax.lax.rsqrt(jnp.asarray(bn_s["var"], jnp.float32) + 1e-5)
            out = ((out.astype(jnp.float32) - bn_s["mean"]) * inv
                   * bn_p["scale"] + bn_p["bias"]).astype(dt)
            return act.hardswish(out)

        def f_plain(v, x):
            return plain.apply(v, x, train=False, policy=policy)[0]
        want = np.asarray(jax.jit(f_plain)(v, x), np.float32)
        got = np.asarray(jax.jit(f_fused)(v, x), np.float32)
        entry = {
            "input": list(xshape), "expand": e, "kernel": k, "se": True,
            "max_abs_err_vs_xla": float(np.max(np.abs(got - want))),
            "out_absmax": float(np.max(np.abs(want))),
            "fwd_ms": {"pallas_fused": timeit_xloop(f_fused, v, x),
                       "xla": timeit_xloop(f_plain, v, x)},
        }
        results["fused_bottleneck"][name] = entry
        print(name, json.dumps(entry, indent=1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/kernel_evidence.json")
    p.add_argument("--only", choices=["packed", "flash", "fused"],
                   help="run one section and merge into the existing json")
    args = p.parse_args()
    results = {
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "flash_attention": {},
        "fused_bottleneck": {},
    }
    assert results["platform"] == "tpu", \
        f"evidence must be gathered on-chip, got {results['platform']}"
    if args.only and os.path.exists(args.out):
        with open(args.out) as fh:
            prev = json.load(fh)
        prev.update({k: v for k, v in results.items()
                     if k in ("platform", "device")})
        results = prev
    if args.only in (None, "packed"):
        flash_packed_evidence(results)
    if args.only in (None, "flash"):
        flash_evidence(results)
    if args.only in (None, "fused"):
        fused_bottleneck_evidence(results)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
