"""Quick fused-bottleneck probe at the boundary-fold regime (VERDICT r3 #7).

Host-timed like the round-2 fused evidence (the in-graph-loop variant's
Pallas-in-fori_loop compile exceeds 40 min on the remote toolchain); the
22/43 ms magnitudes sit above the ~1 ms tunnel noise floor.

Usage: timeout 2400 python scripts/probe_fused_boundary.py
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.ops.bottleneck import Bottleneck3D  # noqa: E402


def sync(x):
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


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.RandomState(0)
    policy = DtypePolicy.bf16()
    # Large3D block3 stride-1 bottleneck as run canonically inside the
    # BoundaryFold path: C=40, E=120, k5, SE @ 28^2
    name, cin, cout, e, k, xshape = (
        "c40_e120_k5_28_boundary", 40, 40, 120, 5, (16, 14, 28, 28, 40))
    from picklebot_tpu.ops import activations as act
    from picklebot_tpu.ops.pallas.fused_bottleneck import (
        apply_fused_bottleneck)
    x = jnp.asarray(rng.rand(*xshape), jnp.bfloat16)
    plain = Bottleneck3D(cin, cout, e, stride=1, kernel_size=k,
                         use_se=True, dropout=0.0)
    v = plain.init(0)

    def _fused(v, x):
        # the retired kernel, called directly, + eval-mode BN/hardswish
        dt = policy.compute_dtype
        out = apply_fused_bottleneck(v["params"], x, k, 1, True, dt)
        bn_p, bn_s = v["params"]["batchnorm"], v["state"]["batchnorm"]
        inv = jax.lax.rsqrt(jnp.asarray(bn_s["var"], jnp.float32) + 1e-5)
        out = ((out.astype(jnp.float32) - bn_s["mean"]) * inv
               * bn_p["scale"] + bn_p["bias"]).astype(dt)
        return act.hardswish(out)

    f_fused = jax.jit(_fused)
    f_plain = jax.jit(lambda v, x: plain.apply(v, x, train=False,
                                               policy=policy)[0])
    want = np.asarray(f_plain(v, x), np.float32)
    got = np.asarray(f_fused(v, x), np.float32)
    entry = {
        "input": list(xshape), "expand": e, "kernel": k, "se": True,
        "max_abs_err_vs_xla": float(np.max(np.abs(got - want))),
        "out_absmax": float(np.max(np.abs(want))),
        "fwd_ms": {"pallas_fused": timeit(f_fused, v, x),
                   "xla": timeit(f_plain, v, x)},
    }
    print(name, json.dumps(entry, indent=1))
    out_path = "docs/kernel_evidence.json"
    with open(out_path) as fh:
        data = json.load(fh)
    data.setdefault("fused_bottleneck", {})[name] = entry
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=1)
    print("merged into", out_path)


if __name__ == "__main__":
    main()
