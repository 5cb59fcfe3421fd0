"""Device-side single-request inference LATENCY (the serving metric).

BENCH.md's inference table is throughput at bs>=16; a serve user's other
number is the latency of ONE clip. Host-side wall clock can't measure it
here (sub-30 ms windows through the remote-TPU tunnel are dispatch
noise — CLAUDE.md), so this uses the in-graph fori_loop standard: chain
``reps`` dependent forwards of the flagship model (MobileNetLarge3D,
T=32, 224², bf16) and report ms per forward at bs = 1 / 2 / 4 / 8, for
the plain and early-fold plans. The chained forwards understate nothing:
each iteration consumes the previous logits, so no two can overlap.

Run on the real chip: python scripts/probe_serve_latency.py
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

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.train.step import preprocess

T, SIZE = 32, 224


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_latency(model, variables, batch, reps=20):
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (batch, T, SIZE, SIZE, 3)),
                    jnp.uint8)

    @jax.jit
    def looped(x0):
        def body(i, acc):
            # acc feeds back into the input so iteration i+1 depends on
            # iteration i's logits: the loop is a chain, not a pipeline
            xi = x0 + (acc[0, 0] * 1e-6).astype(jnp.uint8)
            h = preprocess(xi, policy.compute_dtype)
            logits, _ = model.apply(variables, h, train=False,
                                    policy=policy)
            return logits.astype(jnp.float32)
        z = jnp.zeros((batch, 13), jnp.float32)
        return lax.fori_loop(0, reps, body, z)

    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    for plan in ("plain", "early_fold"):
        model = MobileNetLarge3D(num_classes=13,
                                 early_fold=(plan == "early_fold"))
        variables = model.init(1234)
        for batch in (1, 2, 4, 8):
            ms = timeit_latency(model, variables, batch)
            print(f"{plan:10s} bs={batch}: {ms:7.3f} ms/forward "
                  f"({batch / ms * 1e3:7.1f} clips/s)")


if __name__ == "__main__":
    main()
