"""Device-side single-request inference LATENCY (the serving metric).

BENCH.md's inference table is throughput at bs>=16; a serve user's other
number is the latency of ONE clip. Host-side wall clock can't measure it
here (sub-30 ms windows through the remote-TPU tunnel are dispatch
noise — CLAUDE.md), so this uses the in-graph fori_loop standard: chain
``reps`` dependent forwards of the flagship model (MobileNetLarge3D,
T=32, 224², bf16) and report ms per forward at bs = 1 / 2 / 4 / 8.
The chained forwards understate nothing: each iteration consumes the
previous logits, so no two can overlap. ``reps`` is sized so the window
is ~0.5 s of device time (the one dispatch+readback roundtrip, tens of
ms through the tunnel, then amortizes to <0.3 ms/forward even at bs=1 —
an earlier reps=20 version of this probe was up to ~40% roundtrip at
bs=1) and the best of 2 windows is kept (timing noise is one-sided).

Three program shapes per batch size:
  * plain         — no fold, weights passed as jit arguments
  * early_fold    — the serving default plan (boundary span at bs<=32,
                    autotune.default_plan), weights as arguments: what
                    ``serve`` (checkpoint path) runs
  * fold+baked    — same fold, weights CLOSED OVER as compile-time
                    constants: the AOT ``serve --exported`` program
                    (BN folded into convs, weights pre-laid-out)

Weights-as-arguments runs must device_put the host-numpy init and pass
it THROUGH jit — closing over a host array bakes it into the program as
a constant (CLAUDE.md landmine), which silently measures the baked
program instead.

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


def timeit_latency(model, variables, batch, baked=False, reps=None):
    policy = DtypePolicy.bf16()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (batch, T, SIZE, SIZE, 3)),
                    jnp.uint8)
    # ~0.5 s windows: forwards measure 2-12 ms here, so 150 reps puts the
    # per-window tunnel roundtrip (tens of ms) under ~0.3 ms/forward
    reps = reps or 150

    def chained(v, x0):
        def body(i, acc):
            # acc feeds back into the input so iteration i+1 depends on
            # iteration i's logits: the loop is a chain, not a pipeline
            xi = x0 + (acc[0, 0] * 1e-6).astype(jnp.uint8)
            h = preprocess(xi, policy.compute_dtype)
            logits, _ = model.apply(v, h, train=False, policy=policy)
            return logits.astype(jnp.float32)
        z = jnp.zeros((batch, 13), jnp.float32)
        return lax.fori_loop(0, reps, body, z)

    if baked:
        # weights as compile-time constants (the AOT export program)
        looped = jax.jit(lambda x0: chained(variables, x0))
        run = lambda: looped(x)
    else:
        dvars = jax.device_put(variables)
        looped = jax.jit(chained)
        run = lambda: looped(dvars, x)

    sync(run())  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sync(run())
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    configs = [
        ("plain", dict(early_fold=False), False),
        # the serving default plan at bs<=32 (autotune.default_plan)
        ("early_fold", dict(early_fold=True, fold_span="boundary"), False),
        ("fold+baked", dict(early_fold=True, fold_span="boundary"), True),
    ]
    for name, kw, baked in configs:
        model = MobileNetLarge3D(num_classes=13, **kw)
        variables = model.init(1234)
        for batch in (1, 2, 4, 8):
            ms = timeit_latency(model, variables, batch, baked=baked)
            print(f"{name:10s} bs={batch}: {ms:7.3f} ms/forward "
                  f"({batch / ms * 1e3:7.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
