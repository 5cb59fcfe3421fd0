"""Online (streaming) latency of the 2D+LSTM models on TPU.

Times one carried stream step — CNN on a chunk of frames + LSTM
continuation from (h, c) — with an IN-GRAPH fori_loop chaining the carry
(host-side timings under ~30 ms are tunnel-latency noise here, see
CLAUDE.md). The reference's 2D models have no online path at all
(mobilenet.py:355-366 always consumes whole clips).

Usage: timeout 1800 python scripts/bench_stream2d.py [--model large]
       [--chunk 1] [--size 224] [--reps 30]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.models.mobilenet2d_lstm import (  # noqa: E402
    MobileNetLarge2D, MobileNetSmall2D)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large", choices=["large", "small"])
    p.add_argument("--chunk", type=int, default=1)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    model = (MobileNetLarge2D(13) if args.model == "large"
             else MobileNetSmall2D(13))
    variables = jax.device_put(model.init(0))
    policy = DtypePolicy.bf16()
    h0, c0 = model.init_stream(1)
    x = jnp.asarray(np.random.RandomState(0).rand(
        1, args.chunk, args.size, args.size, 3), jnp.float32)

    def one(carry, _):
        (logits, carry), _st = model.apply(
            variables, x, carry, train=False, policy=policy)
        return carry, jnp.sum(logits)

    @jax.jit
    def run(h, c):
        (h, c), outs = lax.scan(one, (h, c), None, length=args.reps)
        return outs

    # bf16 carries: the LSTM emits compute-dtype state, and lax.scan needs
    # a dtype-stable carry (zero init is exact in either dtype)
    h0 = jax.device_put(jnp.asarray(h0, jnp.bfloat16))
    c0 = jax.device_put(jnp.asarray(c0, jnp.bfloat16))
    sync(run(h0, c0))
    t0 = time.perf_counter()
    sync(run(h0, c0))
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    fps = args.chunk / (ms / 1e3)
    print(f"{args.model}2d chunk={args.chunk} {args.size}^2: "
          f"{ms:.2f} ms/chunk ({fps:.0f} fps online)", flush=True)


if __name__ == "__main__":
    main()
