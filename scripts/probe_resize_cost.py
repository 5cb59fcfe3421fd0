"""On-chip cost of the in-graph preprocessing resize (config.input_size).

Measures (in-graph fori_loop timing, the kernel_evidence standard), at
the flagship bench shape (bs=16 T=32 -> 224²):

  1. preprocess alone: native 224² (no resize) vs 480p and 720p inputs
     resized on device to 224² — the added milliseconds per batch;
  2. the HBM floor for each: the resize must read the native-res uint8
     frames once (that traffic is unavoidable the moment the dataset is
     native-res; the alternative is a HOST-side cv2 resize on the 1-core
     VM, which measures ~2 orders slower per batch).

Run on the real chip: python scripts/probe_resize_cost.py
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

from picklebot_tpu.train.step import preprocess

B, T, SIZE = 16, 32, 224
HBM_GBPS = 819e9


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit_pre(h, w, reps=20):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (B, T, h, w, 3)), jnp.uint8)

    @jax.jit
    def looped(x0):
        # body must close over the jit ARGUMENT, not the host array —
        # a closed-over numpy constant gets baked into the program and
        # the 471 MB 720p input blows the remote compiler's request cap
        def body(i, acc):
            y = preprocess(x0 + i.astype(jnp.uint8), jnp.bfloat16,
                           input_size=SIZE)
            return acc + jnp.sum(y.astype(jnp.float32))
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
    sync(looped(x))
    t0 = time.perf_counter()
    sync(looped(x))
    ms = (time.perf_counter() - t0) / reps * 1e3
    in_bytes = B * T * h * w * 3
    floor_ms = in_bytes / HBM_GBPS * 1e3
    print(f"preprocess {h}x{w} -> {SIZE}²: {ms:7.3f} ms/batch "
          f"(uint8 read floor {floor_ms:.3f} ms)")
    return ms


def host_resize_ms(h, w, frames=8):
    """The host alternative: cv2 per-frame resize on this 1-core VM,
    extrapolated to the full batch."""
    import cv2
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 255, (frames, h, w, 3)).astype(np.uint8)
    t0 = time.perf_counter()
    for f in clip:
        cv2.resize(f, (SIZE, SIZE), interpolation=cv2.INTER_AREA)
    per_frame = (time.perf_counter() - t0) / frames
    return per_frame * B * T * 1e3


def main():
    global B
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--batch", type=int, default=B)
    args = p.parse_args()
    B = args.batch
    base = timeit_pre(SIZE, SIZE, reps=args.reps)
    # 1080p (round 5): 16x32x1080x1920x3 = 3.2 GB of uint8 input per
    # batch — passed as the jit ARGUMENT (never a baked constant, the
    # round-4 HTTP-413 landmine), so only HBM capacity binds, not the
    # compiler request cap
    for h, w in ((480, 640), (720, 1280), (1080, 1920)):
        try:
            ms = timeit_pre(h, w, reps=args.reps)
        except Exception as e:
            print(f"preprocess {h}x{w}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})")
            continue
        print(f"  resize overhead vs native: +{ms - base:.3f} ms/batch; "
              f"host cv2 alternative ~{host_resize_ms(h, w):.0f} ms/batch")


if __name__ == "__main__":
    main()
