"""Standalone MobileViT profiling harness.

Capability parity with reference profilemobilevit.py (torch.profiler forward
profile) and profiling_mobilevit.py's profile_model (fwd+bwd timing): runs a
jitted forward and a full train-step fwd+bwd on MobileViT and reports
steady-state timings, achieved FLOP/s from XLA's cost analysis, and HBM
usage; optionally dumps a jax.profiler trace viewable in TensorBoard.

Usage: python scripts/profile_mobilevit.py [--size xxs|xs|s] [--batch 4]
           [--frames 16] [--res 224] [--trace-dir DIR] [--backend auto]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="xxs", choices=["xxs", "xs", "s"])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.mobilevit import MOBILEVIT_CONFIGS, MobileViT
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import create_train_state, make_train_step
    from picklebot_tpu.utils.profiling import memory_stats, timeit_fn, trace

    cfg = MOBILEVIT_CONFIGS[args.size]
    model = MobileViT(dims=cfg["dims"], channels=cfg["channels"],
                      num_classes=13, attention_backend=args.backend)
    policy = DtypePolicy.bf16()
    variables = model.init(0)
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randint(
        0, 255, (args.batch, args.frames, args.res, args.res, 3)
    ).astype(np.uint8))

    fwd = jax.jit(lambda v, x: model.apply(
        v, (x.astype(policy.compute_dtype) / 255), train=False,
        policy=policy)[0])
    lowered = fwd.lower(variables, x)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    stats = timeit_fn(fwd, variables, x, warmup=2, iters=5)
    flops = ca.get("flops", 0)
    print(f"[fwd ] {stats['median_s']*1e3:8.1f} ms  "
          f"{args.batch/stats['median_s']:7.1f} clips/s  "
          f"{flops/stats['median_s']/1e12:5.1f} TFLOP/s")

    opt = AdamW8bit(weight_decay=5e-4)
    step = make_train_step(model, opt, "CE",
                           cosine_annealing_lr(3e-4, 100), policy=policy,
                           donate=False)
    state = create_train_state(model, opt, 0)
    labels = jax.device_put(
        rng.randint(0, 13, (1, args.batch)).astype(np.int32))
    xb = x[None]
    key = jax.random.key(0)
    stats = timeit_fn(lambda s, f, l, k: step(s, f, l, k)[1]["loss"],
                      state, xb, labels, key, warmup=2, iters=5)
    print(f"[step] {stats['median_s']*1e3:8.1f} ms  "
          f"{args.batch/stats['median_s']:7.1f} clips/s")
    mem = memory_stats()
    if mem:
        print(f"[hbm ] {mem['peak_bytes_in_use']/1e9:.2f} GB peak")

    if args.trace_dir:
        with trace(args.trace_dir):
            jax.block_until_ready(fwd(variables, x))
            jax.block_until_ready(step(state, xb, labels, key)[1]["loss"])
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
