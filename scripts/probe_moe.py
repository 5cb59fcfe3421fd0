"""On-chip cost of the MoE FFN bank vs the dense FFN (single chip).

Expert parallelism itself cannot be measured in this environment (one
physical chip — docs/BENCH.md "Parallelism capabilities"), but the MoE
layer's single-device overhead CAN: the routed expert bank replaces the
dense FFN matmuls with router + one-hot dispatch/combine einsums + expert
matmuls over capacity slots. This probe measures MobileViT-xxs train and
inference throughput dense vs MoE (same total FFN width per expert, E
experts => E x the FFN parameters, top-2 => ~2x the FFN FLOPs + dispatch
overhead) on the autotune harness (ONE harness: utils/autotune.measure_plan).

Usage: python scripts/probe_moe.py [--experts 4] [--batch 8] [--frames 16]
Writes one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experts", type=int, default=4)
    p.add_argument("--top-k", type=int, default=2)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    from picklebot_tpu.utils.autotune import default_plan, measure_plan
    from picklebot_tpu.utils.config import Config

    shape = (args.batch, args.frames, args.size, args.size, 3)
    plan = default_plan("MobileViT", args.batch, "train")
    base = dict(model_name="MobileViT", num_classes=13,
                dims=[64, 80, 96],
                channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320])
    for tag, moe in (("dense", 0), (f"moe{args.experts}", args.experts)):
        cfg = Config(**base, moe_experts=moe, moe_top_k=args.top_k)
        for mode in ("train", "infer"):
            cps = measure_plan(cfg, plan, mode, shape, steps=args.steps)
            print(json.dumps({"variant": tag, "mode": mode,
                              "clips_per_sec": round(cps, 1),
                              "batch": args.batch, "frames": args.frames,
                              "experts": moe, "top_k": args.top_k,
                              "plan": list(plan)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
