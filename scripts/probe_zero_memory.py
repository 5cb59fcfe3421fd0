"""ZeRO's memory payoff at bench shapes — the table for docs/BENCH.md.

Round 4's collective-bytes table proved ZeRO-1/3 cost the SAME wire bytes
as plain DP; this probe shows what that buys: per-rank at-rest state bytes
(params + optimizer moments, the pytrees Orbax snapshots) and the compiled
program's per-device footprint from XLA's memory_analysis (argument +
temp + output) for replicated DP vs ZeRO-1 vs ZeRO-3 on the virtual
8-device mesh at MobileNetLarge3D bench geometry.

At-rest rows run for fp32 AdamW AND AdamW8bit (cheap, host numpy);
compiled rows run for the bench optimizer (adamw8bit) only — XLA-CPU
compiles of the full Large3D step are ~6 min each (CLAUDE.md).

Usage (CPU virtual mesh — memory is shape arithmetic, not device-bound):
  python scripts/probe_zero_memory.py [--batch 16] [--frames 32]
      [--hw 224] [--n 8] [--skip-compile]

Ordering invariant (stage3 < stage1 < replicated) is pinned in
tests/test_zero_memory.py; this probe records the magnitudes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402


def tree_bytes(tree):
    return int(sum(np.asarray(l).nbytes
                   for l in jax.tree_util.tree_leaves(tree)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16,
                   help="PER-RANK batch (the bench per-chip workload)")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--hw", type=int, default=224)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--skip-compile", action="store_true",
                   help="at-rest table only (no 6-min XLA-CPU compiles)")
    args = p.parse_args()
    n = args.n

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.mobilenet3d import MobileNetLarge3D
    from picklebot_tpu.parallel.mesh import make_mesh
    from picklebot_tpu.parallel.zero import (zero3_shard_params,
                                             zero3_state_specs,
                                             zero_state_specs,
                                             param_templates)
    from picklebot_tpu.train.optim import (AdamW, AdamW8bit,
                                           cosine_annealing_lr)
    from picklebot_tpu.train.step import create_train_state, make_train_step

    model = MobileNetLarge3D(num_classes=13)

    # ---- at-rest per-rank bytes (host numpy, both optimizers) ----
    for opt_name, opt_cls in (("adamw_fp32", AdamW), ("adamw8bit", AdamW8bit)):
        opt = opt_cls(weight_decay=5e-4)
        rep = create_train_state(model, opt, 0)
        mom = lambda s: tree_bytes(s.opt_state["m"]) + tree_bytes(
            s.opt_state["v"])
        pb = tree_bytes(rep.params)
        z = create_train_state(model, opt, 0, zero_degree=n)
        rows = {
            "replicated": pb + mom(rep),
            "zero1": pb + mom(z) // n,
            "zero3": tree_bytes(zero3_shard_params(z.params, n)) // n
                     + mom(z) // n,
        }
        print(json.dumps({"table": "at_rest_per_rank_mb", "opt": opt_name,
                          "params_mb": round(pb / 1e6, 2),
                          **{k: round(v / 1e6, 2) for k, v in rows.items()}}),
              flush=True)

    if args.skip_compile:
        return

    # ---- compiled per-device footprint (bench optimizer) ----
    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    opt = AdamW8bit(weight_decay=5e-4)
    sched = cosine_annealing_lr(3e-4, 100)
    feats_sds = jax.ShapeDtypeStruct(
        (1, args.batch * n, args.frames, args.hw, args.hw, 3), np.uint8)
    labels_sds = jax.ShapeDtypeStruct((1, args.batch * n), np.int32)
    key_sds = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    for layout in ("replicated", "zero1", "zero3"):
        zd = 0 if layout == "replicated" else n
        zs = 3 if layout == "zero3" else 1
        state = create_train_state(model, opt, 0, zero_degree=zd)
        templates = None
        if layout == "zero3":
            templates = param_templates(state.params)
            state = state._replace(
                params=zero3_shard_params(state.params, n))
            specs = zero3_state_specs(state)
        elif layout == "zero1":
            specs = zero_state_specs(state)
        else:
            specs = None
        step = make_train_step(model, opt, "CE", sched,
                               policy=DtypePolicy.bf16(), mesh=mesh,
                               donate=False, state_specs=specs,
                               zero_degree=zd, zero_stage=zs,
                               zero3_templates=templates)
        sds = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.asarray(a).shape,
                                           np.asarray(a).dtype), state)
        t0 = time.time()
        compiled = step.lower(sds, feats_sds, labels_sds, key_sds).compile()
        ma = compiled.memory_analysis()
        print(json.dumps({
            "table": "compiled_per_device_mb", "layout": layout,
            "arg_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
            "out_mb": round(ma.output_size_in_bytes / 1e6, 1),
            "total_mb": round((ma.argument_size_in_bytes
                               + ma.temp_size_in_bytes
                               + ma.output_size_in_bytes) / 1e6, 1),
            "compile_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
