"""Benchmark: MobileNetLarge3D training-step throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's profiled steady state (SURVEY.md §6 /
BASELINE.md): MobileNetLarge3D, 13 classes, batch 16, bf16, CrossEntropy,
full forward + backward + 8-bit AdamW update. The reference sustains
~2.1 clips/s/GPU (train_stats.prof: ~7.5 s/batch of 16 on the training GPU);
vs_baseline = our clips/s/chip divided by 2.1.

Data is pre-placed on device so the number measures compute, not the host
tunnel; input clips are T=32 frames at 224x224 (a ~1s pitch clip at 30fps —
the artifact doesn't record the exact T the reference used; fixed here for
reproducibility across rounds).

Usage: python bench.py [--mode train|infer] [--batch 16] [--frames 32]
                       [--steps 50] [--baked]
       python bench.py --matrix [--only Large3D] [--matrix-out FILE]

``--matrix`` measures the standard row set (every model/variant x mode x
standard batches — the BENCH.md tables, machine-generated) and writes ONE
JSON artifact with a ``timing`` field per row, so round-over-round perf is
diffable instead of hand-curated. Rows are written incrementally; a row
that fails (OOM, compile rejection) is recorded with its error and the
matrix continues.
"""

from __future__ import annotations

import argparse
import json

BASELINE_CLIPS_PER_SEC = 2.1  # reference steady-state train step (BASELINE.md)

# The standard matrix: (model, variant, mode, batch, frames, size, baked
# [, remat]). Mirrors docs/BENCH.md's curated tables; variant is
# MobileViT-only. Train rows at bs>=128 are the saturation curve
# (round-5); baked rows are the AOT serving program; the bs=256 rows
# document the compile wall (remat=0 fails the remote compiler) and the
# remat=1 lever that fits it (at a measured throughput cost — BENCH.md).
# MobileViTV2 is the 2D image model (size 256, no T).
MATRIX_ROWS = [
    ("MobileNetLarge3D", None, "train", 16, 32, 224, False),
    ("MobileNetLarge3D", None, "train", 64, 32, 224, False),
    ("MobileNetLarge3D", None, "train", 128, 32, 224, False),
    ("MobileNetLarge3D", None, "train", 256, 32, 224, False),
    ("MobileNetLarge3D", None, "train", 256, 32, 224, False, 1),
    ("MobileNetLarge3D", None, "infer", 16, 32, 224, False),
    ("MobileNetLarge3D", None, "infer", 64, 32, 224, False),
    ("MobileNetLarge3D", None, "infer", 128, 32, 224, False),
    ("MobileNetLarge3D", None, "infer", 256, 32, 224, False),
    ("MobileNetLarge3D", None, "infer", 16, 32, 224, True),
    ("MobileNetLarge3D", None, "infer", 128, 32, 224, True),
    ("MobileNetLarge3D", None, "infer", 256, 32, 224, True),
    ("MobileNetSmall3D", None, "train", 16, 32, 224, False),
    ("MobileNetSmall3D", None, "train", 64, 32, 224, False),
    ("MobileNetSmall3D", None, "infer", 16, 32, 224, False),
    ("MobileNetSmall3D", None, "infer", 64, 32, 224, False),
    ("MobileNetSmall3D", None, "infer", 64, 32, 224, True),
    ("MoViNetA2", None, "train", 8, 32, 224, False),
    ("MoViNetA2", None, "train", 32, 32, 224, False),
    ("MoViNetA2", None, "infer", 32, 32, 224, False),
    ("MoViNetA2", None, "infer", 64, 32, 224, False),
    ("MoViNetA2", None, "infer", 64, 32, 224, True),
    ("MobileViT", "xxs", "train", 8, 16, 256, False),
    ("MobileViT", "xxs", "infer", 8, 16, 256, False),
    ("MobileViT", "xxs", "infer", 32, 16, 256, False),
    ("MobileViT", "xxs", "infer", 32, 16, 256, True),
    ("MobileViT", "xs", "train", 8, 16, 256, False),
    ("MobileViT", "xs", "infer", 8, 16, 256, False),
    ("MobileViT", "s", "train", 8, 16, 256, False),
    ("MobileViT", "s", "infer", 8, 16, 256, False),
    ("MobileNetLarge2D", None, "train", 8, 16, 224, False),
    ("MobileNetLarge2D", None, "infer", 8, 16, 224, False),
    ("MobileNetLarge2D", None, "infer", 64, 16, 224, False),
    ("MobileNetLarge2D", None, "infer", 64, 16, 224, True),
    ("MobileNetSmall2D", None, "train", 8, 16, 224, False),
    ("MobileNetSmall2D", None, "infer", 8, 16, 224, False),
    ("MobileNetSmall2D", None, "infer", 64, 16, 224, False),
    ("MobileViTV2", None, "train", 32, 0, 256, False),
    ("MobileViTV2", None, "infer", 32, 0, 256, False),
    ("MobileViTV2", None, "infer", 128, 0, 256, False),
    ("MobileViTV2", None, "infer", 128, 0, 256, True),
    ("MobileViTV2", None, "infer", 256, 0, 256, False),
]


def _measure_row(model, variant, mode, batch, frames, size, baked,
                 remat=0, steps=50, warmup=3):
    """One matrix row -> result dict (shared path with the single-line
    bench: default_plan -> measure_plan, timing='graph'/'graph-baked')."""
    from picklebot_tpu.utils.autotune import default_plan, measure_plan
    from picklebot_tpu.utils.config import Config

    vit_dims = {
        "xxs": ([64, 80, 96],
                [16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320]),
        "xs": ([96, 120, 144],
               [16, 32, 48, 48, 64, 64, 80, 80, 96, 96, 384]),
        "s": ([144, 192, 240],
              [16, 32, 64, 64, 96, 96, 128, 128, 160, 160, 640]),
    }
    dims, channels = vit_dims.get(variant or "xxs", vit_dims["xxs"])
    early, span = default_plan(model, batch, mode,
                               dims=dims if model == "MobileViT" else None)
    cfg = Config(model_name=model, num_classes=13,
                 dims=dims, channels=channels,
                 early_fold=early, fold_span=span, remat=remat)
    is_image = model == "MobileViTV2"
    shape = ((batch, size, size, 3) if is_image
             else (batch, frames, size, size, 3))
    timing = "graph-baked" if baked else "graph"
    row = {"model": model, "variant": variant, "mode": mode,
           "batch": batch, "frames": None if is_image else frames,
           "size": size, "baked": baked,
           "plan": {"early_fold": early, "fold_span": span},
           "timing": timing, "steps": steps,
           "unit": "images/s" if is_image else "clips/s"}
    if remat:
        row["remat"] = remat
    try:
        stats: dict = {}
        row["value"] = round(measure_plan(
            cfg, (early, span), mode, shape,
            steps=steps, warmup=warmup, timing=timing, stats=stats), 2)
        # hardware utilization from the SAME compile (XLA cost analysis):
        # step time from the graph-timed number, peaks = v5e (197 bf16
        # TFLOP/s MXU, 819 GB/s HBM — the MFU table in docs/BENCH.md)
        if row["value"] and "flops_per_step" in stats:
            step_s = batch / row["value"]
            row["ms_per_step"] = round(1e3 * step_s, 3)
            row["tflops"] = round(stats["flops_per_step"] / step_s / 1e12, 2)
            row["mfu_pct"] = round(100 * row["tflops"] / 197.0, 2)
            if "bytes_per_step" in stats:
                row["hbm_gbps"] = round(
                    stats["bytes_per_step"] / step_s / 1e9, 1)
                row["hbm_pct"] = round(100 * row["hbm_gbps"] / 819.0, 1)
    except Exception as e:  # OOM / compile rejection: record, keep going
        row["value"] = None
        row["error"] = f"{type(e).__name__}: {e}"[:500]
    return row


def _row_key(r: dict):
    return (r["model"], r.get("variant"), r["mode"], r["batch"],
            r.get("frames") or 0, r["size"], bool(r.get("baked")),
            int(r.get("remat", 0)))


def run_matrix(args) -> None:
    import os
    import time
    rows = [r for r in MATRIX_ROWS
            if not args.only or args.only.lower() in r[0].lower()]
    out = {"rows": [], "steps": args.steps,
           "device": None, "started": time.strftime("%Y-%m-%d %H:%M:%S")}
    done = set()
    if args.matrix_append and os.path.exists(args.matrix_out):
        # grow an existing artifact: keep measured rows, only run rows
        # not yet recorded (successful OR failed — a recorded failure is
        # a datapoint; delete the row from the file to re-attempt it)
        with open(args.matrix_out) as fh:
            out = json.load(fh)
        done = {_row_key(r) for r in out["rows"]}
        out["appended"] = time.strftime("%Y-%m-%d %H:%M:%S")
    import jax
    out["device"] = str(jax.devices()[0].device_kind)
    for i, r in enumerate(rows):
        model, variant, mode, batch, frames, size, baked = r[:7]
        key = _row_key({"model": model, "variant": variant, "mode": mode,
                        "batch": batch, "frames": frames, "size": size,
                        "baked": baked,
                        "remat": int(r[7]) if len(r) > 7 else 0})
        if key in done:
            continue
        t0 = time.time()
        row = _measure_row(*r, steps=args.steps, warmup=args.warmup)
        row["measure_wall_s"] = round(time.time() - t0, 1)
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        # incremental so a kill loses at most one row — and atomic, so a
        # kill DURING the write can't truncate the already-measured rows
        tmp = args.matrix_out + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh, indent=1)
        os.replace(tmp, args.matrix_out)
    print(f"# matrix: {len(out['rows'])} rows -> {args.matrix_out}",
          flush=True)


def _require_devices(timeout_s: float = 900.0):
    """Fail fast (with an explicit JSON line) when the remote-TPU tunnel is
    dead instead of hanging forever (shared watchdog:
    picklebot_tpu/utils/devices.py). Compiles are NOT under this timeout —
    only the initial device discovery."""
    from picklebot_tpu.utils.devices import (DeviceDiscoveryTimeout,
                                             require_devices)
    try:
        return require_devices(timeout_s)
    except DeviceDiscoveryTimeout as e:
        print(json.dumps({
            "metric": "clips/sec/chip (unmeasured)",
            "value": 0.0, "unit": "clips/s", "vs_baseline": 0.0,
            "error": f"{e} — no measurement taken",
            "last_recorded": "BENCH_r03.json: 509.7 clips/s "
                             "(vs_baseline 242.7) on this same "
                             "workload, captured by the round-3 driver",
        }), flush=True)
        raise SystemExit(1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train", choices=["train", "infer"])
    p.add_argument("--model", default="MobileNetLarge3D",
                   help="any registry model (MobileViT uses xxs dims)")
    p.add_argument("--variant", default="xxs", choices=["xxs", "xs", "s"],
                   help="MobileViT size variant (reference "
                        "config/mobilevit_*.json dims/channels)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    # 50 chained in-graph steps per timed window: the window's single
    # tunnel dispatch+readback roundtrip amortizes to <1 ms/step even at
    # the fastest (inference) step times — see measure_plan timing='graph'
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--baked", action="store_true",
                   help="inference with weights as compile-time constants "
                        "(the AOT export / serve --exported program: XLA "
                        "folds BN + pre-lays-out weights, +43%% at "
                        "Large3D bs=16) — the SERVING number")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--matrix", action="store_true",
                   help="measure the standard row set (every model/variant "
                        "x mode x standard batches) and write ONE JSON "
                        "artifact with a timing field per row")
    p.add_argument("--matrix-out", default="BENCH_MATRIX.json")
    p.add_argument("--matrix-append", action="store_true",
                   help="grow an existing --matrix-out artifact: rows "
                        "already recorded (by model/mode/batch/... key) "
                        "are skipped, new MATRIX_ROWS entries are "
                        "measured and appended — so extending the "
                        "standard row set doesn't re-pay ~45 min of "
                        "re-measurement")
    p.add_argument("--only", default=None,
                   help="matrix row filter (substring of the model name)")
    p.add_argument("--remat", type=int, default=0,
                   help="activation-rematerialization depth (config.remat; "
                        "jax.checkpoint over child-module calls). Trades "
                        "recompute FLOPs for activation memory — the lever "
                        "for batches whose activations exceed HBM/compiler "
                        "limits (train bs=256 fails to compile at remat=0)")
    p.add_argument("--s2d", action="store_true",
                   help="space-to-depth stem (exact rewrite; MobileNet3D)")
    p.add_argument("--early-fold", dest="early_fold", action="store_true",
                   default=None,
                   help="lane-folded stem+block2 (exact; MobileNetLarge3D)")
    p.add_argument("--no-early-fold", dest="early_fold", action="store_false")
    p.add_argument("--fold-span", default=None,
                   help="fold depth (Large3D: block2|block4|boundary)")
    args = p.parse_args()
    if args.matrix:
        _require_devices()
        run_matrix(args)
        return
    # measured per-(model, batch, mode) plan defaults live in ONE place —
    # utils/autotune.py default_plan (the static table backing the
    # cudnn.benchmark-analog autotuner); the evidence is in docs/BENCH.md.
    # Every plan is an exact rewrite (tests/test_early_fold*.py), so the
    # flags only move throughput.
    from picklebot_tpu.utils.autotune import default_plan
    vit_variant_dims = {"xxs": [64, 80, 96], "xs": [96, 120, 144],
                        "s": [144, 192, 240]}[args.variant]
    plan_early, plan_span = default_plan(
        args.model, args.batch, args.mode,
        dims=vit_variant_dims if args.model == "MobileViT" else None)
    if args.fold_span is None:
        args.fold_span = plan_span
    if args.early_fold is None:
        args.early_fold = plan_early

    _require_devices()

    from picklebot_tpu.utils.autotune import measure_plan
    from picklebot_tpu.utils.config import Config

    vit_dims = {           # reference config/mobilevit_{xxs,xs,s}.json
        "xxs": ([64, 80, 96],
                [16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320]),
        "xs": ([96, 120, 144],
               [16, 32, 48, 48, 64, 64, 80, 80, 96, 96, 384]),
        "s": ([144, 192, 240],
              [16, 32, 64, 64, 96, 96, 128, 128, 160, 160, 640]),
    }[args.variant]
    cfg = Config(model_name=args.model, num_classes=13,
                 dims=vit_dims[0], channels=vit_dims[1],
                 space_to_depth=args.s2d, early_fold=args.early_fold,
                 fold_span=args.fold_span, remat=args.remat)
    # MobileViTV2 is the zoo's 2D image classifier (reference
    # mobilevitv2.py:266-305, (B, H, W, C) input, no clip dim)
    is_image = args.model == "MobileViTV2"
    shape = ((args.batch, args.size, args.size, 3) if is_image
             else (args.batch, args.frames, args.size, args.size, 3))
    # the measurement harness is the autotuner's (ONE harness: device-
    # resident uint8 input, jitted whole step, value-readback sync,
    # auto-ranged timed window — see measure_plan). timing='graph' chains
    # the steps inside one lax.fori_loop so the reported number is DEVICE
    # time (one dispatch per window): through the remote tunnel, host-loop
    # dispatches serialize an RPC each and inflate the per-step time
    # ~9-10% at bench shapes, worse at faster steps (round-4 measurement;
    # the candidate search keeps host windows — relative margins don't
    # need the extra exactness)
    if args.baked and args.mode != "infer":
        p.error("--baked is inference-only (training weights change every "
                "step); add --mode infer")
    timing = "graph-baked" if args.baked else "graph"
    clips_per_sec = measure_plan(
        cfg, (args.early_fold, args.fold_span), args.mode, shape,
        steps=args.steps, warmup=args.warmup, timing=timing)

    name = ("train step fwd+bwd+adamw8bit" if args.mode == "train"
            else ("batched inference, weights baked (AOT serving program)"
                  if args.baked else "batched inference"))
    tdesc = "" if is_image else f"T={args.frames} "
    sample = "images" if is_image else "clips"
    print(json.dumps({
        "metric": f"{sample}/sec/chip ({args.model}"
                  f"{'-' + args.variant if args.model == 'MobileViT' else ''}"
                  f" {name}, "
                  f"bs={args.batch} {tdesc}{args.size}x{args.size} "
                  f"bf16{f' remat={args.remat}' if args.remat else ''})",
        "value": round(clips_per_sec, 2),
        "unit": "images/s" if is_image else "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 2),
        # timing methodology, so cross-round BENCH_r*.json diffs don't
        # conflate measurement changes with real speedups (r03 'host' ->
        # r04 'graph' was ~9-10% of the apparent jump — docs/BENCH.md)
        "timing": timing,
    }))


if __name__ == "__main__":
    main()
