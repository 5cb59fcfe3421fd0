"""Measurement-driven execution-plan autotuner.

The TPU-native analog of the cuDNN benchmark autotuner the reference
enables whenever input sizes are static (reference train.py:193-194:
``cudnn.benchmark = True`` unless ``varying_input_size``). cuDNN picks
conv algorithms by timing them on the live device; here the tunable
surface is the folded-execution plan lattice (``early_fold`` on/off x
the model's ``fold_span`` vocabulary) — every candidate is an *exact*
rewrite (same logits/grads, tests/test_early_fold*.py), so the choice is
purely a performance decision, and which plan wins is a measured
constant of (model, batch, clip shape, train-vs-infer, device
generation) that cannot be derived offline (docs/BENCH.md records the
sign flipping between 3-D and 2-D trunks, between batch 16 and 128, and
between train and inference for the same span).

Three layers:

  * ``default_plan(model, batch, mode)`` — the v5e-measured static table
    (docs/BENCH.md); zero-cost, used by bench.py and anything that does
    not opt into measurement.
  * ``autotune(config, mode)`` — measure every candidate plan on the
    live device at the configured shape and return the winner. One XLA
    compile per candidate (minutes each on TPU), so verdicts persist in
    a JSON cache keyed by device kind + model + shape + mode; the search
    runs once per (device, workload).
  * ``autotune_config(config, mode)`` — the ``train()``/CLI entry:
    honors the reference's semantics (``varying_input_size`` disables
    autotuning exactly as it disables cudnn.benchmark), consults the
    cache, and returns a Config with ``early_fold``/``fold_span`` set to
    the winning plan.

CLI: ``python -m picklebot_tpu.utils.autotune <config.json> [--mode
infer] [--batch N --frames T --size S]`` prints the per-candidate
measurements and writes the cache other entry points will hit.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import List, Optional, Tuple

Plan = Tuple[bool, Optional[str]]  # (early_fold, fold_span)


def default_plan(model_name: str, batch: int = 16,
                 mode: str = "train", dims=None) -> Plan:
    """The v5e-measured static defaults (docs/BENCH.md). ``mode`` is part
    of the signature because train/infer winners can differ; at the
    measured points the batch rule below already captures the one known
    divergence (Large3D boundary-span loses only at bs>=128 inference).
    ``dims`` (MobileViT transformer dims) selects the variant: the trunk
    fold wins only at xxs channel widths."""
    if model_name == "MobileNetLarge3D":
        # boundary span wins bs<=32 (train 496.8 vs 487.0, infer 1318 vs
        # 1285); at large batch the canonical expanded tensors' relayouts
        # stop paying (infer bs128: 2799 vs 2960) — block2 there
        return True, ("boundary" if batch <= 32 else "block2")
    if model_name == "MobileNetSmall3D":
        # block3[0] boundary fold beats the k5 dense collapse: 958.7 vs
        # 881.8 clips/s train bs=16
        return True, "boundary"
    if model_name == "MoViNetA2":
        # block2 span: train 117.1 / infer 342.4 vs plain 102/314.8 at
        # bs=8; boundary measured slower (110.9/327.7), stem-only ties
        # train and loses infer (118.3/302.6). Round-4 batch scaling
        # keeps the same winner: bs=16 train 134.5 vs plain 117.4, infer
        # 422.8 vs 347.3; bs=32 train 140.0 / infer 460.3 (docs/BENCH.md)
        return True, "block2"
    if model_name == "MobileViT":
        # xxs (dims[0]=64, stem C=16/24: heavy lane padding): the trunk
        # fold wins — train 286.3 vs plain 179, infer 678 at bs=8.
        # xs/s (dims[0]>=96, stem C=32+): the fold LOSES everywhere
        # measured (round 4: xs train 166.6 folded vs 200.6 plain, infer
        # 430.7 vs 743.4; s train 134.5 vs 188.2, infer 335.8 vs 707.4)
        # — wider stems pad less, so the fold's structural-zero MACs
        # stop being free. Default plain for them.
        if dims and dims[0] > 64:
            return False, "trunk"
        return True, "trunk"
    if model_name in ("MobileNetLarge2D", "MobileNetSmall2D"):
        # the 2-D trunks batch frames into large 4-D image convs — a
        # regime XLA serves well; the fold LOSES at every measured point
        # (Large2D train 418.9 vs plain 507.7, docs/BENCH.md). The span
        # is only the best-measured point should a user force the fold on.
        return False, ("block2" if model_name == "MobileNetLarge2D"
                       else "boundary")
    # MobileViTV2, MoViNetA2Stream: no folded path
    return False, None


def plan_candidates(model_name: str) -> List[Plan]:
    """The exact-plan lattice: plain + every fold_span the model defines."""
    from picklebot_tpu.models.registry import fold_spans_for
    spans = fold_spans_for(model_name)
    plans: List[Plan] = [(False, None)]
    if spans:
        plans += [(True, s) for s in spans]
    return plans


def _cache_path() -> str:
    return os.environ.get(
        "PICKLEBOT_AUTOTUNE_CACHE",
        os.path.expanduser("~/.cache/picklebot_tpu/autotune.json"))


def _load_cache(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _save_cache(path: str, cache: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(cache, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _tune_shape(config, mode: str) -> Tuple[int, ...]:
    """The representative device-input shape the search compiles at.

    batch from the config; clip geometry from ``autotune_shape`` (T, H, W)
    when given, else ``synthetic_shape`` (which defaults to the reference's
    224^2 and is the actual shape for the synthetic backends). For video
    backends with other clip geometry, set ``autotune_shape`` — a
    mismatched tune shape only risks a suboptimal (never incorrect) plan.
    """
    # batch_size is PER-DEVICE in this framework (train/loop.py computes
    # global_batch = batch_size * n_data), so the single-device measurement
    # below is exactly each device's workload at any parallelism degree —
    # no division by the mesh shape is needed here.
    b = config.batch_size
    t, h, w = config.autotune_shape or config.synthetic_shape
    if config.model_name == "MobileViTV2":      # image model: (B, H, W, C)
        return (b, h, w, 3)
    return (b, t, h, w, 3)


def _cache_key(config, mode: str, shape: Tuple[int, ...]) -> str:
    import jax
    dev = jax.devices()[0]
    dtype = "bf16" if config.use_autocast else "f32"
    # every architecture- or execution-affecting knob must be in the key:
    # MobileViT variants (xxs/xs/s) share model_name and differ only in
    # dims/channels, and space_to_depth / attention_backend change the
    # compiled program a plan is measured against
    arch = []
    if config.dims:
        arch.append("d" + ".".join(map(str, config.dims)))
    if config.channels:
        arch.append("c" + ".".join(map(str, config.channels)))
    if config.space_to_depth:
        arch.append("s2d")
    if config.attention_backend != "auto":
        arch.append(f"attn={config.attention_backend}")
    if mode == "train" and getattr(config, "remat", 0):
        # remat changes both compile success and the speed ordering
        # (bs=256 fails at remat=0, runs at remat=1 — round 5), so a
        # cached remat=0 verdict must not answer a remat=1 query
        arch.append(f"remat{config.remat}")
    return "|".join([
        f"{dev.platform}:{dev.device_kind}", config.model_name, mode,
        "x".join(map(str, shape)), dtype, f"nc{config.num_classes}",
        config.optimizer if mode == "train" else "-",
    ] + arch)


def measure_plan(config, plan: Plan, mode: str, shape: Tuple[int, ...],
                 steps: int = 10, warmup: int = 3, min_window: float = 0.3,
                 repeats: int = 2, timing: str = "host",
                 stats: Optional[dict] = None) -> float:
    """Clips(images)/s of one candidate plan at ``shape`` on the default
    device. This IS bench.py's harness (bench.py calls it): device-resident
    uint8 input, jitted whole step, value-readback sync (the remote-TPU
    tunnel returns from block_until_ready early — CLAUDE.md). The timed
    window auto-ranges up to ``min_window`` seconds (sub-30 ms wall-clock
    windows through the tunnel are latency noise, and plan margins are a
    few percent) and the best of ``repeats`` windows is returned (timing
    noise is one-sided: stray latency only ever slows a window down).

    ``timing``:
      * 'host' — a Python loop of dispatches with one trailing sync. The
        autotuner's candidate search uses this (relative margins, no extra
        compile); through the remote tunnel each dispatch serializes an
        RPC that does NOT pipeline, inflating the per-step time ~9-10% at
        bench shapes (measured round 4, Large3D bs=16: infer 10.03
        ms/step host vs 9.10 in-graph, train 31.76 vs 28.95) and worse
        as steps get faster (the roundtrip is a fixed tens-of-ms cost).
      * 'graph' — ``steps`` CHAINED steps inside one lax.fori_loop (train
        carries the TrainState; inference feeds the logits back into the
        input so no two iterations can overlap), ONE dispatch per window:
        device time, the repo's kernel-evidence standard. bench.py's
        reported number uses this. Residual error: one dispatch+sync
        roundtrip amortized over the whole window (<=0.2 ms/step).
      * 'graph-baked' — 'graph' for inference with the weights CLOSED
        OVER (compile-time constants) instead of passed as arguments:
        XLA folds BN into the convs and pre-lays-out weights, the same
        program shape the AOT export / `serve --exported` path runs
        (export.py bakes weights). Measured +43% at Large3D bs=16 —
        report it as the SERVING number, not the generic inference one.

    ``stats``: pass a dict to receive XLA's cost analysis of the measured
    program PER STEP — 'flops_per_step' and 'bytes_per_step' (graph
    timings only). XLA's HloCostAnalysis visits a while/fori_loop BODY
    ONCE (verified empirically: a 50-iteration fori_loop of matmuls
    reports exactly 1 matmul's flops), so the chained program's reported
    cost already IS per-step — do NOT divide by `steps` (a round-4 draft
    did, understating MFU 50x). Caveats recorded in docs/BENCH.md: flops
    of folded programs include the fold's structural-zero MACs, and
    'bytes accessed' is the optimized-HLO per-op operand/output sum — an
    approximation that can exceed real DMA traffic (buffer reuse, VMEM
    residency). Same compile as the timing, no extra device work — this
    feeds the hardware-utilization table in docs/BENCH.md."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train.optim import OPTIMIZERS, cosine_annealing_lr
    from picklebot_tpu.train.step import (create_train_state,
                                          make_predict_fn, make_train_step)

    early_fold, fold_span = plan
    # Measure the replicated-equivalent program on ONE device: every plan
    # is an exact rewrite, and TP/SP only change collectives (which need a
    # mesh this harness deliberately doesn't build — a model_parallel>1
    # config would trace psum('model') under plain jit and crash). The
    # serve/export paths establish the same strip-to-replicated pattern.
    from picklebot_tpu.utils.config import replicated_equivalent
    cfg = replicated_equivalent(dataclasses.replace(
        config, early_fold=early_fold, fold_span=fold_span,
        autotune=False, data_parallel=1))
    model = initialize_model(cfg)
    policy = DtypePolicy.bf16() if cfg.use_autocast else DtypePolicy.f32()
    rng = np.random.RandomState(0)
    feats_np = rng.randint(0, 255, shape).astype(np.uint8)
    batch = shape[0]

    if mode == "train":
        opt = OPTIMIZERS[cfg.optimizer](weight_decay=cfg.weight_decay)
        sched = cosine_annealing_lr(cfg.learning_rate, max(cfg.max_iters, 1))
        step = make_train_step(model, opt, cfg.criterion, sched,
                               policy=policy,
                               remat=getattr(cfg, "remat", 0))
        state = create_train_state(model, opt, jax.random.key(0))
        feats = jax.device_put(feats_np[None])              # accum = 1
        hi = 2 if cfg.criterion == "BCE" else cfg.num_classes
        labels = jax.device_put(
            rng.randint(0, hi, (1, batch)).astype(np.int32))

        def run(i):
            nonlocal state
            state, metrics = step(state, feats, labels, jax.random.key(i))
            return metrics["loss"]
    else:
        predict = make_predict_fn(model, policy)
        variables = jax.device_put(model.init(0))
        feats = jax.device_put(feats_np)

        def run(i):
            return predict(variables, feats)

    def sync(out):
        return float(jnp.sum(jnp.asarray(out, jnp.float32)))

    if timing in ("graph", "graph-baked"):
        from jax import lax
        if timing == "graph-baked" and mode != "infer":
            raise ValueError("timing='graph-baked' is inference-only "
                             "(training weights change every step)")
        if mode == "train":
            key0 = jax.random.key(0)
            state = jax.device_put(state)

            def looped(st, feats, labels, key):
                def body(i, carry):
                    st, _ = carry
                    st, metrics = step(st, feats, labels,
                                       jax.random.fold_in(key, i))
                    return st, jnp.sum(metrics["loss"])
                z = jnp.zeros((), jnp.float32)
                return lax.fori_loop(0, steps, body, (st, z))

            # explicit AOT lower->compile (identical program to jit-and-
            # call) so the SAME compile also yields XLA's cost analysis
            compiled = jax.jit(looped).lower(state, feats, labels,
                                             key0).compile()

            def window_graph():
                nonlocal state
                t0 = time.perf_counter()
                state, loss = compiled(state, feats, labels, key0)
                sync(loss)
                return time.perf_counter() - t0
        else:
            # re-derive the UNjitted forward for in-graph nesting
            from picklebot_tpu.train.step import preprocess as _pre

            def predict_local(v, f):
                x = _pre(f, policy.compute_dtype)
                return model.apply(v, x, train=False, policy=policy)[0]

            def chained(v, feats):
                def body(i, acc):
                    # logits feed back into the input: iteration i+1
                    # depends on iteration i, the loop cannot pipeline
                    f = feats + (acc[0, 0] * 1e-6).astype(feats.dtype)
                    return predict_local(v, f).astype(jnp.float32)
                nc = getattr(cfg, "num_classes", 13)
                z = jnp.zeros((batch, nc), jnp.float32)
                return lax.fori_loop(0, steps, body, z)

            if timing == "graph-baked":
                # weights closed over -> compile-time constants (the AOT
                # export / serve --exported program shape)
                compiled = jax.jit(
                    lambda f: chained(variables, f)).lower(feats).compile()

                def window_graph():
                    t0 = time.perf_counter()
                    sync(compiled(feats))
                    return time.perf_counter() - t0
            else:
                compiled = jax.jit(chained).lower(variables,
                                                  feats).compile()

                def window_graph():
                    t0 = time.perf_counter()
                    sync(compiled(variables, feats))
                    return time.perf_counter() - t0

        if stats is not None:
            # per-step program cost from the SAME compile as the timing.
            # HloCostAnalysis counts the fori_loop BODY ONCE (trip count
            # is not multiplied in — verified: a 50-step loop of matmuls
            # reports one matmul's flops), so ca IS the per-step cost
            # plus small loop/carry overhead; no /steps division.
            try:
                ca = compiled.cost_analysis() or {}
            except Exception:   # a backend without cost analysis: timing
                ca = {}         # is still valid, just no MFU columns
            if "flops" in ca:
                stats["flops_per_step"] = float(ca["flops"])
            if "bytes accessed" in ca:
                stats["bytes_per_step"] = float(ca["bytes accessed"])
        # ONE warmup window always (compile + warm): a graph window is
        # itself `steps` chained iterations, so per-step warmup counts
        # don't apply; `warmup` is a host-mode knob.
        window_graph()
        # NO multi-call auto-range here: every window call pays ONE full
        # tunnel dispatch+readback roundtrip (tens of ms), so repeating
        # calls re-introduces exactly the overhead graph timing removes
        # (measured round 4: 8 calls of a 72 ms window read 11.2 ms/step
        # where one 50-step window read 9.1). Amortization must come
        # from `steps` (baked into the program) — callers wanting device
        # time pass steps large enough that steps*step_time >> roundtrip
        # (bench.py defaults to 50). Best-of-`repeats` as in host mode.
        best = batch * steps / window_graph()
        for _ in range(max(repeats, 1) - 1):
            best = max(best, batch * steps / window_graph())
        return best

    it = 0
    for _ in range(warmup):
        sync(run(it))
        it += 1

    def window(n):
        nonlocal it
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run(it)
            it += 1
        sync(out)
        return time.perf_counter() - t0

    n, dt = steps, window(steps)
    while dt < min_window:           # auto-range: grow until resolvable
        n *= 2
        dt = window(n)
    best = batch * n / dt
    for _ in range(repeats - 1):
        best = max(best, batch * n / window(n))
    return best


def autotune(config, mode: str = "train", steps: int = 10, warmup: int = 3,
             cache_path: Optional[str] = None,
             verbose: bool = False) -> Plan:
    """Winning (early_fold, fold_span) for the config's workload, measured
    on the live device (cached). Single-candidate models short-circuit.

    cuDNN-benchmark failure semantics: a candidate that fails to compile
    or run (e.g. a remote-Mosaic rejection or an OOM at the tuned shape)
    is recorded and skipped, and the best *surviving* plan wins; only if
    every candidate fails does the search raise."""
    plans = plan_candidates(config.model_name)
    if len(plans) == 1:
        return plans[0]
    shape = _tune_shape(config, mode)
    path = cache_path or _cache_path()
    key = _cache_key(config, mode, shape)
    cache = _load_cache(path)
    hit = cache.get(key)
    if hit is not None and not hit.get("failed"):
        return hit["early_fold"], hit["fold_span"]

    # An entry with failed candidates is NOT a permanent verdict: the
    # failures may have been transient (the remote tunnel drops, the Mosaic
    # service 500s — CLAUDE.md), and a losing survivor must not be crowned
    # forever. Keep the successful measurements, retry only the failed
    # candidates, and re-decide.
    measured = dict(hit["measured"]) if hit else {}
    retry_only = set(hit["failed"]) if hit else None
    failed = {}
    best, best_rate = None, -1.0
    for plan in plans:
        name = f"fold:{plan[1]}" if plan[0] else "plain"
        if retry_only is not None and name not in retry_only:
            rate = measured.get(name)
            if rate is None:        # neither measured nor failed: re-run
                retry_only.add(name)
            else:
                if rate > best_rate:
                    best, best_rate = plan, rate
                continue
        try:
            rate = measure_plan(config, plan, mode, shape, steps, warmup)
        except Exception as e:  # noqa: BLE001 — any device/compile failure
            failed[name] = f"{type(e).__name__}: {e}"[:300]
            if verbose:
                print(f"  {name:>16}: FAILED ({type(e).__name__})")
            continue
        measured[name] = round(rate, 2)
        if verbose:
            print(f"  {name:>16}: {rate:8.1f} samples/s")
        if rate > best_rate:
            best, best_rate = plan, rate
    if best is None:
        raise RuntimeError(
            f"autotune: every candidate plan failed for {key}: {failed}")
    cache = _load_cache(path)   # re-read: another process may have added
    cache[key] = {"early_fold": best[0], "fold_span": best[1],
                  "samples_per_s": round(best_rate, 2),
                  "measured": measured, "unix_time": int(time.time()),
                  **({"failed": failed} if failed else {})}
    _save_cache(path, cache)
    return best


def autotune_config(config, mode: str = "train", **kw):
    """``train()``/CLI entry: Config -> Config with the tuned plan applied.

    ``varying_input_size=true`` skips the search and leaves the configured
    ``early_fold``/``fold_span`` untouched — the same condition under
    which the reference leaves cudnn.benchmark off (train.py:193-194),
    and with the same meaning: don't tune, keep configured behavior (a
    plan tuned at one shape is only evidence at that shape).

    Multi-process: only process 0 measures; the winner is broadcast so
    every host compiles the identical train-step program (independent
    noisy searches could pick different plans and desync the collectives).
    Non-zero processes wait inside the broadcast while process 0 compiles
    candidates — on a real pod, pre-warm the cache with the standalone
    CLI if the controller enforces collective timeouts shorter than a few
    compiles (~minutes each on TPU).
    """
    if config.varying_input_size:
        return dataclasses.replace(config, autotune=False)
    import jax
    if jax.process_count() > 1:
        plans = plan_candidates(config.model_name)
        idx = 0
        err = None
        if jax.process_index() == 0:
            # if the search raises (e.g. every candidate fails to
            # compile), still JOIN the broadcast with a sentinel: raising
            # before it would leave every other host blocked in the
            # collective until its timeout instead of exiting cleanly
            try:
                idx = plans.index(autotune(config, mode, **kw))
            except Exception as e:
                idx, err = -1, e
        import numpy as np
        from jax.experimental import multihost_utils
        idx = int(multihost_utils.broadcast_one_to_all(np.int32(idx)))
        if idx < 0:
            if err is not None:
                raise err
            raise RuntimeError(
                "autotune failed on process 0 (see its log); aborting on "
                f"process {jax.process_index()}")
        early_fold, fold_span = plans[idx]
    else:
        early_fold, fold_span = autotune(config, mode, **kw)
    return dataclasses.replace(config, early_fold=early_fold,
                               fold_span=fold_span, autotune=False)


def main(argv=None):
    import argparse

    from picklebot_tpu.utils.config import load_config

    p = argparse.ArgumentParser(
        description="Measure every exact execution plan for a config's "
                    "workload on the live device and cache the winner")
    p.add_argument("config", help="path to a config .json")
    p.add_argument("--mode", default="train", choices=["train", "infer"])
    p.add_argument("--batch", type=int, default=None,
                   help="override config batch_size")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    if args.batch:
        cfg = dataclasses.replace(cfg, batch_size=args.batch,
                                  effective_batch_size=args.batch)
    t, h, w = cfg.autotune_shape or cfg.synthetic_shape
    shape = (args.frames or t, args.size or h, args.size or w)
    cfg = dataclasses.replace(cfg, autotune_shape=shape)

    print(f"autotuning {cfg.model_name} {args.mode} at "
          f"{_tune_shape(cfg, args.mode)} "
          f"({len(plan_candidates(cfg.model_name))} candidate plans; one "
          f"XLA compile each — minutes per plan on TPU)")
    plan = autotune(cfg, args.mode, steps=args.steps, verbose=True)
    span = f"fold_span={plan[1]!r}" if plan[0] else "plain layout"
    print(f"winner: early_fold={plan[0]} {span}  (cached in "
          f"{_cache_path()})")


if __name__ == "__main__":
    main()
