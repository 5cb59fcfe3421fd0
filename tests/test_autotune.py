"""Tests for the measurement-driven execution-plan autotuner.

utils/autotune.py is the TPU-native analog of the reference's
``cudnn.benchmark = True`` (reference train.py:193-194): where cuDNN
times conv algorithms on the live device, the tunable surface here is
the exact folded-execution plan lattice. The search itself is device
measurement (covered by one tiny real run below); everything else —
the plan lattice, the static table's consistency with the models'
declared FOLD_SPANS, the cache, and the varying_input_size semantics —
is deterministic and tested hermetically with a stubbed measurer.
"""

import dataclasses
import json

import pytest

from picklebot_tpu.models.registry import MODELS, fold_spans_for
from picklebot_tpu.utils import autotune as at
from picklebot_tpu.utils.config import Config


def _cfg(**kw):
    kw.setdefault("model_name", "MobileNetSmall3D")
    kw.setdefault("batch_size", 2)
    kw.setdefault("effective_batch_size", 2)
    kw.setdefault("synthetic_shape", (2, 32, 32))
    kw.setdefault("data_backend", "synthetic")
    return Config(**kw).validate()


def test_default_plan_spans_are_declared():
    # the static table may only name spans the model class declares —
    # the same no-drift rule fold_spans_for enforces for Config.validate
    for name in MODELS:
        for batch in (8, 16, 128):
            for mode in ("train", "infer"):
                early, span = at.default_plan(name, batch, mode)
                spans = fold_spans_for(name)
                if early:
                    assert spans and span in spans, (name, span)
                elif span is not None:
                    # fold-off models may still carry a best-known span
                    assert spans and span in spans, (name, span)


def test_plan_candidates_lattice():
    plans = at.plan_candidates("MobileNetLarge3D")
    assert plans[0] == (False, None)
    spans = fold_spans_for("MobileNetLarge3D")
    assert plans[1:] == [(True, s) for s in spans]
    # no folded path -> single plain candidate
    assert at.plan_candidates("MobileViTV2") == [(False, None)]


def test_autotune_measures_once_then_caches(tmp_path, monkeypatch):
    cache = str(tmp_path / "autotune.json")
    calls = []

    def fake_measure(config, plan, mode, shape, steps=5, warmup=2):
        calls.append(plan)
        # make the last span the winner
        spans = fold_spans_for(config.model_name)
        return 100.0 + (spans.index(plan[1]) if plan[0] else -1)

    monkeypatch.setattr(at, "measure_plan", fake_measure)
    cfg = _cfg()
    plan = at.autotune(cfg, "train", cache_path=cache)
    spans = fold_spans_for(cfg.model_name)
    assert plan == (True, spans[-1])
    assert calls == at.plan_candidates(cfg.model_name)

    # second call: pure cache hit, no measurement
    calls.clear()
    assert at.autotune(cfg, "train", cache_path=cache) == plan
    assert calls == []

    # the cache records every candidate's number (debuggability)
    rec = json.load(open(cache))
    (entry,) = rec.values()
    assert entry["fold_span"] == spans[-1]
    assert len(entry["measured"]) == len(at.plan_candidates(cfg.model_name))


def test_cache_key_separates_modes_and_shapes(tmp_path, monkeypatch):
    cache = str(tmp_path / "autotune.json")
    monkeypatch.setattr(
        at, "measure_plan",
        lambda config, plan, mode, shape, steps=5, warmup=2:
            2.0 if plan == (False, None) else 1.0)
    cfg = _cfg()
    assert at.autotune(cfg, "train", cache_path=cache) == (False, None)
    # different mode and different shape each get their own entry
    at.autotune(cfg, "infer", cache_path=cache)
    cfg2 = dataclasses.replace(cfg, autotune_shape=(2, 64, 64))
    at.autotune(cfg2, "train", cache_path=cache)
    assert len(json.load(open(cache))) == 3


def test_varying_input_size_skips_measurement(monkeypatch):
    # reference semantics: cudnn.benchmark stays off when input sizes vary
    # (train.py:193-194); the search is skipped and the *configured*
    # execution plan is left untouched (don't tune != retune-to-default)
    def boom(*a, **kw):
        raise AssertionError("measured despite varying_input_size")

    monkeypatch.setattr(at, "measure_plan", boom)
    cfg = _cfg(varying_input_size=True, autotune=True,
               early_fold=True, fold_span="boundary")
    tuned = at.autotune_config(cfg, mode="train")
    assert (tuned.early_fold, tuned.fold_span) == (True, "boundary")
    assert tuned.autotune is False


def test_failed_candidate_skipped_and_recorded(tmp_path, monkeypatch):
    # cuDNN-benchmark failure semantics: a plan that fails to compile/run
    # is recorded and skipped; the best surviving plan wins
    cache = str(tmp_path / "autotune.json")

    def fragile(config, plan, mode, shape, steps=5, warmup=2):
        if plan == (False, None):
            raise RuntimeError("simulated Mosaic rejection")
        spans = fold_spans_for(config.model_name)
        return 10.0 + spans.index(plan[1])

    monkeypatch.setattr(at, "measure_plan", fragile)
    cfg = _cfg()
    spans = fold_spans_for(cfg.model_name)
    assert at.autotune(cfg, "train", cache_path=cache) == (True, spans[-1])
    (entry,) = json.load(open(cache)).values()
    assert "plain" in entry["failed"]
    assert "RuntimeError" in entry["failed"]["plain"]
    assert len(entry["measured"]) == len(spans)


def test_all_candidates_failing_raises(tmp_path, monkeypatch):
    def boom(*a, **kw):
        raise RuntimeError("device gone")

    monkeypatch.setattr(at, "measure_plan", boom)
    with pytest.raises(RuntimeError, match="every candidate plan failed"):
        at.autotune(_cfg(), "train",
                    cache_path=str(tmp_path / "autotune.json"))
    # nothing cached on total failure
    assert not (tmp_path / "autotune.json").exists()


def test_cache_key_separates_architectures(tmp_path, monkeypatch):
    # MobileViT xxs/xs/s share model_name and differ only in dims/channels;
    # space_to_depth changes the compiled program — each must key separately
    cache = str(tmp_path / "autotune.json")
    monkeypatch.setattr(
        at, "measure_plan",
        lambda config, plan, mode, shape, steps=5, warmup=2: 1.0)
    base = _cfg(model_name="MobileViT", batch_size=2, effective_batch_size=2,
                dims=[64, 80, 96],
                channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320])
    at.autotune(base, "train", cache_path=cache)
    xs = dataclasses.replace(base, dims=(96, 120, 144))
    at.autotune(xs, "train", cache_path=cache)
    s2d = _cfg(space_to_depth=True)
    at.autotune(s2d, "train", cache_path=cache)
    at.autotune(_cfg(), "train", cache_path=cache)
    assert len(json.load(open(cache))) == 4
    # remat changes compile success AND the speed ordering (round 5:
    # bs=256 fails at remat=0, runs at remat=1) — a remat=1 query must
    # not be answered by the cached remat=0 verdict
    at.autotune(_cfg(remat=1), "train", cache_path=cache)
    assert len(json.load(open(cache))) == 5


def test_autotune_config_applies_winner(tmp_path, monkeypatch):
    monkeypatch.setattr(
        at, "measure_plan",
        lambda config, plan, mode, shape, steps=5, warmup=2:
            3.0 if plan == (True, "boundary") else 1.0)
    cfg = _cfg(autotune=True)
    tuned = at.autotune_config(
        cfg, mode="train", cache_path=str(tmp_path / "c.json"))
    assert (tuned.early_fold, tuned.fold_span) == (True, "boundary")
    assert tuned.autotune is False  # no re-entry in train()


def test_single_candidate_short_circuits(monkeypatch):
    def boom(*a, **kw):
        raise AssertionError("no-fold model should not measure")

    monkeypatch.setattr(at, "measure_plan", boom)
    cfg = _cfg(model_name="MobileViTV2")
    assert at.autotune(cfg, "infer") == (False, None)


def test_config_parses_autotune_keys(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "autotune": True,
        "autotune_shape": [4, 64, 64]}))
    from picklebot_tpu.utils.config import load_config
    cfg = load_config(str(p))
    assert cfg.autotune is True
    assert cfg.autotune_shape == (4, 64, 64)


@pytest.mark.slow
def test_measure_plan_real_tiny():
    # one real end-to-end measurement (CPU, tiny shape): the harness the
    # search runs per candidate actually compiles and returns a rate
    cfg = _cfg()
    rate = at.measure_plan(cfg, (False, None), "infer", (2, 2, 32, 32, 3),
                           steps=1, warmup=1, min_window=0.0, repeats=1)
    assert rate > 0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["train", "infer"])
def test_measure_plan_graph_timing(mode):
    # bench.py's reported number uses timing='graph' (steps chained in one
    # lax.fori_loop, one dispatch per window — device time, not host-loop
    # dispatch time); both modes must compile and return a sane rate
    cfg = _cfg()
    rate = at.measure_plan(cfg, (False, None), mode, (2, 2, 32, 32, 3),
                           steps=2, warmup=1, min_window=0.0, repeats=1,
                           timing="graph")
    assert rate > 0


@pytest.mark.slow
def test_graph_stats_are_per_step():
    # The MFU/HBM columns (bench.py --matrix) come from cost_analysis of
    # the chained fori_loop program. XLA's HloCostAnalysis counts the loop
    # BODY ONCE (trip count is NOT multiplied in), so the reported
    # flops/bytes already are per-step — a /steps division (round-4 draft
    # bug) would understate MFU by the step count. Pin it: the same
    # workload at steps=1 and steps=8 must report ~equal flops_per_step.
    cfg = _cfg()
    s1, s8 = {}, {}
    at.measure_plan(cfg, (False, None), "infer", (2, 2, 32, 32, 3),
                    steps=1, warmup=1, min_window=0.0, repeats=1,
                    timing="graph", stats=s1)
    at.measure_plan(cfg, (False, None), "infer", (2, 2, 32, 32, 3),
                    steps=8, warmup=1, min_window=0.0, repeats=1,
                    timing="graph", stats=s8)
    if "flops_per_step" not in s1:
        pytest.skip("backend exposes no cost analysis")
    assert s8["flops_per_step"] == pytest.approx(
        s1["flops_per_step"], rel=0.3)
    if "bytes_per_step" in s1:
        assert s8["bytes_per_step"] == pytest.approx(
            s1["bytes_per_step"], rel=0.5)


@pytest.mark.slow
def test_measure_plan_graph_baked():
    # the SERVING number (bench.py --baked): weights closed over as
    # compile-time constants — the same program shape the AOT export /
    # `serve --exported` path runs (BN folded, weights pre-laid-out).
    # Must compile and return a sane rate; training must be rejected
    # (weights change every step, baking them is meaningless).
    cfg = _cfg()
    rate = at.measure_plan(cfg, (False, None), "infer", (2, 2, 32, 32, 3),
                           steps=2, warmup=1, min_window=0.0, repeats=1,
                           timing="graph-baked")
    assert rate > 0
    with pytest.raises(ValueError, match="inference-only"):
        at.measure_plan(cfg, (False, None), "train", (2, 2, 32, 32, 3),
                        steps=2, warmup=1, min_window=0.0, repeats=1,
                        timing="graph-baked")


def test_failed_entry_is_retried_not_permanent(tmp_path, monkeypatch):
    # a transiently-failed candidate must not crown a losing survivor
    # forever: a cache entry carrying failures re-measures ONLY the failed
    # candidates on the next search and promotes a retried winner
    cache = str(tmp_path / "autotune.json")
    calls = []

    def fragile(config, plan, mode, shape, steps=5, warmup=2):
        calls.append(plan)
        if plan == (False, None):
            raise RuntimeError("tunnel dropped mid-measure")
        return 10.0

    monkeypatch.setattr(at, "measure_plan", fragile)
    cfg = _cfg()
    first = at.autotune(cfg, "train", cache_path=cache)
    assert first[0] is True  # a fold span survived and won

    # the tunnel is back: plain now measures fast and must win; the
    # successful measurements are reused (only plain is re-measured)
    calls.clear()

    def healed(config, plan, mode, shape, steps=5, warmup=2):
        calls.append(plan)
        return 99.0

    monkeypatch.setattr(at, "measure_plan", healed)
    assert at.autotune(cfg, "train", cache_path=cache) == (False, None)
    assert calls == [(False, None)]

    # entry now has no failures -> permanent cache hit, zero measurement
    calls.clear()
    assert at.autotune(cfg, "train", cache_path=cache) == (False, None)
    assert calls == []
    (entry,) = json.load(open(cache)).values()
    assert "failed" not in entry


def test_measure_plan_strips_parallelism(monkeypatch):
    # a TP/SP config's psum('model')/axis_size('seq') would trace under
    # plain jit and crash; measure_plan must measure the replicated
    # equivalent (exact rewrite -> same plan verdict)
    from picklebot_tpu.models import registry

    class _Stop(Exception):
        pass

    seen = {}

    def spy(cfg):
        seen["cfg"] = cfg
        raise _Stop

    monkeypatch.setattr(registry, "initialize_model", spy)
    cfg = _cfg(model_name="MobileViT", model_parallel=2,
               sequence_parallel=2, data_parallel=4)
    with pytest.raises(_Stop):
        at.measure_plan(cfg, (False, None), "infer", (2, 2, 32, 32, 3))
    got = seen["cfg"]
    assert got.model_parallel == 1
    assert got.sequence_parallel == 1
    assert got.data_parallel == 1
