"""Smoke tests for the two driver-facing artifacts.

bench.py prints the round-recorded JSON line and __graft_entry__.entry()
is compile-checked by the driver — a regression in either silently costs a
round, so both run here at tiny shapes on the CPU platform (conftest pins
it)."""

import json
import sys

import jax
import numpy as np


def test_bench_main_tiny(monkeypatch, capsys):
    import bench
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--batch", "2", "--frames", "2", "--size", "32",
        "--steps", "1", "--warmup", "1"])
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "timing"}
    assert rec["value"] > 0 and np.isfinite(rec["value"])
    assert rec["unit"] == "clips/s"
    assert rec["timing"] == "graph"  # the methodology travels with the number


def test_bench_infer_tiny(monkeypatch, capsys):
    import bench
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--mode", "infer", "--batch", "2", "--frames", "2",
        "--size", "32", "--steps", "1", "--warmup", "1"])
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] > 0


def test_graft_entry_forward():
    from __graft_entry__ import entry
    fn, args = entry()
    logits = jax.jit(fn)(*args)
    assert logits.shape == (2, 13)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


def test_bench_matrix_tiny(monkeypatch, capsys, tmp_path):
    """--matrix writes the incremental JSON artifact with a timing field
    per row (round-5: machine-generated BENCH_MATRIX, diffable across
    rounds). One tiny row on CPU; failed rows must be recorded, not fatal."""
    import bench
    out = tmp_path / "matrix.json"
    monkeypatch.setattr(bench, "MATRIX_ROWS", [
        ("MobileNetLarge3D", None, "train", 2, 2, 32, False),
        ("MobileNetLarge3D", None, "infer", 2, 2, 32, True),
        ("MobileNetLarge3D", None, "train", 2, 2, 32, False, 1),  # remat
    ])
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--matrix", "--matrix-out", str(out),
        "--steps", "1", "--warmup", "1"])
    bench.main()
    rec = json.loads(out.read_text())
    assert len(rec["rows"]) == 3
    for row in rec["rows"]:
        assert row["timing"] in ("graph", "graph-baked")
        assert row["value"] is None or row["value"] > 0
    assert rec["rows"][1]["baked"] and rec["rows"][1]["timing"] == "graph-baked"
    assert rec["rows"][2]["remat"] == 1 and rec["rows"][2]["value"] > 0
    # --matrix-append: recorded rows are skipped (no re-measurement), new
    # MATRIX_ROWS entries are measured and appended to the same artifact
    monkeypatch.setattr(bench, "MATRIX_ROWS", bench.MATRIX_ROWS + [
        ("MobileNetSmall3D", None, "infer", 2, 2, 32, False),
    ])
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--matrix", "--matrix-append",
        "--matrix-out", str(out), "--steps", "1", "--warmup", "1"])
    bench.main()
    rec2 = json.loads(out.read_text())
    assert len(rec2["rows"]) == 4                  # 3 kept + 1 appended
    assert rec2["rows"][:3] == rec["rows"]         # untouched, not re-run
    assert rec2["rows"][3]["model"] == "MobileNetSmall3D"
    assert "appended" in rec2
