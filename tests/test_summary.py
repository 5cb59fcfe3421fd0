"""Model-summary utility (utils/summary.py): exact per-module param
accounting + XLA compiled-cost analysis (the torchinfo analog)."""

import json

import pytest

from picklebot_tpu.models.registry import initialize_model
from picklebot_tpu.utils.config import Config
from picklebot_tpu.utils import summary as S


@pytest.mark.parametrize("model_name,total", [
    ("MobileNetLarge3D", 4_205_675),     # reference-verified counts
    ("MobileNetSmall3D", 1_684_091),     # (SURVEY.md section 2.1 #14)
])
def test_param_table_totals_exact(model_name, total):
    model = initialize_model(Config(model_name=model_name, num_classes=13))
    rows = S.param_table(model)
    assert rows[-1] == ("total", total, 1.0)
    assert sum(n for _, n, _ in rows[:-1]) == total
    assert all(0 <= frac <= 1 for _, _, frac in rows)


def test_cost_summary_reports_flops():
    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    cost = S.cost_summary(model, (2, 4, 32, 32, 3))
    assert cost.get("flops", 0) > 1e6   # a real compiled-forward estimate


def test_summary_cli(tmp_path, capsys):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic"}))
    rc = S.main([str(cfg), "--frames", "4", "--size", "32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "total" in out and "1,684,091" in out and "GFLOP" in out


def test_cost_summary_streaming_model():
    """MoViNetA2Stream needs its carry threaded through apply()."""
    model = initialize_model(Config(model_name="MoViNetA2Stream",
                                    num_classes=13))
    cost = S.cost_summary(model, (1, 4, 32, 32, 3),
                          model_name="MoViNetA2Stream")
    assert cost.get("flops", 0) > 1e6
