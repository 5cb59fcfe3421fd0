"""Transfer-learning warm start (config ``warm_start_partial``).

The reference has no fine-tune entry at all — its users run the standard
torch recipe by hand (delete the mismatched state_dict keys, then
``load_state_dict(strict=False)``, reference train.py loads checkpoints
only as full weight sets). ``warm_start_partial`` is that recipe as a
config key: donor leaves whose path AND shape match the fresh init graft,
everything else (e.g. a classifier head trained at a different
``num_classes``) keeps the fresh initialization.
"""

import numpy as np
import pytest

from picklebot_tpu.train.loop import train
from tests.test_train_loop import _smoke_config


def _leaves(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_leaves(v, p))
        else:
            flat[p] = np.asarray(v)
    return flat


def test_graft_matching_unit():
    from picklebot_tpu.train.checkpoint import graft_matching
    donor = {"a": {"w": np.ones((3, 13), np.float32)},
             "b": np.full((5,), 2.0, np.float32),
             "gone": np.ones((2,), np.float32)}
    fresh = {"a": {"w": np.zeros((3, 4), np.float32)},
             "b": np.zeros((5,), np.float32),
             "new": np.zeros((1,), np.float32)}
    merged, grafted, skipped = graft_matching(donor, fresh)
    assert grafted == ["b"]
    assert dict(skipped) == {
        "a.w": "donor shape (3, 13) != fresh (3, 4)",
        "gone": "no matching leaf in the fresh model"}
    np.testing.assert_array_equal(merged["b"], donor["b"])     # transferred
    np.testing.assert_array_equal(merged["a"]["w"], fresh["a"]["w"])
    np.testing.assert_array_equal(merged["new"], fresh["new"])  # kept


def test_import_torch_partial_keeps_mismatched_head():
    """.pth donors: a torch leaf whose shape can't convert (different class
    count) keeps the fresh init under partial=True instead of raising."""
    from picklebot_tpu.train.checkpoint import import_torch_state_dict
    variables = {
        "params": {"conv": {"w": np.zeros((3, 3, 8, 8), np.float32)},
                   "fc": {"w": np.zeros((8, 4), np.float32),
                          "b": np.zeros((4,), np.float32)}},
        "state": {}}
    sd = {"conv.weight": np.ones((8, 8, 3, 3), np.float32),
          "fc.weight": np.ones((13, 8), np.float32),
          "fc.bias": np.ones((13,), np.float32)}
    with pytest.raises(ValueError):
        import_torch_state_dict(sd, variables, strict=False, partial=False)
    out = import_torch_state_dict(sd, variables, strict=False, partial=True)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["conv"]["w"]), 1.0)  # converted + grafted
    np.testing.assert_array_equal(
        np.asarray(out["params"]["fc"]["w"]), 0.0)    # head kept fresh
    np.testing.assert_array_equal(np.asarray(out["params"]["fc"]["b"]), 0.0)


def test_config_validates_warm_start_partial():
    from picklebot_tpu.utils.config import Config
    with pytest.raises(ValueError, match="warm_start_partial"):
        Config(model_name="MobileNetSmall3D", checkpoint="x",
               warm_start_partial=True).validate()


def test_config_rejects_labels_past_logits():
    """synthetic_classes > num_classes under CE = out-of-range labels =
    silently-NaN training (CE's OOB gather fills NaN) — config errors."""
    from picklebot_tpu.utils.config import Config
    with pytest.raises(ValueError, match="NaN"):
        Config(model_name="MobileNetSmall3D", num_classes=4,
               data_backend="synthetic", synthetic_classes=13).validate()
    # fewer classes than logits is the statistical gates' setup: fine
    Config(model_name="MobileNetSmall3D", num_classes=13,
           data_backend="synthetic", synthetic_classes=4).validate()


def test_loop_rejects_csv_labels_past_logits(tmp_path):
    """Real annotation files get the same loud startup check."""
    from picklebot_tpu.train.loop import _make_datasets
    from picklebot_tpu.utils.config import Config
    csv = tmp_path / "ann.csv"
    csv.write_text("filename,zone\na.mp4,0\nb.mp4,13\n")
    cfg = Config(model_name="MobileNetSmall3D", num_classes=13,
                 data_backend="opencv",
                 train_annotations_file=str(csv),
                 val_annotations_file=str(csv),
                 video_paths=str(tmp_path)).validate()
    with pytest.raises(ValueError, match="label 13"):
        _make_datasets(cfg)


def test_loop_rejects_synthetic_labels_past_logits_without_validate():
    """A programmatically built Config never runs validate() (only
    load_config calls it) — _make_datasets must still refuse a synthetic
    label range past the logit range, or CE NaN-fills silently."""
    from picklebot_tpu.train.loop import _make_datasets
    from picklebot_tpu.utils.config import Config
    cfg = Config(model_name="MobileNetSmall3D", num_classes=4,
                 data_backend="synthetic", synthetic_classes=13)
    with pytest.raises(ValueError, match="NaN"):
        _make_datasets(cfg)


@pytest.mark.slow
def test_warm_start_partial_different_head(tmp_path, monkeypatch):
    """End-to-end: a 13-class donor fine-tunes into a 4-class run. At lr=0
    every grafted leaf stays bit-identical to the donor; the head leaves
    are fresh-init shapes the donor never had."""
    monkeypatch.chdir(tmp_path)
    sa = train(_smoke_config(tmp_path, max_iters=1))   # donor: 13 classes
    assert sa["val_losses"]
    from picklebot_tpu.train.checkpoint import (latest_checkpoint,
                                                restore_checkpoint)
    snap = latest_checkpoint(str(tmp_path / "ckpt" / "MobileNetSmall3D"))
    donor = restore_checkpoint(snap)

    ft = tmp_path / "ft"
    ft.mkdir()
    monkeypatch.chdir(ft)
    # synthetic_classes must follow num_classes: out-of-range labels hit
    # CE's NaN-fill gather (the 4-class task is the new label space)
    cfg = _smoke_config(ft, max_iters=1, num_classes=4, synthetic_classes=4,
                        learning_rate=0.0, checkpoint=snap, warm_start=True,
                        warm_start_partial=True)
    sb = train(cfg)
    assert sb["val_losses"] and np.isfinite(sb["final_val_loss"])

    tuned = restore_checkpoint(
        latest_checkpoint(str(ft / "ckpt" / "MobileNetSmall3D")))
    dl = _leaves(donor["params"])
    tl = _leaves(tuned["params"])
    grafted = fresh = 0
    for path in sorted(tl):
        if path in dl and dl[path].shape == tl[path].shape:
            np.testing.assert_array_equal(dl[path], tl[path], err_msg=path)
            grafted += 1
        else:
            fresh += 1
    assert grafted > 10, "backbone did not transfer"
    assert fresh >= 2, "the 4-class head should not match the 13-class donor"


@pytest.mark.slow
def test_warm_start_partial_rejects_foreign_donor(tmp_path, monkeypatch):
    """Zero grafted leaves = wrong donor: loud error, not a silent
    fresh-init run pretending to fine-tune."""
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu.train import checkpoint as ckpt
    snap = ckpt.save_checkpoint(
        str(tmp_path / "donor"), 0,
        {"params": {"alien": {"w": np.ones((7, 7), np.float32)}},
         "model_state": {"alien": {"mean": np.zeros((7,), np.float32)}}})

    cfg = _smoke_config(tmp_path, max_iters=1, checkpoint=snap,
                        warm_start=True, warm_start_partial=True)
    with pytest.raises(ValueError, match="NO donor param leaf"):
        train(cfg)
