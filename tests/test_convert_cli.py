"""Checkpoint-conversion CLI (picklebot_tpu/convert.py): torch .pth <->
Orbax round trips preserve every parameter."""

import json

import jax
import numpy as np

from picklebot_tpu import convert
from picklebot_tpu.models.registry import initialize_model
from picklebot_tpu.train import checkpoint as ckpt
from picklebot_tpu.train.key_maps import export_rank_for
from picklebot_tpu.utils.config import Config


def test_pth_orbax_pth_roundtrip(tmp_path, capsys):
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic"}))

    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v0 = model.init(7)
    src = tmp_path / "w.pth"
    ckpt.save_pth(str(src), v0, rank_map=export_rank_for("MobileNetSmall3D"))

    # torch -> orbax
    rc = convert.main([str(src), "--config", str(cfg_path),
                       "--out", str(tmp_path / "ck")])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["format"] == "orbax"

    # orbax -> torch
    rc = convert.main([info["to"], "--config", str(cfg_path),
                       "--out", str(tmp_path / "back.pth"),
                       "--like", str(src)])
    assert rc == 0

    # full circle: load the re-exported .pth and compare every param
    v1 = ckpt.load_pth(str(tmp_path / "back.pth"),
                       model.init(0))
    flat0 = jax.tree_util.tree_leaves_with_path(v0["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(v1["params"])
    assert len(flat0) == len(flat1)
    for (k0, a), (k1, b) in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k0))


def test_convert_ema_weights(tmp_path, capsys):
    """--ema exports the ema_params stream from a snapshot (and fails
    actionably when the snapshot has none / the source is a .pth)."""
    import pytest

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic"}))

    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v = model.init(7)
    ema = jax.tree_util.tree_map(lambda p: np.asarray(p) + 1.0, v["params"])
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                                {"params": v["params"],
                                 "model_state": v["state"],
                                 "ema_params": ema})

    rc = convert.main([path, "--config", str(cfg_path), "--ema",
                       "--out", str(tmp_path / "ema.pth")])
    assert rc == 0
    back = ckpt.load_pth(str(tmp_path / "ema.pth"), model.init(0))
    for a, b in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(back["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # no EMA stream in the snapshot -> actionable error
    path2 = ckpt.save_checkpoint(str(tmp_path / "ck2"), 0,
                                 {"params": v["params"],
                                  "model_state": v["state"]})
    with pytest.raises(SystemExit, match="ema_params"):
        convert.main([path2, "--config", str(cfg_path), "--ema",
                      "--out", str(tmp_path / "x.pth")])
    # .pth source -> --ema is meaningless
    ckpt.save_pth(str(tmp_path / "w.pth"), v,
                  rank_map=export_rank_for("MobileNetSmall3D"))
    with pytest.raises(SystemExit, match="Orbax"):
        convert.main([str(tmp_path / "w.pth"), "--config", str(cfg_path),
                      "--ema", "--out", str(tmp_path / "y")])
