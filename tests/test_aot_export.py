"""AOT StableHLO deployment artifacts (picklebot_tpu/export.py): the
TPU-native analog of the reference's torch.compile serving path
(reference train.py:179-182). One self-contained file, weights baked in,
symbolic batch dim, loadable without the model zoo."""

import json

import numpy as np
import pytest

from picklebot_tpu import export as pexp
from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.models.registry import initialize_model
from picklebot_tpu.utils.config import Config


def _small3d():
    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    return model, model.init(0), DtypePolicy.f32()


def test_roundtrip_symbolic_batch(tmp_path, rng):
    """One artifact serves every batch size; logits match the live model
    (identical f32 math — jax.export replays the same StableHLO)."""
    model, v, pol = _small3d()
    exp = pexp.export_predictor(model, v, pol, frames=6, size=64,
                                model_name="MobileNetSmall3D",
                                platforms=("cpu",))
    path = tmp_path / "m.pbz"
    pexp.save_artifact(path, exp, {"model_name": "MobileNetSmall3D",
                                   "num_classes": 13, "criterion": "CE",
                                   "frames": 6, "size": 64})
    fn, meta = pexp.load_artifact(path)
    assert meta["num_classes"] == 13
    live = pexp.build_predict_fn(model, v, pol, None, None,
                                 "MobileNetSmall3D")
    for b in (1, 3):
        x = rng.randint(0, 255, (b, 6, 64, 64, 3)).astype(np.uint8)
        got = np.asarray(fn(x))
        assert got.shape == (b, 13)
        np.testing.assert_allclose(got, np.asarray(live(x)),
                                   rtol=1e-5, atol=1e-5)


def test_pinned_batch_rejects_other_sizes(tmp_path, rng):
    model, v, pol = _small3d()
    exp = pexp.export_predictor(model, v, pol, frames=6, size=64,
                                model_name="MobileNetSmall3D", batch=2,
                                platforms=("cpu",))
    path = tmp_path / "m.pbz"
    pexp.save_artifact(path, exp, {"batch": 2})
    fn, _ = pexp.load_artifact(path)
    ok = rng.randint(0, 255, (2, 6, 64, 64, 3)).astype(np.uint8)
    assert np.asarray(fn(ok)).shape == (2, 13)
    bad = rng.randint(0, 255, (3, 6, 64, 64, 3)).astype(np.uint8)
    with pytest.raises(Exception):
        fn(bad)


def test_streaming_model_exports_whole_clip(tmp_path, rng):
    """MoViNetA2Stream exports its whole-clip pass (fresh stream buffers
    per call) — the batch dim stays symbolic through the carry zeros."""
    model = initialize_model(Config(model_name="MoViNetA2Stream",
                                    num_classes=13))
    v = model.init(0)
    pol = DtypePolicy.f32()
    exp = pexp.export_predictor(model, v, pol, frames=4, size=32,
                                model_name="MoViNetA2Stream",
                                platforms=("cpu",))
    path = tmp_path / "m.pbz"
    pexp.save_artifact(path, exp, {})
    fn, _ = pexp.load_artifact(path)
    x = rng.randint(0, 255, (2, 4, 32, 32, 3)).astype(np.uint8)
    got = np.asarray(fn(x))
    assert got.shape == (2, 13)
    live = pexp.build_predict_fn(model, v, pol, None, None,
                                 "MoViNetA2Stream")
    np.testing.assert_allclose(got, np.asarray(live(x)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_cli_and_serve(tmp_path, monkeypatch, capsys, rng):
    """End to end: checkpoint -> export CLI -> serve --exported on an mp4."""
    cv2 = pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu import serve
    from picklebot_tpu.train import checkpoint as ckpt

    model, v, _ = _small3d()
    ck = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                              {"params": v["params"],
                               "model_state": v["state"]})
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic"}))

    out = tmp_path / "model.pbz"
    rc = pexp.main([str(cfg_path), "--checkpoint", ck, "--out", str(out),
                    "--frames", "6", "--size", "48",
                    "--platforms", "cpu"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["batch"] == "symbolic"

    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (48, 48))
    for _ in range(9):   # longer than frames=6: serve trims
        w.write(rng.randint(0, 255, (48, 48, 3)).astype(np.uint8))
    w.release()

    rc = serve.main(["--exported", str(out), str(vid), str(vid)])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 2
    assert all(0 <= l["pred"] < 13 and 0 < l["confidence"] <= 1
               for l in lines)


@pytest.mark.parametrize("model_name,kw,shape", [
    ("MobileViT",
     dict(dims=[64, 80, 96],
          channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320]),
     (2, 4, 64, 64, 3)),
    ("MobileNetSmall2D", {}, (2, 4, 224, 224, 3)),   # fixed 7x7 AvgPool
    ("MobileViTV2", {}, (2, 64, 64, 3)),             # image model
    ("MobileViT",                                    # MoE expert bank:
     dict(dims=[16, 16, 16],                         # routing (argmax /
          channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],  # one-hot /
          moe_experts=4, attention_backend="xla"),   # cumsum) must lower
     (2, 4, 32, 32, 3)),
])
def test_export_model_families(tmp_path, rng, model_name, kw, shape):
    """The AOT path covers the whole zoo: attention (MobileViT), the
    LSTM scan (2D models) and the image-input MobileViTV2 all lower,
    serialize, reload and match the live model."""
    model = initialize_model(Config(model_name=model_name, num_classes=13,
                                    **kw))
    v = model.init(0)
    pol = DtypePolicy.f32()
    frames = shape[1] if len(shape) == 5 else 1
    size = shape[2] if len(shape) == 5 else shape[1]
    exp = pexp.export_predictor(model, v, pol, frames=frames, size=size,
                                model_name=model_name, platforms=("cpu",))
    path = tmp_path / "m.pbz"
    pexp.save_artifact(path, exp, {"model_name": model_name})
    fn, _ = pexp.load_artifact(path)
    x = rng.randint(0, 255, shape).astype(np.uint8)
    got = np.asarray(fn(x))
    assert got.shape == (shape[0], 13)
    live = pexp.build_predict_fn(model, v, pol, None, None, model_name)
    np.testing.assert_allclose(got, np.asarray(live(x)),
                               rtol=1e-4, atol=1e-4)
