"""Serve CLI: classify clips / evaluate a CSV from a trained checkpoint."""

import glob
import os
import json

import numpy as np
import pytest

from picklebot_tpu import serve
from picklebot_tpu.train.loop import train
from tests.test_train_loop import _smoke_config


@pytest.mark.slow
def test_serve_from_orbax_checkpoint(tmp_path, monkeypatch, capsys, rng):
    cv2 = pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)
    # train one epoch on synthetic data to get a checkpoint
    cfg = _smoke_config(tmp_path, max_iters=1)
    train(cfg, max_steps=1)
    ckpt = glob.glob(str(tmp_path / "ckpt" / "*_finished" / "step_*"))[0]

    cfg_path = tmp_path / "cfg.json"
    cfg_json = {
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 2, "effective_batch_size": 2,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": str(tmp_path), "data_backend": "synthetic",
        "synthetic_len": 4, "synthetic_shape": [8, 32, 32],
        "t_bucket": 8, "max_frames": 8,
    }
    cfg_path.write_text(json.dumps(cfg_json))

    # CSV-evaluation mode over the synthetic dataset
    rc = serve.main([str(cfg_path), "--checkpoint", ckpt, "--csv", "x",
                     "--limit", "4", "--batch", "2"])
    assert rc == 0
    out_lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()
                 if l.startswith("{")]
    assert "accuracy" in out_lines[-1]
    preds = [l for l in out_lines if "pred" in l]
    assert len(preds) == 4
    assert all(0 <= p["pred"] < 13 for p in preds)
    assert all(0 < p["confidence"] <= 1 for p in preds)

    # clip mode with a real mp4
    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (32, 32))
    for _ in range(6):
        w.write(rng.randint(0, 255, (32, 32, 3)).astype(np.uint8))
    w.release()
    rc = serve.main([str(cfg_path), "--checkpoint", ckpt, str(vid)])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["clip"] == str(vid) and "label" in line


@pytest.mark.slow
def test_serve_streaming_model(tmp_path, monkeypatch, capsys):
    """MoViNetA2Stream serves through the whole-clip causal path."""
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu.models.movinet import MoViNetA2Stream
    from picklebot_tpu.train import checkpoint as ckpt

    model = MoViNetA2Stream(num_classes=13)
    v = model.init(0)
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                                {"params": v["params"],
                                 "model_state": v["state"]})

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model_name": "MoViNetA2Stream", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 2, "effective_batch_size": 2,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic",
        "synthetic_len": 2, "synthetic_shape": [4, 32, 32],
        "t_bucket": 4, "max_frames": 4}))
    rc = serve.main([str(cfg), "--checkpoint", path, "--csv", "x",
                     "--limit", "2", "--batch", "2"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len([l for l in lines if "pred" in l]) == 2


@pytest.mark.slow
@pytest.mark.parametrize("model_name,size", [("MobileNetSmall2D", 224),
                                             ("MoViNetA2Stream", 32)])
def test_serve_stream_mode(tmp_path, monkeypatch, capsys, rng, model_name,
                           size):
    """--stream consumes an mp4 in chunks with carried state and emits one
    prediction line per chunk; the final line matches the whole-clip
    prediction (both paths are causal — tests/test_stream_2d.py,
    test_streaming.py prove logit equality; this covers the CLI wiring).
    The 2D models keep the reference's fixed 7x7 AvgPool (mobilenet.py:
    301,435) so they need real 224^2 frames; MoViNet pools globally."""
    cv2 = pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.utils.config import Config

    cfg_json = {
        "model_name": model_name, "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic",
        "synthetic_len": 2, "synthetic_shape": [6, size, size],
        "t_bucket": 6, "max_frames": 6}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_json))
    model = initialize_model(Config(model_name=model_name, num_classes=13))
    v = model.init(0)
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                                {"params": v["params"],
                                 "model_state": v["state"]})

    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (size, size))
    for _ in range(6):
        w.write(rng.randint(0, 255, (size, size, 3)).astype(np.uint8))
    w.release()

    rc = serve.main([str(cfg_path), "--checkpoint", path, "--stream",
                     "--chunk", "2", str(vid)])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert [l["frame"] for l in lines] == [2, 4, 6]
    assert all(0 <= l["pred"] < 13 and 0 < l["confidence"] <= 1
               for l in lines)

    # whole-clip prediction agrees with the last streamed line
    rc = serve.main([str(cfg_path), "--checkpoint", path, str(vid)])
    assert rc == 0
    full = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    assert full["pred"] == lines[-1]["pred"]


def test_serve_stream_rejects_nonstream_model(tmp_path, capsys):
    cfg_path, path = _small3d_cfg_and_ckpt(tmp_path)
    rc = serve.main([str(cfg_path), "--checkpoint", path, "--stream",
                     "x.mp4"])
    assert rc == 1


def _small3d_cfg_and_ckpt(tmp_path):
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic"}))
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.utils.config import Config
    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v = model.init(0)
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                                {"params": v["params"],
                                 "model_state": v["state"]})
    return cfg_path, path


def test_serve_stream_rejects_server_flags(tmp_path, capsys):
    """--stream is a CLI-only mode (per-clip carried state): combining it
    with --http/--csv/--data-parallel errors instead of silently ignoring
    the other mode (previously `--stream --http` never started a server)."""
    cfg_path, path = _small3d_cfg_and_ckpt(tmp_path)
    rc = serve.main([str(cfg_path), "--checkpoint", path, "--stream",
                     "--http", "0", "x.mp4"])
    assert rc == 1
    assert "--stream does not support --http" in capsys.readouterr().err


def test_serve_ema_rejects_pth(tmp_path):
    """--ema with a .pth checkpoint must error: a .pth holds one weight
    set, so serving it under --ema would silently hand back raw weights."""
    cfg_path, _ = _small3d_cfg_and_ckpt(tmp_path)
    with pytest.raises(SystemExit, match="EMA"):
        serve.main([str(cfg_path), "--checkpoint", "donor.pth", "--ema",
                    "x.mp4"])


def test_export_ema_rejects_pth(tmp_path):
    """Same guard on the export surface (it would bake raw weights)."""
    from picklebot_tpu import export as pexp
    cfg_path, _ = _small3d_cfg_and_ckpt(tmp_path)
    with pytest.raises(SystemExit, match="EMA"):
        pexp.main([str(cfg_path), "--checkpoint", "donor.pth", "--ema",
                   "--out", str(tmp_path / "m.pbz"), "--frames", "4",
                   "--size", "32"])


@pytest.mark.slow
def test_serve_stream_ragged_tail(tmp_path, monkeypatch, capsys, rng):
    """A clip whose length is not a multiple of --chunk: the tail runs
    frame-by-frame through ONE extra compiled shape (not one per tail
    length) and its prediction equals the whole-clip pass (causal)."""
    cv2 = pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.utils.config import Config

    size = 32
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_name": "MoViNetA2Stream", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 1, "effective_batch_size": 1,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic",
        "synthetic_len": 2, "synthetic_shape": [6, size, size],
        "t_bucket": 6, "max_frames": 6}))
    model = initialize_model(Config(model_name="MoViNetA2Stream",
                                    num_classes=13))
    v = model.init(0)
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                                {"params": v["params"],
                                 "model_state": v["state"]})
    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (size, size))
    for _ in range(6):
        w.write(rng.randint(0, 255, (size, size, 3)).astype(np.uint8))
    w.release()

    rc = serve.main([str(cfg_path), "--checkpoint", path, "--stream",
                     "--chunk", "4", str(vid)])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert [l["frame"] for l in lines] == [4, 6]  # main chunk + 2-frame tail

    rc = serve.main([str(cfg_path), "--checkpoint", path, str(vid)])
    assert rc == 0
    full = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    assert full["pred"] == lines[-1]["pred"]


@pytest.mark.slow
def test_serve_http_exported(tmp_path, monkeypatch, rng):
    """--http endpoint over an AOT artifact: GET / returns the metadata,
    POST /predict classifies an uploaded mp4, bad uploads get a 400."""
    cv2 = pytest.importorskip("cv2")
    import http.client
    import threading
    import time

    from picklebot_tpu import export as pexp
    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.utils.config import Config

    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v = model.init(0)
    exp = pexp.export_predictor(model, v, DtypePolicy.f32(), frames=6,
                                size=48, model_name="MobileNetSmall3D",
                                platforms=("cpu",))
    art = tmp_path / "m.pbz"
    pexp.save_artifact(art, exp, {"model_name": "MobileNetSmall3D",
                                  "num_classes": 13, "criterion": "CE",
                                  "frames": 6, "size": 48})

    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (48, 48))
    for _ in range(6):
        w.write(rng.randint(0, 255, (48, 48, 3)).astype(np.uint8))
    w.release()

    created = {}
    orig = serve.make_http_server

    def capture(port, classify, info, **kw):
        created["srv"] = orig(port, classify, info, **kw)
        return created["srv"]

    monkeypatch.setattr(serve, "make_http_server", capture)
    th = threading.Thread(
        target=serve.main,
        args=(["--exported", str(art), "--http", "0"],), daemon=True)
    th.start()
    for _ in range(500):
        if "srv" in created:
            break
        time.sleep(0.02)
    port = created["srv"].server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/")
        info = json.loads(conn.getresponse().read())
        assert info["num_classes"] == 13 and info["mode"] == "exported"

        conn.request("POST", "/predict", body=vid.read_bytes())
        resp = conn.getresponse()
        assert resp.status == 200
        rec = json.loads(resp.read())
        assert 0 <= rec["pred"] < 13 and 0 < rec["confidence"] <= 1

        conn.request("POST", "/predict", body=b"not a video")
        resp = conn.getresponse()
        assert resp.status == 400
        assert "error" in json.loads(resp.read())

        conn.request("POST", "/elsewhere", body=b"")
        assert conn.getresponse().status == 404

        # liveness probe: 200 + request/error counters (2 POSTs above,
        # one of them the bad-video 400)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["requests"] == 2 and health["errors"] == 1, health
    finally:
        created["srv"].shutdown()
    th.join(timeout=30)
    assert not th.is_alive()


@pytest.mark.slow
def test_serve_data_parallel_matches_single(tmp_path, monkeypatch, capsys):
    """--data-parallel 8 shards each serving batch over the CPU mesh and
    returns the same predictions as plain serving (incl. the ragged last
    batch, which pads to the mesh size and trims)."""
    monkeypatch.chdir(tmp_path)
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.utils.config import Config

    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v = model.init(0)
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                                {"params": v["params"],
                                 "model_state": v["state"]})
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 2, "effective_batch_size": 2,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic",
        "synthetic_len": 6, "synthetic_shape": [4, 32, 32],
        "t_bucket": 4, "max_frames": 4}))

    def run(extra):
        rc = serve.main([str(cfg), "--checkpoint", path, "--csv", "x",
                         "--limit", "6", "--batch", "6"] + extra)
        assert rc == 0
        return [json.loads(l) for l in
                capsys.readouterr().out.splitlines()
                if l.startswith("{") and "pred" in l]

    plain = run([])
    sharded = run(["--data-parallel", "8"])   # 6 clips pad to 8, trim
    assert len(plain) == len(sharded) == 6
    assert [p["pred"] for p in plain] == [s["pred"] for s in sharded]


def test_request_batcher_coalesces_and_pads():
    """Concurrent submits within the window coalesce into ONE predictor
    call; the batch dim buckets to powers of two."""
    import threading

    calls = []

    def predict_clips(clips):
        calls.append(len(clips))
        return [{"pred": int(c[0]), "label": "x", "confidence": 1.0}
                for c in clips]

    b = serve.RequestBatcher(predict_clips, max_batch=8, window_ms=200.0)
    results = [None] * 5
    def worker(i):
        results[i] = b.submit(np.array([i]))
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert [r["pred"] for r in results] == [0, 1, 2, 3, 4]
    # all five landed in one call (or two if the scheduler split them) —
    # never five separate predictor dispatches
    assert len(calls) <= 2 and sum(calls) == 5

    assert serve.pad_batch_pow2(1, 8) == 1
    assert serve.pad_batch_pow2(3, 8) == 4
    assert serve.pad_batch_pow2(5, 8) == 8
    assert serve.pad_batch_pow2(8, 8) == 8


def test_request_batcher_propagates_errors():
    def predict_clips(clips):
        raise RuntimeError("boom")

    b = serve.RequestBatcher(predict_clips, max_batch=4, window_ms=1.0)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit(np.zeros(1))
    # the worker thread survives a failed batch
    def ok_after(clips):
        return [{"pred": 0}]
    b2 = serve.RequestBatcher(ok_after, max_batch=4, window_ms=1.0)
    assert b2.submit(np.zeros(1)) == {"pred": 0}


@pytest.mark.slow
def test_serve_http_concurrent_batched(tmp_path, monkeypatch, rng):
    """8 concurrent POSTs against --http coalesce through the batcher and
    every client gets its own correct prediction."""
    cv2 = pytest.importorskip("cv2")
    import http.client
    import threading
    import time

    from picklebot_tpu import export as pexp
    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.utils.config import Config

    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v = model.init(0)
    exp = pexp.export_predictor(model, v, DtypePolicy.f32(), frames=4,
                                size=48, model_name="MobileNetSmall3D",
                                platforms=("cpu",))
    art = tmp_path / "m.pbz"
    pexp.save_artifact(art, exp, {"model_name": "MobileNetSmall3D",
                                  "num_classes": 13, "criterion": "CE",
                                  "frames": 4, "size": 48, "batch": -1})

    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (48, 48))
    for _ in range(4):
        w.write(rng.randint(0, 255, (48, 48, 3)).astype(np.uint8))
    w.release()
    body = vid.read_bytes()

    created = {}
    orig = serve.make_http_server

    def capture(port, classify, info, **kw):
        created["srv"] = orig(port, classify, info, **kw)
        return created["srv"]

    monkeypatch.setattr(serve, "make_http_server", capture)
    th = threading.Thread(
        target=serve.main,
        args=(["--exported", str(art), "--http", "0",
               "--batch", "8", "--batch-window", "300"],), daemon=True)
    th.start()
    for _ in range(500):
        if "srv" in created:
            break
        time.sleep(0.02)
    port = created["srv"].server_address[1]
    recs = [None] * 8

    def post(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body=body)
        resp = conn.getresponse()
        recs[i] = (resp.status, json.loads(resp.read()))

    try:
        ts = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(r is not None and r[0] == 200 for r in recs), recs
        preds = {r[1]["pred"] for r in recs}
        assert len(preds) == 1          # same clip -> same prediction
        assert all(0 < r[1]["confidence"] <= 1 for r in recs)
    finally:
        created["srv"].shutdown()
    th.join(timeout=30)


def test_request_batcher_keys_separate_batches():
    """Entries with different keys never share a predictor call — mixed
    resolutions / T buckets must not co-batch (stacking would corrupt,
    shared T padding would change predictions)."""
    import threading

    calls = []

    def predict_clips(clips):
        shapes = {c.shape for c in clips}
        assert len(shapes) == 1, shapes   # a mixed batch is the bug
        calls.append(len(clips))
        return [{"pred": int(c.shape[0])} for c in clips]

    b = serve.RequestBatcher(predict_clips, max_batch=8, window_ms=150.0)
    results = {}

    def worker(i, t):
        results[i] = b.submit(np.zeros((t, 4)), key=(t, 4))

    ts = [threading.Thread(target=worker, args=(i, 8 if i % 2 else 16))
          for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert all(results[i]["pred"] == (8 if i % 2 else 16)
               for i in range(6))
    assert len(calls) >= 2 and sum(calls) == 6


@pytest.mark.slow
def test_serve_http_checkpoint_mixed_lengths(tmp_path, monkeypatch, rng):
    """Checkpoint-mode --http: concurrent clips of different lengths get
    keyed into separate T-bucket batches and each returns its own
    deterministic prediction (equal to serving it alone)."""
    cv2 = pytest.importorskip("cv2")
    import http.client
    import threading
    import time

    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.utils.config import Config

    model = initialize_model(Config(model_name="MobileNetSmall3D",
                                    num_classes=13))
    v = model.init(0)
    ck = ckpt.save_checkpoint(str(tmp_path / "ck"), 0,
                              {"params": v["params"],
                               "model_state": v["state"]})
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_name": "MobileNetSmall3D", "num_classes": 13,
        "criterion": "CE", "use_autocast": False,
        "batch_size": 4, "effective_batch_size": 4,
        "train_annotations_file": "", "val_annotations_file": "",
        "video_paths": "", "data_backend": "synthetic",
        "t_bucket": 4, "max_frames": 16}))

    def write_vid(name, frames):
        vid = tmp_path / name
        w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                            (32, 32))
        r = np.random.RandomState(0)   # same content, different length
        for _ in range(frames):
            w.write(r.randint(0, 255, (32, 32, 3)).astype(np.uint8))
        w.release()
        return vid.read_bytes()

    short, long_ = write_vid("s.mp4", 4), write_vid("l.mp4", 12)

    created = {}
    orig = serve.make_http_server

    def capture(port, classify, info, **kw):
        created["srv"] = orig(port, classify, info, **kw)
        return created["srv"]

    monkeypatch.setattr(serve, "make_http_server", capture)
    th = threading.Thread(
        target=serve.main,
        args=([str(cfg_path), "--checkpoint", ck, "--http", "0",
               "--batch", "4", "--batch-window", "300"],), daemon=True)
    th.start()
    for _ in range(500):
        if "srv" in created:
            break
        time.sleep(0.02)
    port = created["srv"].server_address[1]

    def post(body):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body=body)
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())

    try:
        # alone first: the deterministic per-length references
        ref_short, ref_long = post(short)[1], post(long_)[1]

        results = {}

        def worker(name, body):
            results[name] = post(body)

        ts = [threading.Thread(target=worker, args=(n, b))
              for n, b in (("s1", short), ("l1", long_),
                           ("s2", short), ("l2", long_))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(r[0] == 200 for r in results.values()), results
        # same clip co-batched with a longer one must predict identically
        # to serving it alone (T-bucket keying)
        assert results["s1"][1] == results["s2"][1] == ref_short
        assert results["l1"][1] == results["l2"][1] == ref_long
    finally:
        created["srv"].shutdown()
    th.join(timeout=30)


def _run_server(classify, info=None, **kw):
    """Start a make_http_server on an ephemeral port; returns (srv, port)."""
    import threading
    srv = serve.make_http_server(0, classify, info or {"mode": "test"}, **kw)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def _post(port, body, path="/predict", headers=None, timeout=30):
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=body, headers=headers or {})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _health(port):
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/healthz")
    return json.loads(conn.getresponse().read())


def test_http_rejects_oversize_body():
    """Bodies over the cap get 413 BEFORE the server reads them; the
    error counter still moves."""
    calls = []
    srv, port = _run_server(lambda p: calls.append(p) or {"pred": 0},
                            max_body=1000)
    try:
        status, obj = _post(port, b"x" * 5000)
        assert status == 413 and "cap" in obj["error"]
        assert calls == []                     # classify never ran
        status, obj = _post(port, b"x" * 100)  # under the cap -> classified
        assert status == 200
        h = _health(port)
        assert h["requests"] == 2 and h["errors"] == 1
    finally:
        srv.shutdown()


def test_http_missing_length_and_empty_body():
    srv, port = _run_server(lambda p: {"pred": 0})
    try:
        # chunked upload (no Content-Length) -> 411
        import http.client
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"0\r\n\r\n")
        resp = conn.getresponse()
        assert resp.status == 411
        json.loads(resp.read())
        # explicit empty body -> 400
        status, obj = _post(port, b"")
        assert status == 400 and "empty" in obj["error"]
        h = _health(port)
        assert h["requests"] == 2 and h["errors"] == 2
    finally:
        srv.shutdown()


def test_http_malformed_content_length():
    """'Content-Length: abc' gets a 400 JSON error, not an uncaught
    ValueError (BaseHTTPRequestHandler only catches socket timeouts, so
    an unhandled exception would drop the connection with no response);
    the error counter still moves."""
    import http.client
    calls = []
    srv, port = _run_server(lambda p: calls.append(p) or {"pred": 0})
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        obj = json.loads(resp.read())
        assert "Content-Length" in obj["error"]
        assert calls == []
        h = _health(port)
        assert h["requests"] == 1 and h["errors"] == 1
    finally:
        srv.shutdown()


def test_http_client_disconnect_counts_once():
    """A client that hangs up before reading the response must not
    double-count the request or mark a successful classification as an
    error (/healthz is load-balancer truth)."""
    import socket
    import time

    srv, port = _run_server(lambda p: {"pred": 0})
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        body = b"x" * 64
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Length: %d\r\n\r\n" % len(body) + body)
        s.close()                    # vanish before reading the response
        deadline = time.time() + 10
        while time.time() < deadline:
            h = _health(port)
            if h["requests"]:
                break
            time.sleep(0.05)
        time.sleep(0.2)              # let any (wrong) second count land
        h = _health(port)
        assert h["requests"] == 1 and h["errors"] == 0
    finally:
        srv.shutdown()


def test_http_request_timeout_504():
    """A classify stalled past the request timeout (a crafted file that
    hangs the decoder / a dead tunnel) returns 504 instead of hanging the
    client; later requests still work."""
    import time

    def classify(path):
        if os.path.getsize(path) > 10:
            time.sleep(3.0)       # the stalled decode
        return {"pred": 1}

    srv, port = _run_server(classify, request_timeout=0.3)
    try:
        status, obj = _post(port, b"x" * 100)
        assert status == 504 and "0.3" in obj["error"]
        status, obj = _post(port, b"ok")
        assert status == 200 and obj == {"pred": 1}
        h = _health(port)
        assert h["requests"] == 2 and h["errors"] == 1
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_http_truncated_video_is_400(tmp_path, rng):
    """A real mp4 cut mid-file (the classic interrupted upload: mp4v puts
    the moov index at the end) decodes to nothing -> 400, not 500."""
    cv2 = pytest.importorskip("cv2")
    from picklebot_tpu.data.dataset import decode_opencv

    vid = tmp_path / "c.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (32, 32))
    for _ in range(6):
        w.write(rng.randint(0, 255, (32, 32, 3)).astype(np.uint8))
    w.release()
    body = vid.read_bytes()[: len(vid.read_bytes()) // 2]

    def classify(path):
        decode_opencv(path)       # the serve paths' first step
        return {"pred": 0}

    srv, port = _run_server(classify)
    try:
        status, obj = _post(port, body)
        assert status == 400 and "error" in obj
        h = _health(port)
        assert h["requests"] == 1 and h["errors"] == 1
    finally:
        srv.shutdown()
