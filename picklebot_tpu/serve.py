"""Inference CLI: call balls and strikes on clips from a checkpoint.

The serving counterpart of the reference's HuggingFace demo space
(reference README.md links): load a config + checkpoint, decode clips,
batch them through the jitted predictor, print per-clip predictions.

Usage:
  python -m picklebot_tpu.serve <config.json> --checkpoint ck_dir_or.pth \
      clip1.mp4 clip2.mp4 ...
  python -m picklebot_tpu.serve <config.json> --checkpoint ck --csv ann.csv \
      [--limit N]   # evaluate accuracy over an annotation CSV
  python -m picklebot_tpu.serve <config.json> --checkpoint ck --stream \
      [--chunk 1] clip.mp4   # online frame-by-frame prediction stream
  python -m picklebot_tpu.serve --exported model.pbz clip1.mp4 ...
      # serve from an AOT StableHLO artifact (picklebot_tpu/export.py):
      # weights baked in, no config/checkpoint/model-zoo at load time
  python -m picklebot_tpu.serve <config.json> --checkpoint ck --http 8000
  python -m picklebot_tpu.serve --exported model.pbz --http 8000
      # HTTP endpoint (the network-facing counterpart of the reference's
      # HF demo space): POST /predict, body = video file -> JSON.
      # Concurrent requests coalesce into one predictor call per
      # --batch-window ms (TPU throughput wants wide batches; the batch
      # dim buckets to powers of two so XLA compiles O(log) shapes)
  python -m picklebot_tpu.serve <config.json> --checkpoint ck \
      --data-parallel 8 --csv val.csv   # batch sharded over 8 chips (ICI)

`--stream` serves the online models (MoViNetA2Stream via stream buffers,
MobileNet{Large,Small}2D via carried LSTM state): the clip is consumed in
`--chunk`-frame pieces with O(1) carried state, emitting one JSON
prediction line per chunk — the serving shape of a live camera feed. The
reference has no online path (its 2D models loop frames but always
consume whole clips, mobilenet.py:355-366). Chunked streaming equals the
full causal pass exactly (tests/test_streaming.py, test_stream_2d.py);
measured latency: 1.0-3.0 ms/frame on v5e (docs/BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import sys

# 13-class zone task: 0 = ball zones... the 2-class task is ball/strike
BALL_STRIKE = {0: "ball", 1: "strike"}

STREAM_MODELS = ("MoViNetA2Stream", "MobileNetLarge2D", "MobileNetSmall2D")


def decode_logits(logits, criterion, num_classes):
    """f32 logits (B, C) -> per-clip {pred, label, confidence} dicts."""
    import numpy as np

    if criterion == "BCE":
        # single-logit head: sigmoid threshold (argmax over one logit
        # would always predict 0)
        prob1 = 1.0 / (1.0 + np.exp(-logits[:, 0]))
        preds = (prob1 >= 0.5).astype(np.int64)
        confs = np.where(preds == 1, prob1, 1.0 - prob1)
    else:
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        preds = logits.argmax(-1)
        confs = probs[np.arange(len(preds)), preds]
    out = []
    for pr, cf in zip(preds, confs):
        label = (BALL_STRIKE.get(int(pr), f"zone_{int(pr)}")
                 if num_classes <= 2 else f"zone_{int(pr)}")
        out.append({"pred": int(pr), "label": label,
                    "confidence": round(float(cf), 4)})
    return out


class RequestBatcher:
    """Cross-request dynamic batching for HTTP serving.

    Concurrent POST /predict bodies are decoded in their handler threads
    and enqueued; one worker thread drains the queue into a single batch —
    waiting up to ``window_ms`` after the first clip arrives, or until
    ``max_batch`` clips are pending — and runs the jitted predictor ONCE.
    TPU serving wants wide batches (bs=16 inference is ~5x sixteen bs=1
    calls, docs/BENCH.md); per-request dispatch would leave the MXU idle.
    The batch dim pads to the next power of two (zeros, trimmed after) so
    XLA compiles at most log2(max_batch)+1 batch shapes per clip shape.

    Only requests with the same ``key`` share a batch (the checkpoint
    path keys on (T-bucket, H, W)): co-batching different resolutions
    would corrupt the stacked tensor, and sharing a T bucket with a
    longer clip would change a clip's padding — and therefore its
    unmasked temporal pooling — making predictions depend on concurrent
    traffic. Mismatched-key requests simply wait for the next batch.
    """

    def __init__(self, predict_batch, max_batch=8, window_ms=10.0):
        import threading
        self._predict_batch = predict_batch   # list[clip] -> list[dict]
        self.max_batch = max(1, max_batch)
        self.window_s = window_ms / 1e3
        self._pending = []                    # [(key, clip, ev, slot)]
        self._cv = threading.Condition()
        self._threading = threading
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def submit(self, clip, key=None):
        """Block until the clip's prediction dict is ready."""
        ev = self._threading.Event()
        slot = {}
        with self._cv:
            self._pending.append((key, clip, ev, slot))
            self._cv.notify()
        ev.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _take_matching(self, key, limit):
        """(cv held) pop up to ``limit`` pending entries with this key."""
        taken, rest = [], []
        for e in self._pending:
            if e[0] == key and len(taken) < limit:
                taken.append(e)
            else:
                rest.append(e)
        self._pending = rest
        return taken

    def _loop(self):
        import time
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
                first = self._pending.pop(0)
            key = first[0]
            entries = [first]
            deadline = time.monotonic() + self.window_s
            while len(entries) < self.max_batch:
                with self._cv:
                    entries += self._take_matching(
                        key, self.max_batch - len(entries))
                    if len(entries) >= self.max_batch:
                        break
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
            try:
                results = self._predict_batch([e[1] for e in entries])
                for (_, clip, ev, slot), rec in zip(entries, results):
                    slot["result"] = rec
                    ev.set()
            except Exception as e:  # noqa: BLE001 — deliver to every waiter
                for _, clip, ev, slot in entries:
                    slot["error"] = e
                    ev.set()


def pad_batch_pow2(n, max_batch):
    """Batch-dim bucket: next power of two >= n, capped at max_batch."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max(max_batch, n))


def pad_batch_to(feats, target):
    """Zero-pad the leading (batch) dim to ``target``; returns (padded,
    original_b) so callers can trim predictions back."""
    import numpy as np
    b = feats.shape[0]
    if target > b:
        feats = np.concatenate(
            [feats, np.zeros((target - b,) + feats.shape[1:], feats.dtype)])
    return feats, b


def make_http_server(port, classify_path, info, max_body=256 << 20,
                     request_timeout=120.0):
    """HTTP serving endpoint (the network-facing counterpart of the
    reference's HuggingFace demo space): POST /predict with a video file
    as the request body -> JSON prediction; GET / -> model/server info;
    GET /healthz -> load-balancer liveness probe (200 + request/error
    counters once the predictor is up).

    Hostile-input posture (what a public demo endpoint meets on day one):
      * bodies over ``max_body`` bytes -> 413, rejected BEFORE reading
        (the Content-Length header is checked first; chunked/missing
        length -> 411);
      * corrupt / truncated / non-video bodies -> 400 with the decode
        error (never a 500);
      * decode+predict bounded by ``request_timeout`` seconds -> 504 (a
        crafted file that stalls the decoder, or a dead accelerator
        tunnel, must not hang the connection forever; the worker thread
        is left to finish and its slot is not reused);
      * a 60 s socket timeout caps slowloris bodies;
      * every outcome counts in /healthz's request/error counters.
    Returns the ThreadingHTTPServer (caller runs serve_forever)."""
    import concurrent.futures
    import http.server
    import os
    import tempfile
    import threading

    stats = {"requests": 0, "errors": 0}
    stats_lock = threading.Lock()
    # unbounded workers: one per in-flight request, like the handler
    # threads themselves; a timed-out classify keeps its worker until the
    # underlying decode returns (threads can't be killed), which is the
    # honest cost of bounding the CLIENT's wait
    pool = concurrent.futures.ThreadPoolExecutor()

    def count(error=False):
        with stats_lock:
            stats["requests"] += 1
            if error:
                stats["errors"] += 1

    class Handler(http.server.BaseHTTPRequestHandler):
        timeout = 60.0  # socket timeout: slowloris bodies die here

        def log_message(self, *a):  # quiet: predictions go to the client
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _safe_send(self, code, obj):
            # The outcome was already counted; a client that hung up
            # before reading the response must not crash the handler or
            # count the same request twice.
            try:
                self._send(code, obj)
            except OSError:
                self.close_connection = True

        def do_GET(self):
            if self.path == "/healthz":
                with stats_lock:
                    return self._safe_send(200, {"status": "ok", **stats})
            self._safe_send(200, info)

        def do_POST(self):
            if self.path != "/predict":
                return self._safe_send(404, {"error": "POST /predict"})
            length = self.headers.get("Content-Length")
            if length is None:
                count(error=True)
                return self._safe_send(
                    411, {"error": "Content-Length required"})
            try:
                n = int(length)
            except ValueError:
                count(error=True)
                self.close_connection = True
                return self._safe_send(
                    400, {"error": f"malformed Content-Length: {length!r}"})
            if n > max_body:
                # refuse BEFORE reading: close the connection so the
                # client can't stream the oversize body anyway
                count(error=True)
                self.close_connection = True
                return self._safe_send(
                    413, {"error": f"body {n} bytes exceeds "
                                   f"the {max_body}-byte cap"})
            if n <= 0:
                count(error=True)
                return self._safe_send(400, {"error": "empty body"})
            try:
                data = self.rfile.read(n)
            except OSError:  # slowloris socket timeout / client vanished
                count(error=True)
                self.close_connection = True
                return
            fd, path = tempfile.mkstemp(suffix=".mp4")
            try:
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(data)
                except OSError as e:  # disk full: a server-side fault
                    count(error=True)
                    return self._safe_send(
                        503, {"error": f"spool write failed: {e}"})
                fut = pool.submit(classify_path, path)
                try:
                    result = fut.result(timeout=request_timeout)
                except concurrent.futures.TimeoutError:
                    count(error=True)
                    return self._safe_send(
                        504, {"error": f"request exceeded "
                                       f"{request_timeout:g}s"})
                except Exception as e:  # noqa: BLE001 — to the client
                    count(error=True)
                    return self._safe_send(
                        400, {"error": f"{type(e).__name__}: {e}"})
                count()
                self._safe_send(200, result)
            finally:
                os.unlink(path)

    return http.server.ThreadingHTTPServer(("", port), Handler)


def _serve_stream(args, config, model, variables, policy, mean, std):
    """Online mode: consume each clip in --chunk-frame pieces with carried
    state (stream buffers / LSTM (h, c)), one JSON prediction per chunk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from picklebot_tpu.data.dataset import decode_opencv
    from picklebot_tpu.train.step import preprocess

    if config.model_name not in STREAM_MODELS:
        print(f"--stream needs one of {STREAM_MODELS} "
              f"(got {config.model_name})", file=sys.stderr)
        return 1
    if not args.clips:
        print("no clips given", file=sys.stderr)
        return 1
    is_movinet = config.model_name == "MoViNetA2Stream"
    input_size = config.input_size

    @jax.jit
    def stream_step(variables, feats, carry):
        x = preprocess(feats, policy.compute_dtype, mean, std,
                       input_size=input_size)
        (logits, carry), _ = model.apply(variables, x, carry, train=False,
                                         policy=policy)
        return logits, carry

    for clip_path in args.clips:
        # (T, H, W, 3) uint8 at native resolution/frame rate; the in-graph
        # resize (config.input_size) runs inside stream_step
        frames = decode_opencv(clip_path, config.sample_fps)
        t_total, h, w = frames.shape[:3]
        if input_size:
            h = w = input_size
        if is_movinet:
            carry = model.init_stream(1, h, w, dtype=policy.compute_dtype)
        else:
            # cast the zero LSTM state to the compute dtype so the carry
            # is jit-shape-stable from the first chunk (zeros are exact
            # in either dtype)
            h0, c0 = model.init_stream(1)
            carry = (jnp.asarray(h0, policy.compute_dtype),
                     jnp.asarray(c0, policy.compute_dtype))
        tail = t_total % args.chunk
        for start in range(0, t_total - tail, args.chunk):
            chunk = frames[start:start + args.chunk]
            logits, carry = stream_step(variables, chunk[None], carry)
            rec = decode_logits(np.asarray(logits, np.float32),
                                config.criterion, config.num_classes)[0]
            print(json.dumps({"clip": clip_path,
                              "frame": start + len(chunk), **rec}))
        if tail:
            # ragged final chunk: a (tail,)-shaped input would compile a
            # NEW program per distinct tail length (minutes each on the
            # tunneled TPU) — run it frame-by-frame through one 1-frame
            # program instead; both models are causal so the logits are
            # identical (chunked == full, tests/test_streaming.py)
            for i in range(t_total - tail, t_total):
                logits, carry = stream_step(variables, frames[i:i + 1][None],
                                            carry)
            rec = decode_logits(np.asarray(logits, np.float32),
                                config.criterion, config.num_classes)[0]
            print(json.dumps({"clip": clip_path, "frame": t_total, **rec}))
    return 0


def _serve_exported(args):
    """Serve from an AOT artifact (picklebot_tpu/export.py): StableHLO with
    baked weights — no config, no checkpoint, no model zoo at load time."""
    import numpy as np

    # fail fast when the TPU tunnel is dead (jax.devices() hangs forever
    # there; utils/devices.py) — same boot guard as checkpoint serving
    from picklebot_tpu.utils.devices import require_devices
    require_devices()

    from picklebot_tpu.data.dataset import decode_opencv
    from picklebot_tpu.export import load_artifact

    predict, meta = load_artifact(args.exported)
    if meta.get("model_name") == "MobileViTV2":
        # image classifier: the artifact consumes (B, H, W, 3) frames, not
        # clips — serve's mp4 contract doesn't apply (load_artifact() gives
        # the callable directly for image pipelines)
        print("--exported serving is clip-based; MobileViTV2 artifacts "
              "take single images (use picklebot_tpu.export.load_artifact)",
              file=sys.stderr)
        return 1
    frames, size = meta["frames"], meta["size"]
    num_classes, criterion = meta["num_classes"], meta["criterion"]
    sample_fps = float(meta.get("sample_fps", 0.0) or 0.0)

    def prep(clip):
        """(T, H, W, 3) uint8 -> (frames, size, size, 3): pad/trim T,
        resize mismatched spatial dims HOST-side (the artifact's shapes
        are compiled in, so the in-graph config.input_size resize can't
        apply — cv2 here, INTER_AREA on downscale to match the antialiased
        ops/resize.py semantics)."""
        if clip.shape[1] != size or clip.shape[2] != size:
            import cv2
            interp = (cv2.INTER_AREA if clip.shape[1] > size
                      else cv2.INTER_LINEAR)
            clip = np.stack([cv2.resize(f, (size, size),
                                        interpolation=interp)
                             for f in clip])
        clip = clip[:frames]
        if clip.shape[0] < frames:
            clip = np.concatenate(
                [clip, np.zeros((frames - clip.shape[0],) + clip.shape[1:],
                                np.uint8)])
        return clip

    pinned = meta.get("batch", -1)
    pinned = pinned if isinstance(pinned, int) and pinned > 0 else None

    if args.http is not None:
        def predict_clips(clips):
            feats = np.stack(clips)
            target = pinned or pad_batch_pow2(feats.shape[0], args.batch)
            if feats.shape[0] > target:
                raise ValueError(f"batch {feats.shape[0]} exceeds the "
                                 f"artifact's pinned batch {target}")
            feats, b = pad_batch_to(feats, target)
            logits = np.asarray(predict(feats), np.float32)[:b]
            return decode_logits(logits, criterion, num_classes)

        batcher = RequestBatcher(predict_clips,
                                 max_batch=pinned or args.batch,
                                 window_ms=args.batch_window)
        srv = make_http_server(args.http,
                               lambda path: batcher.submit(
                                   prep(decode_opencv(path, sample_fps))),
                               {"mode": "exported", **meta},
                               max_body=int(args.max_request_mb * 2**20),
                               request_timeout=args.request_timeout)
        print(json.dumps({"serving": f"http://0.0.0.0:"
                          f"{srv.server_address[1]}"}), flush=True)
        srv.serve_forever()
        return 0

    if not args.clips:
        print("no clips given", file=sys.stderr)
        return 1
    # a --batch N artifact is lowered at a FIXED batch: chunk to it and
    # pad short tails, or the jax.export call rejects the shape outright
    step_b = min(args.batch, pinned) if pinned else args.batch
    for start in range(0, len(args.clips), step_b):
        names = args.clips[start:start + step_b]
        feats = np.stack([prep(decode_opencv(c, sample_fps))
                          for c in names])
        if pinned:
            feats, b = pad_batch_to(feats, pinned)
        else:
            b = feats.shape[0]
        logits = np.asarray(predict(feats), np.float32)[:b]
        for name, rec in zip(names, decode_logits(logits, criterion,
                                                  num_classes)):
            print(json.dumps({"clip": name, **rec}))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description="Classify pitch clips")
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("clips", nargs="*")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax step dir or torch .pth")
    p.add_argument("--exported", default=None,
                   help="AOT artifact from python -m picklebot_tpu.export "
                        "(replaces config + --checkpoint)")
    p.add_argument("--csv", default=None,
                   help="annotation csv: evaluate accuracy instead")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--stream", action="store_true",
                   help="online mode: carried state, one prediction per "
                        "chunk (MoViNetA2Stream / MobileNet*2D)")
    p.add_argument("--chunk", type=int, default=1,
                   help="frames per streaming step (--stream)")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve over HTTP instead: POST /predict with a "
                        "video file body -> JSON prediction (0 = any port)")
    p.add_argument("--data-parallel", type=int, default=1, metavar="N",
                   help="shard each inference batch over N devices "
                        "(shard_map over the 'data' mesh axis)")
    p.add_argument("--batch-window", type=float, default=10.0, metavar="MS",
                   help="--http cross-request batching: wait up to MS ms "
                        "after the first request to coalesce up to --batch "
                        "clips into one predictor call (0 = no batching)")
    p.add_argument("--max-request-mb", type=float, default=256.0,
                   help="--http: reject POST bodies larger than this "
                        "(413; checked before reading)")
    p.add_argument("--request-timeout", type=float, default=600.0,
                   help="--http: bound decode+predict per request in "
                        "seconds (504 on expiry). Default covers the "
                        "first request per clip shape, which pays the "
                        "XLA compile (minutes on a fresh TPU process); "
                        "lower it once the server is warm")
    p.add_argument("--ema", action="store_true",
                   help="serve the EMA weights from an Orbax snapshot "
                        "trained with ema_decay > 0 (ema_params)")
    args = p.parse_args(argv)

    if args.exported is not None:
        # the artifact path serves whole fixed-shape clips only: CSV
        # evaluation, chunked streaming and mesh sharding all need the
        # live model/config — error instead of silently changing behavior
        unsupported = [f for f, on in (
            ("--csv", args.csv is not None),
            ("--stream", args.stream),
            ("--data-parallel", args.data_parallel > 1)) if on]
        if unsupported:
            print(f"--exported does not support {', '.join(unsupported)} "
                  f"(use <config> --checkpoint for those modes)",
                  file=sys.stderr)
            return 1
        # without a config the first positional is really a clip
        if args.config is not None:
            args.clips = [args.config] + args.clips
        return _serve_exported(args)
    if args.config is None or args.checkpoint is None:
        print("need <config> and --checkpoint (or --exported)",
              file=sys.stderr)
        return 1

    import jax
    import numpy as np

    # fail fast at boot when the TPU tunnel is dead (jax.devices() hangs
    # forever there; utils/devices.py) — a server must not freeze silently
    from picklebot_tpu.utils.devices import require_devices
    require_devices()

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.data.dataset import ClipDataset, decode_opencv, pad_collate
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.train.key_maps import key_map_for
    from picklebot_tpu.train.step import make_predict_fn
    from picklebot_tpu.utils.config import load_config

    config = load_config(args.config)
    # serving runs under plain jit (no mesh); TP/SP/PP/EP only change
    # execution layout, not weights, so serve the replicated equivalent
    from picklebot_tpu.utils.config import replicated_equivalent
    config = replicated_equivalent(config)
    model = initialize_model(config)
    variables = model.init(config.seed)
    if args.checkpoint.endswith(".pth"):
        if getattr(args, "ema", False):
            # .pth files hold one weight set — serving them under --ema
            # would silently hand back raw weights
            raise SystemExit(
                "--ema requires an Orbax snapshot (ema_params is part of "
                "the training state); a .pth file has no EMA stream")
        variables = ckpt.load_pth(args.checkpoint, variables,
                                  key_map=key_map_for(config.model_name))
    else:
        # restore the raw tree (no target: serving doesn't know the
        # optimizer that produced the snapshot) and take weights + BN state
        payload = ckpt.restore_checkpoint(args.checkpoint, None)
        params = payload["params"]
        if getattr(args, "ema", False):
            if payload.get("ema_params") is None:
                raise SystemExit(
                    "--ema: this snapshot has no ema_params (train with "
                    "config ema_decay > 0)")
            params = payload["ema_params"]
        variables = {"params": params,
                     "state": payload["model_state"]}

    variables = jax.device_put(variables)  # resident params, not per-call
    policy = DtypePolicy.bf16() if config.use_autocast else DtypePolicy.f32()
    mean = config.mean if config.apply_mean_std else None
    std = config.std if config.apply_mean_std else None
    # in-pipeline normalization of real-world inputs: clips decode at
    # native resolution/frame rate; config.input_size resizes them INSIDE
    # the jitted predictor (ops/resize.py), config.sample_fps strides the
    # decode — a 1080p 60fps phone video serves without offline prep
    input_size = config.input_size

    def decode(path):
        return decode_opencv(path, config.sample_fps)

    if args.stream:
        # mirror the --exported validation: streaming is a CLI-only mode
        # (per-clip carried state) — error instead of silently ignoring
        # the server/eval/sharding flags
        unsupported = [f for f, on in (
            ("--http", args.http is not None),
            ("--csv", args.csv is not None),
            ("--data-parallel", args.data_parallel > 1)) if on]
        if unsupported:
            print(f"--stream does not support {', '.join(unsupported)} "
                  f"(drop --stream for those modes)", file=sys.stderr)
            return 1
        return _serve_stream(args, config, model, variables, policy,
                             mean, std)

    if config.model_name == "MoViNetA2Stream":
        # streaming model: one chunk containing the whole clip == the full
        # causal pass; carry built per batch shape
        from picklebot_tpu.train.step import preprocess

        if args.data_parallel > 1:
            print("--data-parallel does not support MoViNetA2Stream "
                  "(stream-buffer carry)", file=sys.stderr)
            return 1

        @jax.jit
        def predict(variables, feats):
            x = preprocess(feats, policy.compute_dtype, mean, std,
                           input_size=input_size)
            carry = model.init_stream(x.shape[0], x.shape[2], x.shape[3],
                                      dtype=policy.compute_dtype)
            (logits, _), _ = model.apply(variables, x, carry, train=False,
                                         policy=policy)
            return logits
    elif args.data_parallel > 1:
        # multi-chip serving: batch sharded over the 'data' mesh axis; the
        # ragged last chunk pads to the mesh size and trims after
        from picklebot_tpu.parallel.mesh import make_mesh
        from picklebot_tpu.train.step import make_sharded_predict_fn

        mesh = make_mesh(data=args.data_parallel, model=1)
        sharded = make_sharded_predict_fn(model, mesh, policy,
                                          mean=mean, std=std,
                                          input_size=input_size)

        def predict(variables, feats):
            dp = args.data_parallel
            feats, b = pad_batch_to(feats, feats.shape[0]
                                    + (-feats.shape[0]) % dp)
            return sharded(variables, feats)[:b]
    else:
        predict = make_predict_fn(model, policy, mean=mean, std=std,
                                   input_size=input_size)

    def predict_records(batch_clips):
        """clips -> per-clip prediction dicts; the one pipeline every
        checkpoint-mode consumer (CLI, CSV, HTTP) shares. The batch dim
        buckets to powers of two so XLA compiles O(log) shapes. Clips of
        different resolutions can't stack into one tensor, so they run as
        same-(H, W) groups (the HTTP batcher already keys on shape; this
        covers the CLI/CSV paths) — with config.input_size each group
        resizes in-graph to the same model input."""
        groups = {}
        for i, c in enumerate(batch_clips):
            groups.setdefault(c.shape[1:3], []).append(i)
        records = [None] * len(batch_clips)
        for idxs in groups.values():
            feats, _ = pad_collate([batch_clips[i] for i in idxs],
                                   [0] * len(idxs),
                                   config.t_bucket, config.max_frames)
            feats, b = pad_batch_to(
                feats, pad_batch_pow2(feats.shape[0], args.batch))
            logits = np.asarray(predict(variables, feats), np.float32)[:b]
            for i, rec in zip(idxs, decode_logits(
                    logits, config.criterion, config.num_classes)):
                records[i] = rec
        return records

    def classify(batch_clips, names):
        recs = predict_records(batch_clips)
        for name, rec in zip(names, recs):
            print(json.dumps({"clip": name, **rec}))
        return np.array([r["pred"] for r in recs])

    if args.http is not None:
        from picklebot_tpu.data.dataset import bucket_frames

        batcher = RequestBatcher(predict_records, max_batch=args.batch,
                                 window_ms=args.batch_window)

        def classify_path(path):
            clip = decode(path)
            # batch only with same-shape peers: mixed resolutions can't
            # stack, and sharing a T bucket with a longer clip would
            # change this clip's unmasked padding (see RequestBatcher)
            key = (bucket_frames(clip.shape[0], config.t_bucket,
                                 config.max_frames),
                   clip.shape[1], clip.shape[2])
            return batcher.submit(clip, key=key)

        srv = make_http_server(args.http, classify_path,
                               {"mode": "checkpoint",
                                "model_name": config.model_name,
                                "num_classes": config.num_classes,
                                "criterion": config.criterion},
                               max_body=int(args.max_request_mb * 2**20),
                               request_timeout=args.request_timeout)
        print(json.dumps({"serving": f"http://0.0.0.0:"
                          f"{srv.server_address[1]}"}), flush=True)
        srv.serve_forever()
        return 0

    if args.csv:
        # decode exactly like training (_make_datasets): without
        # sample_fps the CSV eval would feed native-frame-rate clips to a
        # model trained on fps-strided ones and report a wrong accuracy
        ds = ClipDataset(args.csv, config.video_paths,
                         backend=config.data_backend,
                         synthetic_shape=config.synthetic_shape,
                         synthetic_len=config.synthetic_len,
                         sample_fps=config.sample_fps,
                         skip_bad_clips=config.skip_bad_clips)
        n = min(len(ds), args.limit or len(ds))
        correct = 0
        for start in range(0, n, args.batch):
            idxs = range(start, min(start + args.batch, n))
            clips, labels = zip(*[ds[i] for i in idxs])
            preds = classify(list(clips), [ds.filenames[i] for i in idxs])
            correct += int((preds == np.asarray(labels)).sum())
        print(json.dumps({"evaluated": n, "accuracy": correct / max(n, 1)}))
    else:
        if not args.clips:
            print("no clips given", file=sys.stderr)
            return 1
        for start in range(0, len(args.clips), args.batch):
            chunk = args.clips[start:start + args.batch]
            classify([decode(c) for c in chunk], chunk)
    return 0


if __name__ == "__main__":
    sys.exit(main())
