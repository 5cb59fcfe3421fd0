"""Clip dataset: CSV annotations + pluggable video decode backends.

Capability parity with reference dataloader.py:26-63 (PicklebotDataset):
a CSV with ``filename`` / ``zone`` columns (read via pyarrow), a video
directory, per-item full-clip decode to (T, H, W, C) uint8 RGB.

Backends:
  opencv     cv2.VideoCapture frame loop + BGR->RGB (reference's default)
  npy        .npy/.npz clips (fast path for preprocessed datasets)
  synthetic  deterministic random clips keyed by index — lets the full
             training stack run and be tested without the Picklebot videos
  synthetic_learnable  same, plus a per-class brightness signal (learning
             regression tests)

TPU-first divergence from the reference: the reference pads every batch to
its own max T (dataloader.py:10-23), which under XLA would recompile the
train step for every new shape. We pad T to a *bucket* (next multiple of
``t_bucket``, clamped to ``max_frames``) so the step compiles once per
bucket; clips longer than max_frames are truncated (head), shorter ones
zero-padded — zero frames are what the reference's collate produces too.

Per-host sharding (``shard``/``num_shards``) replaces DistributedSampler
(reference train.py:59-60): each host reads only its slice of the CSV.
"""

from __future__ import annotations

import os
import threading
import zipfile
from typing import List, Optional, Sequence, Tuple

import numpy as np


def read_annotations(csv_path: str) -> Tuple[List[str], np.ndarray]:
    """CSV -> (filenames, zone labels). pyarrow like the reference
    (dataloader.py:28), pandas/python fallback."""
    try:
        import pyarrow.csv as pacsv
        table = pacsv.read_csv(csv_path)
        names = table.column("filename").to_pylist()
        zones = np.asarray(table.column("zone").to_pylist(), np.int64)
        return names, zones
    except Exception:
        import csv as _csv
        names, zones = [], []
        with open(csv_path, newline="", encoding="ISO-8859-1") as f:
            for row in _csv.DictReader(f):
                names.append(row["filename"])
                zones.append(int(float(row["zone"])))
        return names, np.asarray(zones, np.int64)


def sample_stride(native_fps: float, sample_fps: float) -> int:
    """Keep every k-th frame so the output rate approximates sample_fps.

    Rounds half-up (2.5 -> 3), NOT Python banker's rounding: the ffmpeg
    core computes the identical ``(int64_t)(fps / sample_fps + 0.5)``
    (native_src/videodec.cpp), and the two backends must pick the same
    frames for the byte-parity contract to hold at half-integer ratios
    (e.g. 25 fps at sample_fps=10).
    Unknown/zero container fps -> keep everything (never guess a rate)."""
    if sample_fps <= 0 or native_fps <= 0:
        return 1
    return max(1, int(native_fps / sample_fps + 0.5))


def decode_opencv(path: str, sample_fps: float = 0.0) -> np.ndarray:
    """mp4 -> (T, H, W, 3) uint8 RGB (reference dataloader.py:46-56).

    ``sample_fps`` > 0 enables frame-rate sampling (config.sample_fps):
    only every round(container_fps / sample_fps)-th frame is kept — the
    dropped frames skip the BGR->RGB conversion and the copy (the codec
    still has to decode them; inter-frame codecs can't seek cheaply)."""
    import cv2
    cap = cv2.VideoCapture(path)
    stride = sample_stride(cap.get(cv2.CAP_PROP_FPS) or 0.0, sample_fps)
    frames = []
    i = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if i % stride == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        i += 1
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def decode_npy(path: str) -> np.ndarray:
    arr = np.load(path)
    if hasattr(arr, "files"):  # npz
        arr = arr[arr.files[0]]
    if arr.ndim != 4 or arr.shape[-1] != 3:
        # ValueError (not assert) so skip_bad_clips can catch it
        raise ValueError(f"{path}: expected (T, H, W, 3), got {arr.shape}")
    return np.ascontiguousarray(arr, np.uint8)


def decode_ffmpeg(path: str, sample_fps: float = 0.0) -> np.ndarray:
    """Second real video decode backend: the first-party libavcodec core
    (data/native_src/videodec.cpp) — the analog of the reference's
    torchvision.io.read_video path (dataloader.py:41-43), which is likewise
    an ffmpeg integration. Same (T, H, W, 3) uint8 RGB as decode_opencv;
    byte-parity on the same mp4s is tested (tests/test_data.py).
    ``sample_fps``: same frame-rate sampling contract as decode_opencv
    (the stride is computed in the native core)."""
    from picklebot_tpu.data.native import decode_video_ffmpeg
    return decode_video_ffmpeg(path, sample_fps=sample_fps)


class ClipDataset:
    def __init__(self, annotations_file: str, video_dir: str,
                 backend: str = "opencv",
                 shard: int = 0, num_shards: int = 1,
                 synthetic_shape: Tuple[int, int, int] = (16, 224, 224),
                 synthetic_len: Optional[int] = None,
                 sample_fps: float = 0.0,
                 transform=None, target_transform=None,
                 synthetic_classes: int = 13,
                 skip_bad_clips: bool = False):
        self.video_dir = video_dir
        self.backend = backend
        # frame-rate sampling at decode (config.sample_fps; video backends
        # only — npy/synthetic carry no fps metadata, config validates)
        self.sample_fps = float(sample_fps)
        # host-side per-item hooks (reference dataloader.py:30-33, 59-62 —
        # declared there, unused by its own train path): ``transform`` maps
        # the decoded (T, H, W, C) uint8 clip, ``target_transform`` maps the
        # int label. For training-time augmentation prefer the in-graph
        # config.augment_* path (data/augment.py) — these hooks run on the
        # (single-core) host, per item.
        self.transform = transform
        self.target_transform = target_transform
        # Bad-clip policy (config.skip_bad_clips). Default STRICT: a
        # truncated/corrupt/zero-byte file raises with its filename (both
        # decode backends include the path — tests/test_data.py) so a bad
        # dataset is found at the first touch, not trained through. The
        # reference would hang/crash opaquely here (dataloader.py:46-56
        # np.stack of an empty list). Opt-in skip: substitute the next
        # good clip and count it in ``bad_clips`` (production resilience —
        # one corrupt shard must not kill a week-long run).
        self.skip_bad_clips = bool(skip_bad_clips)
        self.bad_clips = 0
        self._bad_seen = set()
        # guards the counter/warn-set: __getitem__ runs on DataLoader
        # worker THREADS, and an unlocked += undercounts the telemetry
        self._bad_lock = threading.Lock()
        self._synthetic_ids = None
        if backend in ("synthetic", "synthetic_learnable"):
            n = synthetic_len or 64
            self.filenames = [f"synthetic_{i}.mp4" for i in range(n)]
            # synthetic_classes sets the task's difficulty knob: the
            # learnable signal separates classes by ~150/n_cls gray levels
            # (statistical test gates use 4 classes so their margins sit
            # far above seed noise; default 13 = the zone task)
            self.labels = (np.arange(n) % max(1, synthetic_classes)
                           ).astype(np.int64)
            # content generation must key on the GLOBAL index and the
            # GLOBAL class count: post-shard locals would make different
            # hosts render byte-identical clips with conflicting labels
            # (and disagree on the brightness scale) under num_shards > 1
            self._synthetic_ids = np.arange(n)
            self._synthetic_n_cls = max(int(self.labels.max()) + 1, 1)
        else:
            self.filenames, self.labels = read_annotations(annotations_file)
        self.synthetic_shape = synthetic_shape
        # strided per-host shard, truncated to equal length — hosts must run
        # identical batch counts or lockstep collectives hang
        if num_shards > 1:
            per_host = len(self.filenames) // num_shards
            self.filenames = self.filenames[shard::num_shards][:per_host]
            self.labels = self.labels[shard::num_shards][:per_host]
            if self._synthetic_ids is not None:
                self._synthetic_ids = (
                    self._synthetic_ids[shard::num_shards][:per_host])

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        if not self.skip_bad_clips:
            clip, label = self._decode_item(idx)
        else:
            # walk forward past undecodable clips (counted, warned once per
            # file); if a full cycle finds nothing decodable the dataset is
            # garbage — raise rather than loop forever
            for attempt in range(len(self.filenames)):
                j = (idx + attempt) % len(self.filenames)
                try:
                    clip, label = self._decode_item(j)
                    break
                except (OSError, RuntimeError, ValueError,
                        zipfile.BadZipFile) as e:
                    # BadZipFile: np.load on a truncated .npz (it is NOT a
                    # ValueError subclass)
                    name = self.filenames[j]
                    with self._bad_lock:
                        self.bad_clips += 1
                        warn = name not in self._bad_seen
                        self._bad_seen.add(name)
                    if warn:
                        print(f"[dataset] skip_bad_clips: skipping {name} "
                              f"({type(e).__name__}: {e})")
            else:
                raise IOError(
                    f"skip_bad_clips: no decodable clip in the dataset "
                    f"({len(self.filenames)} files, all failed)")
        if self.transform is not None:
            clip = self.transform(clip)
        if self.target_transform is not None:
            label = self.target_transform(label)
        return clip, label

    def _decode_item(self, idx: int) -> Tuple[np.ndarray, int]:
        label = int(self.labels[idx])
        if self.backend in ("synthetic", "synthetic_learnable"):
            t, h, w = self.synthetic_shape
            # key content on the GLOBAL index (== idx at num_shards=1):
            # per-host locals would collide across shards (see __init__)
            gidx = int(self._synthetic_ids[idx])
            rng = np.random.RandomState(gidx)
            # vary T to exercise the bucket/padding path
            t_i = max(1, t - (gidx % 4))
            if self.backend == "synthetic_learnable":
                # plant a class-dependent signal that survives global
                # average pooling: noise in [0, 100) plus a per-class
                # brightness offset — a task the stack must learn quickly
                # (plain 'synthetic' is pure memorization of noise)
                clip = (rng.randint(0, 100, (t_i, h, w, 3)) +
                        (label * 150) // self._synthetic_n_cls
                        ).astype(np.uint8)
            else:
                clip = rng.randint(0, 255, (t_i, h, w, 3)).astype(np.uint8)
            return clip, label
        path = os.path.join(self.video_dir, self.filenames[idx])
        if self.backend == "opencv":
            return decode_opencv(path, self.sample_fps), label
        if self.backend == "ffmpeg":
            return decode_ffmpeg(path, self.sample_fps), label
        if self.backend == "npy":
            return decode_npy(path), label
        raise ValueError(f"unknown backend {self.backend}")


def bucket_frames(t: int, t_bucket: int, max_frames: int) -> int:
    """Round T up to the next bucket multiple, clamp to max_frames."""
    b = -(-t // t_bucket) * t_bucket
    return min(b, max_frames)


def pad_collate(clips: Sequence[np.ndarray], labels: Sequence[int],
                t_bucket: int = 8, max_frames: int = 256,
                native: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad clips on T to a shared bucket and stack to (B, T, H, W, C).

    Same output convention as reference custom_collate (dataloader.py:10-23)
    except the target T is bucketed (static-shape policy, see module doc).
    Uses the C++ collate core when available (parallel memcpy, no GIL).
    """
    t_max = max(c.shape[0] for c in clips)
    t_out = bucket_frames(t_max, t_bucket, max_frames)
    h, w, ch = clips[0].shape[1:]
    shapes = {c.shape[1:] for c in clips}
    if len(shapes) > 1:
        # a batch must share one (H, W): stacking mixed resolutions would
        # corrupt the tensor (the in-graph config.input_size resize runs
        # AFTER collation). Fail with the fix, not a broadcast error.
        raise ValueError(
            f"clips in one batch have mixed frame shapes {sorted(shapes)}; "
            "a mixed-resolution dataset needs offline normalization "
            "(scripts/preprocess_dataset.py --resize) — config.input_size "
            "resizes on device but batches must still stack uniformly")
    batch = np.zeros((len(clips), t_out, h, w, ch), np.uint8)
    if native:
        from picklebot_tpu.data.native import native_collate
        if native_collate(batch, clips):
            return batch, np.asarray(labels, np.int64)
    for i, clip in enumerate(clips):
        t_i = min(clip.shape[0], t_out)
        batch[i, :t_i] = clip[:t_i]
    return batch, np.asarray(labels, np.int64)
