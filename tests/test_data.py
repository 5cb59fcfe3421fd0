"""Data pipeline tests: dataset backends, bucketed collate (incl. the C++
core), loader ordering/shuffling/sharding, accumulation grouping."""

import numpy as np
import pytest

from picklebot_tpu.data.dataset import (ClipDataset, bucket_frames,
                                        pad_collate)
from picklebot_tpu.data.loader import DataLoader, accumulate_batches


def test_bucket_frames():
    assert bucket_frames(1, 8, 64) == 8
    assert bucket_frames(8, 8, 64) == 8
    assert bucket_frames(9, 8, 64) == 16
    assert bucket_frames(100, 8, 64) == 64  # clamp


def test_pad_collate_matches_reference_semantics(rng):
    clips = [rng.randint(0, 255, (t, 4, 4, 3)).astype(np.uint8)
             for t in (3, 7, 5)]
    batch, labels = pad_collate(clips, [1, 2, 3], t_bucket=8, max_frames=32)
    assert batch.shape == (3, 8, 4, 4, 3)
    assert labels.dtype == np.int64
    # content preserved, tail zero-padded
    np.testing.assert_array_equal(batch[0, :3], clips[0])
    assert batch[0, 3:].sum() == 0
    np.testing.assert_array_equal(batch[1, :7], clips[1])


def test_native_collate_matches_numpy(rng):
    from picklebot_tpu.data.native import get_lib, native_collate
    if get_lib() is None:
        pytest.skip("C++ collate lib unavailable")
    clips = [rng.randint(0, 255, (t, 6, 5, 3)).astype(np.uint8)
             for t in (2, 9, 4, 9)]
    want, _ = pad_collate(clips, [0, 0, 0, 0], native=False)
    got = np.zeros_like(want)
    assert native_collate(got, clips)
    np.testing.assert_array_equal(got, want)


def test_synthetic_dataset_and_loader():
    ds = ClipDataset("", "", backend="synthetic",
                     synthetic_shape=(8, 16, 16), synthetic_len=10)
    assert len(ds) == 10
    clip, label = ds[3]
    assert clip.shape[1:] == (16, 16, 3) and clip.dtype == np.uint8
    clip2, _ = ds[3]
    np.testing.assert_array_equal(clip, clip2)  # deterministic

    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        t_bucket=8, max_frames=16, drop_last=True)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    for feats, labels in batches:
        assert feats.shape[0] == 4 and feats.dtype == np.uint8
        assert labels.shape == (4,)

    # shuffling changes with epoch, deterministic per epoch
    loader.set_epoch(0)
    a = [tuple(l) for _, l in loader]
    loader.set_epoch(0)
    b = [tuple(l) for _, l in loader]
    loader.set_epoch(1)
    c = [tuple(l) for _, l in loader]
    assert a == b
    assert a != c


def test_loader_early_abort_releases_workers():
    """Breaking out of the loader mid-epoch must unblock EVERY decode
    worker, even with more workers than free queue slots blocked on put()
    — a single drain pass used to leave the surplus blocked forever (one
    leaked daemon thread + one decoded clip per early abort)."""
    import threading
    import time
    ds = ClipDataset("", "", backend="synthetic", synthetic_len=64,
                     synthetic_shape=(4, 8, 8))
    baseline = threading.active_count()
    for _ in range(3):  # repeated aborts used to accumulate leaks
        loader = DataLoader(ds, batch_size=1, num_workers=8,
                            prefetch_batches=2)
        it = iter(loader)
        next(it)
        it.close()  # generator close runs the finally drain
    deadline = time.time() + 10
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= baseline


def test_dataset_sharding():
    full = ClipDataset("", "", backend="synthetic", synthetic_len=16)
    shards = [ClipDataset("", "", backend="synthetic", synthetic_len=16,
                          shard=i, num_shards=4) for i in range(4)]
    assert sum(len(s) for s in shards) == len(full)
    seen = set()
    for s in shards:
        seen.update(s.filenames)
    assert len(seen) == 16  # disjoint cover


@pytest.mark.parametrize("backend", ["synthetic", "synthetic_learnable"])
def test_synthetic_shard_content_matches_global(backend):
    """Sharded synthetic clips must be the SAME (pixels, label) pairs as
    the unsharded dataset's — seeding content by the post-shard local index
    made different hosts render byte-identical clips carrying different
    labels (a contradictory multi-host task), and made the learnable
    brightness scale disagree across hosts."""
    kw = dict(backend=backend, synthetic_len=10, synthetic_classes=4,
              synthetic_shape=(4, 8, 8))
    full = ClipDataset("", "", **kw)
    by_name = {full.filenames[i]: full[i] for i in range(len(full))}
    for shard in range(2):
        ds = ClipDataset("", "", shard=shard, num_shards=2, **kw)
        for i in range(len(ds)):
            clip, label = ds[i]
            g_clip, g_label = by_name[ds.filenames[i]]
            assert label == g_label
            np.testing.assert_array_equal(clip, g_clip)


def test_accumulate_batches(rng):
    def gen():
        for t in (8, 16, 8, 8, 16, 8):
            yield (rng.randint(0, 255, (2, t, 4, 4, 3)).astype(np.uint8),
                   np.zeros((2,), np.int64))

    groups = list(accumulate_batches(gen(), 2))
    assert len(groups) == 3
    feats, labels = groups[0]
    assert feats.shape == (2, 2, 16, 4, 4, 3)  # re-padded to group max
    assert labels.shape == (2, 2)


def test_csv_reading(tmp_path):
    csv = tmp_path / "ann.csv"
    csv.write_text("filename,zone\na.mp4,3\nb.mp4,11\n")
    ds = ClipDataset(str(csv), str(tmp_path), backend="npy")
    assert len(ds) == 2
    assert list(ds.labels) == [3, 11]


def test_opencv_backend_end_to_end(tmp_path, rng):
    """Real mp4s through the opencv decode path (reference's default
    backend, dataloader.py:46-56)."""
    cv2 = pytest.importorskip("cv2")
    rows = []
    for i, t in enumerate((6, 9)):
        name = f"clip{i}.mp4"
        w = cv2.VideoWriter(str(tmp_path / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 24))
        assert w.isOpened()
        for _ in range(t):
            w.write(rng.randint(0, 255, (24, 32, 3)).astype(np.uint8))
        w.release()
        rows.append((name, i))
    csv = tmp_path / "ann.csv"
    csv.write_text("filename,zone\n" +
                   "\n".join(f"{n},{z}" for n, z in rows) + "\n")

    ds = ClipDataset(str(csv), str(tmp_path), backend="opencv")
    clip, label = ds[0]
    assert clip.shape == (6, 24, 32, 3) and clip.dtype == np.uint8
    assert label == 0

    loader = DataLoader(ds, batch_size=2, num_workers=2, t_bucket=8,
                        max_frames=16)
    (feats, labels), = list(loader)
    assert feats.shape == (2, 16, 24, 32, 3)  # bucketed to max clip's bucket
    assert list(labels) == [0, 1]
    # mp4 codecs are lossy; just check content is nonzero where frames exist
    assert feats[0, :6].sum() > 0
    assert feats[0, 6:].sum() == 0  # zero-padded tail


def test_ffmpeg_backend_matches_opencv(tmp_path, rng):
    """The first-party libavcodec decode core (videodec.cpp, the reference's
    torchvision.read_video analog — dataloader.py:41-43) must reproduce the
    OpenCV backend's frames on the same mp4s. Both stacks decode through
    libavcodec, exactly like the reference's pair, so parity is byte-exact."""
    cv2 = pytest.importorskip("cv2")
    from picklebot_tpu.data.native import ffmpeg_available
    if not ffmpeg_available():
        pytest.skip("libav* dev libraries not installed")

    name = "clip.mp4"
    w = cv2.VideoWriter(str(tmp_path / name),
                        cv2.VideoWriter_fourcc(*"mp4v"), 30, (48, 32))
    assert w.isOpened()
    for t in range(10):  # I frame + P frames (mp4v GOP spans this clip)
        frame = ((rng.rand(32, 48, 3) * 80) + t * 10).astype(np.uint8)
        w.write(frame)
    w.release()
    csv = tmp_path / "ann.csv"
    csv.write_text(f"filename,zone\n{name},5\n")

    ds_cv = ClipDataset(str(csv), str(tmp_path), backend="opencv")
    ds_ff = ClipDataset(str(csv), str(tmp_path), backend="ffmpeg")
    clip_cv, label_cv = ds_cv[0]
    clip_ff, label_ff = ds_ff[0]
    assert label_cv == label_ff == 5
    assert clip_ff.shape == clip_cv.shape == (10, 32, 48, 3)
    assert clip_ff.dtype == np.uint8
    np.testing.assert_array_equal(clip_ff, clip_cv)


def test_ffmpeg_backend_through_loader(tmp_path, rng):
    """backend='ffmpeg' drives the full DataLoader path (threaded decode
    workers + C++ collate), selectable via config data_backend."""
    cv2 = pytest.importorskip("cv2")
    from picklebot_tpu.data.native import ffmpeg_available
    if not ffmpeg_available():
        pytest.skip("libav* dev libraries not installed")
    rows = []
    for i, t in enumerate((5, 7)):
        name = f"clip{i}.mp4"
        w = cv2.VideoWriter(str(tmp_path / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 24))
        assert w.isOpened()
        for _ in range(t):
            w.write(rng.randint(0, 255, (24, 32, 3)).astype(np.uint8))
        w.release()
        rows.append((name, i))
    csv = tmp_path / "ann.csv"
    csv.write_text("filename,zone\n" +
                   "\n".join(f"{n},{z}" for n, z in rows) + "\n")

    from picklebot_tpu.utils.config import Config
    cfg = Config(data_backend="ffmpeg").validate()   # accepted by config
    ds = ClipDataset(str(csv), str(tmp_path), backend=cfg.data_backend)
    loader = DataLoader(ds, batch_size=2, num_workers=2, t_bucket=8,
                        max_frames=16)
    (feats, labels), = list(loader)
    assert feats.shape == (2, 8, 24, 32, 3)
    assert list(labels) == [0, 1]
    assert feats[0, :5].sum() > 0 and feats[0, 5:].sum() == 0


def test_temporal_jitter_random_window():
    """temporal_jitter: clips longer than max_frames contribute a random
    contiguous window (not the head), deterministically per (seed, epoch,
    clip); different epochs see different windows; off -> head."""
    from picklebot_tpu.data.loader import DataLoader

    ds = ClipDataset("", "", backend="synthetic",
                     synthetic_shape=(24, 8, 8), synthetic_len=6)
    sources = {i: ds[i][0] for i in range(len(ds))}

    def windows(loader):
        out = []
        for feats, _ in iter(loader):
            for clip in feats:
                out.append(clip)
        return out

    def find_offset(window, src, t):
        for s in range(src.shape[0] - t + 1):
            if np.array_equal(window[:t], src[s:s + t]):
                return s
        return None

    # jitter ON: every batch clip is SOME contiguous window; two
    # iterations at the same epoch agree; epochs differ somewhere
    lj = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                    t_bucket=8, max_frames=8, temporal_jitter=True)
    lj.set_epoch(0)
    w0a, w0b = windows(lj), windows(lj)
    offs0 = [find_offset(w, sources[i], 8) for i, w in enumerate(w0a)]
    assert all(o is not None for o in offs0), offs0
    for a, b in zip(w0a, w0b):
        np.testing.assert_array_equal(a, b)
    lj.set_epoch(1)
    offs1 = [find_offset(w, sources[i], 8) for i, w in enumerate(windows(lj))]
    assert offs0 != offs1, (offs0, offs1)
    assert any(o != 0 for o in offs0 + offs1)

    # jitter OFF (default): head truncation exactly
    lh = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                    t_bucket=8, max_frames=8)
    for i, w in enumerate(windows(lh)):
        np.testing.assert_array_equal(w[:8], sources[i][:8])


def test_transform_hooks():
    """transform / target_transform: per-item host-side hooks with the
    reference's dataset API semantics (reference dataloader.py:30-33,
    59-62 — clip mapped after decode, label mapped independently)."""
    from picklebot_tpu.data.dataset import ClipDataset
    base = ClipDataset("", "", backend="synthetic", synthetic_len=4,
                       synthetic_shape=(4, 8, 8))
    hooked = ClipDataset("", "", backend="synthetic", synthetic_len=4,
                         synthetic_shape=(4, 8, 8),
                         transform=lambda c: c[:, ::2, ::2],
                         target_transform=lambda y: y + 100)
    clip0, label0 = base[1]
    clip1, label1 = hooked[1]
    np.testing.assert_array_equal(clip1, clip0[:, ::2, ::2])
    assert label1 == label0 + 100


def _write_clip(path, rng, frames=8, wh=(32, 24)):
    import cv2
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, wh)
    assert w.isOpened()
    for _ in range(frames):
        w.write(rng.randint(0, 255, (wh[1], wh[0], 3)).astype(np.uint8))
    w.release()


@pytest.mark.parametrize("backend", ["opencv", "ffmpeg"])
@pytest.mark.parametrize("corruption", ["truncated", "zero_byte"])
def test_bad_clip_raises_with_filename(tmp_path, rng, backend, corruption):
    """Strict default (round-5 hardening): a corrupt mp4 mid-epoch fails
    with the FILENAME in the error, on both decode backends — the
    reference would crash opaquely (np.stack of an empty frame list,
    dataloader.py:46-56)."""
    pytest.importorskip("cv2")
    _write_clip(tmp_path / "good.mp4", rng)
    bad = tmp_path / "bad.mp4"
    if corruption == "truncated":
        data = (tmp_path / "good.mp4").read_bytes()
        bad.write_bytes(data[: len(data) // 3])
    else:
        bad.write_bytes(b"")
    csv = tmp_path / "ann.csv"
    csv.write_text("filename,zone\ngood.mp4,0\nbad.mp4,1\n")
    ds = ClipDataset(str(csv), str(tmp_path), backend=backend)
    with pytest.raises((OSError, RuntimeError), match="bad.mp4"):
        ds[1]


@pytest.mark.parametrize("backend", ["opencv", "ffmpeg"])
def test_skip_bad_clips_counter(tmp_path, rng, backend):
    """Opt-in resilience (config.skip_bad_clips): undecodable clips are
    skipped (next good clip substitutes) and counted, so one corrupt shard
    doesn't kill a long run; an all-bad dataset still raises."""
    pytest.importorskip("cv2")
    _write_clip(tmp_path / "good.mp4", rng)
    (tmp_path / "bad.mp4").write_bytes(b"\x00" * 2048)
    csv = tmp_path / "ann.csv"
    csv.write_text("filename,zone\nbad.mp4,1\ngood.mp4,0\n")
    ds = ClipDataset(str(csv), str(tmp_path), backend=backend,
                     skip_bad_clips=True)
    clip, label = ds[0]          # bad.mp4 -> substitutes good.mp4
    assert clip.shape[0] > 0 and label == 0
    assert ds.bad_clips == 1
    # all-bad dataset must raise, not loop forever
    csv2 = tmp_path / "ann2.csv"
    csv2.write_text("filename,zone\nbad.mp4,1\n")
    ds2 = ClipDataset(str(csv2), str(tmp_path), backend=backend,
                      skip_bad_clips=True)
    with pytest.raises(IOError, match="all failed"):
        ds2[0]
