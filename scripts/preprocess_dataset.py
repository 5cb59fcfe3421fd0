"""Offline dataset preprocessing: mp4 clips -> .npy cache.

Decoding mp4 per epoch is the practical bottleneck for keeping TPU chips fed
from a single host (the reference spends its 8 DataLoader workers on OpenCV
decode, dataloader.py:46-56). This tool decodes once, optionally resizes,
and writes (T, H, W, 3) uint8 .npy files + a rewritten annotations CSV, so
training uses the 'npy' backend (pure mmap-speed reads).

Usage:
  python scripts/preprocess_dataset.py in.csv /videos out_dir \
      [--resize 224] [--max-frames 128] [--workers 4]
"""

import argparse
import csv
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from picklebot_tpu.data.dataset import decode_opencv, read_annotations  # noqa: E402


def process_one(args):
    (filename, label, video_dir, out_dir, resize, max_frames) = args
    src = os.path.join(video_dir, filename)
    dst_name = os.path.splitext(filename)[0] + ".npy"
    dst = os.path.join(out_dir, dst_name)
    if os.path.exists(dst):
        return dst_name, label, True
    try:
        clip = decode_opencv(src)
    except Exception as e:
        print(f"skip {filename}: {e}", file=sys.stderr)
        return None
    if max_frames and clip.shape[0] > max_frames:
        clip = clip[:max_frames]
    if resize and clip.shape[1:3] != (resize, resize):
        import cv2
        clip = np.stack([cv2.resize(f, (resize, resize),
                                    interpolation=cv2.INTER_AREA)
                         for f in clip])
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.save(dst, np.ascontiguousarray(clip, np.uint8))
    return dst_name, label, False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("annotations")
    p.add_argument("video_dir")
    p.add_argument("out_dir")
    p.add_argument("--resize", type=int, default=None)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    names, labels = read_annotations(args.annotations)
    os.makedirs(args.out_dir, exist_ok=True)
    work = [(n, int(l), args.video_dir, args.out_dir, args.resize,
             args.max_frames) for n, l in zip(names, labels)]
    rows = []
    with ThreadPoolExecutor(args.workers) as ex:
        for i, result in enumerate(ex.map(process_one, work)):
            if result:
                rows.append(result[:2])
            if (i + 1) % 500 == 0:
                print(f"{i + 1}/{len(work)}")
    csv_out = os.path.join(args.out_dir, "annotations.csv")
    with open(csv_out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["filename", "zone"])
        w.writerows(rows)
    print(f"wrote {len(rows)} clips + {csv_out}")


if __name__ == "__main__":
    main()
