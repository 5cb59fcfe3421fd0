"""Threaded prefetching data loader + device feed.

Replaces torch's DataLoader stack (reference train.py:62-85: 8 worker
processes, pinned memory, prefetch_factor=4) with a host-side pipeline shaped
for TPU VMs: decode workers (cv2/np release the GIL) feed a bounded queue,
batches are collated with the C++ core, and ``device_prefetch`` keeps the
next batch's host->device transfer in flight while the current step runs.

Epoch shuffling matches DistributedSampler semantics: a permutation seeded by
(seed, epoch) via ``set_epoch`` (reference train.py:251-252); under
multi-host, dataset sharding already happened in ClipDataset.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterator, List, Tuple

import numpy as np

from picklebot_tpu.data.dataset import ClipDataset, pad_collate


class DataLoader:
    def __init__(self, dataset: ClipDataset, batch_size: int,
                 shuffle: bool = False, num_workers: int = 4,
                 t_bucket: int = 8, max_frames: int = 256,
                 seed: int = 1234, drop_last: bool = False,
                 prefetch_batches: int = 4,
                 temporal_jitter: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.t_bucket = t_bucket
        self.max_frames = max_frames
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        # training-time temporal sampling: clips longer than max_frames
        # contribute a RANDOM contiguous max_frames window instead of the
        # head (the eval loader keeps the deterministic head truncation).
        # The window is keyed by (seed, epoch, dataset index), so a
        # mid-epoch resume replays identical crops and different epochs
        # see different windows.
        self.temporal_jitter = temporal_jitter
        self.epoch = 0
        self._skip_batches = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def skip(self, n_batches: int):
        """Fast-forward the NEXT iteration past its first ``n_batches``
        batches (mid-epoch resume): the skipped indices are sliced out of
        the epoch permutation before any decode work, so the cost is zero
        and the remaining batches are exactly what an uninterrupted epoch
        would have produced from that position. One-shot."""
        self._skip_batches = max(0, int(n_batches))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState((self.seed + self.epoch) % 2**31)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self._order()
        nb = len(self)
        if self.drop_last:
            # don't decode the dropped tail — decode is the host bottleneck
            order = order[:nb * self.batch_size]
        skip, self._skip_batches = min(self._skip_batches, nb), 0
        if skip:
            order = order[skip * self.batch_size:]
            nb -= skip
        item_q: "queue.Queue" = queue.Queue(
            maxsize=self.prefetch_batches * self.batch_size)
        stop = threading.Event()
        cursor = {"i": 0}
        cursor_lock = threading.Lock()

        def worker():
            while not stop.is_set():
                with cursor_lock:
                    i = cursor["i"]
                    if i >= len(order):
                        return
                    cursor["i"] = i + 1
                try:
                    ds_idx = int(order[i])
                    item = self.dataset[ds_idx]
                    if self.temporal_jitter and \
                            item[0].shape[0] > self.max_frames:
                        clip, label = item
                        rng = np.random.RandomState(
                            (self.seed * 1000003 + self.epoch) * 1000003
                            % 2**31 ^ ds_idx)
                        s = rng.randint(
                            0, clip.shape[0] - self.max_frames + 1)
                        item = (clip[s:s + self.max_frames], label)
                except Exception as e:  # surface decode errors, don't hang
                    item = e
                item_q.put((i, item))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            pending = {}
            next_idx = 0
            for b in range(nb):
                take = min(self.batch_size, len(order) - b * self.batch_size)
                clips, labels = [], []
                while len(clips) < take:
                    while next_idx not in pending:
                        i, item = item_q.get()
                        pending[i] = item
                    item = pending.pop(next_idx)
                    next_idx += 1
                    if isinstance(item, Exception):
                        raise item
                    clip, label = item
                    clips.append(clip)
                    labels.append(label)
                yield pad_collate(clips, labels, self.t_bucket,
                                  self.max_frames)
        finally:
            stop.set()
            # drain until every worker exits: a single drain is not enough
            # when more workers than free queue slots are blocked on put()
            # (each would re-fill the queue and the rest stay blocked
            # forever, leaking a thread + a decoded clip per early abort)
            while any(t.is_alive() for t in threads):
                try:
                    item_q.get_nowait()
                except queue.Empty:
                    time.sleep(0.002)


def accumulate_batches(loader_iter, accum_steps: int):
    """Group ``accum_steps`` loader batches into one (A, B, T, H, W, C)
    super-batch for the grad-accumulation scan. Ragged T across the group is
    re-padded to the group max (already bucketed, so few distinct shapes).
    Yields (features, labels); a final partial group is dropped (the
    reference's last partial accumulation window never steps the optimizer
    either, train.py:283-289)."""
    group_f: List[np.ndarray] = []
    group_l: List[np.ndarray] = []
    for feats, labels in loader_iter:
        group_f.append(feats)
        group_l.append(labels)
        if len(group_f) == accum_steps:
            t_max = max(f.shape[1] for f in group_f)
            if any(f.shape[1] != t_max for f in group_f):
                group_f = [
                    np.pad(f, ((0, 0), (0, t_max - f.shape[1]),
                               (0, 0), (0, 0), (0, 0)))
                    for f in group_f]
            yield np.stack(group_f), np.stack(group_l)
            group_f, group_l = [], []


def device_prefetch(iterator, put: Callable, depth: int = 2):
    """Overlap host->device transfer with compute: keep ``depth`` batches'
    transfers in flight (the pinned-memory/non_blocking analog,
    reference train.py:69,104)."""
    import collections
    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) == depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
