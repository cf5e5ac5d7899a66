"""Host-sharded, thread-prefetched input pipeline.

The reference uses Paddle's DataLoader with 2 worker processes
(reference: train.py:58-63). Here the pipeline is a plain-Python design built
for multi-host TPU training:

* **Per-host sharding**: each JAX process reads the disjoint slice
  `index[process_index::process_count]` of the (epoch-shuffled) example list,
  so hosts never duplicate IO and the global batch is assembled by pjit from
  per-host local batches.
* **Static shapes, lockstep hosts**: training drops the trailing partial
  batch (a ragged batch would retrigger XLA compilation); evaluation pads the
  final batch and returns a per-example validity mask so metrics stay exact.
  The per-epoch batch COUNT is derived from the global example count so it is
  identical on every host — a host running one extra jitted collective step
  would deadlock the mesh (see `batches_per_epoch`).
* **Thread-pool decode + bounded prefetch queue**: PIL/PFM decode overlaps
  with device compute; threads (not processes) are enough because decode
  releases the GIL inside zlib/numpy.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

from lwsnet_tpu.data.kitti2015 import StereoIndex
from lwsnet_tpu.data import transforms as T


@dataclass(frozen=True)
class Batch:
    """One host-local batch, NHWC float32."""

    left: np.ndarray    # (B, H, W, 3) normalized
    right: np.ndarray   # (B, H, W, 3) normalized
    disparity: np.ndarray  # (B, H, W) float32; zeros where padded
    valid: np.ndarray   # (B,) 1.0 for real examples, 0.0 for padding


def _load_example(index: StereoIndex, i: int, training: bool,
                  crop: Tuple[int, int], kitti: bool,
                  rng: np.random.Generator,
                  sceneflow_full_gt_crop: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    ch, cw = crop
    if kitti:
        # KITTI fast path: decode to uint8, then ONE fused C++ pass does
        # crop + /255 + normalize touching only the crop window
        # (native/src/stereo_ops.cc; numpy fallback inside the transforms).
        left_u8 = T.decode_image_u8(index.left[i])
        right_u8 = T.decode_image_u8(index.right[i])
        h, w = left_u8.shape[:2]
        if training:
            # same draw order as T.random_crop (reference: dataloader.py:61-70)
            y0 = int(rng.integers(0, h - ch + 1))
            x0 = int(rng.integers(0, w - cw + 1))
        else:
            # bottom-right eval crop (reference: dataloader/dataloader.py:81-83)
            y0, x0 = h - ch, w - cw
        left = T.crop_normalize(left_u8, y0, x0, ch, cw)
        right = T.crop_normalize(right_u8, y0, x0, ch, cw)
        if index.disp:
            disp = T.load_crop_disparity_kitti(index.disp[i], y0, x0, ch, cw)
        else:
            disp = np.zeros((ch, cw), dtype=np.float32)
        return left, right, disp

    # SceneFlow path: PFM ground truth, zero-padded short eval crops.
    left = T.load_image(index.left[i])
    right = T.load_image(index.right[i])
    disp = (T.load_disparity_sceneflow(index.disp[i]) if index.disp
            else np.zeros(left.shape[:2], dtype=np.float32))
    if training:
        left, right, disp = T.random_crop(left, right, disp, ch, cw, rng)
    else:
        # SceneFlow eval crops 544 rows from 540-row images; the top rows are
        # zero-padded (reference: dataloader/dataloader.py:85 via PIL).
        left = T.bottom_right_crop(left, ch, cw, pad_if_short=True)
        right = T.bottom_right_crop(right, ch, cw, pad_if_short=True)
        # SceneFlow eval keeps full-size GT; the row offset is handled in the
        # metric (reference: dataloader/dataloader.py:87, train.py:189).

    return T.normalize(left), T.normalize(right), disp


class StereoPipeline:
    """Iterable over host-local batches for one split."""

    def __init__(self, index: StereoIndex, batch_size: int,
                 training: bool, crop: Tuple[int, int], kitti: bool,
                 seed: int = 0, num_workers: int = 8, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        self.index = index
        self.batch_size = batch_size
        self.training = training
        self.crop = crop
        self.kitti = kitti
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.process_index = process_index
        self.process_count = process_count

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.index)
        order = np.arange(n)
        if self.training:
            # Identical shuffle on every host (same seed), then disjoint
            # per-host slices — the standard JAX data-parallel recipe.
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        return order[self.process_index::self.process_count]

    def batches_per_epoch(self) -> int:
        """Per-host batch count, identical on EVERY host.

        Derived from the GLOBAL example count, not this host's slice: per-host
        slice lengths differ by one when process_count doesn't divide n, and a
        host running one more jitted collective step than its peers deadlocks
        the mesh. Training uses the minimum local count floor-divided (every
        host drops to the shortest), eval the maximum ceil-divided (short
        hosts pad with valid=0 examples).
        """
        n, pc = len(self.index), self.process_count
        if self.training:
            return (n // pc) // self.batch_size
        return -(-(-(-n // pc)) // self.batch_size)  # ceil(ceil(n/pc)/bs)

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        order = self._epoch_order(epoch)
        total = self.batches_per_epoch()
        order = order[: total * self.batch_size]
        if total == 0:
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def load_one(args):
            j, i = args
            rng = np.random.default_rng((self.seed, epoch, int(i), j))
            return _load_example(self.index, int(i), self.training,
                                 self.crop, self.kitti, rng)

        # Shape donor for padding rows: duplicated real example, masked out by
        # valid=0 (a host whose slice is empty — n < process_count — still
        # emits `total` all-padding batches so collective step counts match).
        donor = int(order[0]) if len(order) else 0

        def producer():
            try:
                for b in range(total):
                    if stop.is_set():
                        return
                    ids = list(order[b * self.batch_size:
                                     (b + 1) * self.batch_size])
                    n_real = len(ids)
                    ids += [donor] * (self.batch_size - n_real)
                    examples = list(pool.map(load_one, enumerate(ids)))
                    valid = (np.arange(self.batch_size) < n_real
                             ).astype(np.float32)
                    out_q.put(Batch(np.stack([e[0] for e in examples]),
                                    np.stack([e[1] for e in examples]),
                                    np.stack([e[2] for e in examples]),
                                    valid))
                out_q.put(None)
            except BaseException as e:  # surface decode errors to the consumer
                out_q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)
