"""Async host-side input pipeline.

Replaces the reference's TF FIFOQueue + enqueue thread
(ref: lib/networks/vgg16_convs.py:45-75 queue construction;
lib/fcn/train.py:382-436 load_and_enqueue thread) and the mixed
real/synthetic/adapt index streams with ratio sampling
(ref: lib/gt_synthesize_layer/layer.py:76-113).

Design: N worker threads produce minibatches into a bounded queue;
the training loop pulls already-device_put, sharded batches. Multi-
host: each process shards the global index list by process_index
(jax.process_count) — per-host independent pipelines, the standard
TPU input pattern (SURVEY.md §2.4 table).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class RatioSampler:
    """Interleave multiple index streams with integer ratios
    (ref: GtSynthesizeLayer._get_next_minibatch ratio logic,
    layer.py:76-113: e.g. 1 synthetic batch per real batch)."""

    def __init__(self, streams: Sequence[str], ratios: Sequence[int]):
        assert len(streams) == len(ratios) and len(streams) > 0
        self.schedule = []
        for s, r in zip(streams, ratios):
            self.schedule.extend([s] * max(int(r), 0))
        if not self.schedule:
            self.schedule = [streams[0]]
        self._i = 0

    def next_stream(self) -> str:
        s = self.schedule[self._i % len(self.schedule)]
        self._i += 1
        return s


class ShuffledIndexer:
    """Epoch-shuffled index stream (ref: imdb roidb shuffling in
    layer.py:60-74), sharded across hosts."""

    def __init__(self, num_items: int, seed: int = 0, process_index: int = 0, process_count: int = 1):
        self.num_items = num_items
        self.rng = np.random.RandomState(seed + process_index)
        self.process_index = process_index
        self.process_count = process_count
        self._perm = np.empty(0, np.int64)
        self._cur = 0

    def next_batch(self, batch_size: int) -> np.ndarray:
        out = []
        while len(out) < batch_size:
            if self._cur >= len(self._perm):
                perm = self.rng.permutation(self.num_items)
                # per-host shard of the shuffled epoch
                self._perm = perm[self.process_index :: self.process_count]
                self._cur = 0
            out.append(self._perm[self._cur])
            self._cur += 1
        return np.asarray(out)


class Prefetcher:
    """Threaded minibatch prefetcher (replaces the enqueue thread +
    FIFOQueue(25), ref: train.py:116-121,382-436)."""

    def __init__(
        self,
        make_batch: Optional[Callable[[], dict]] = None,
        queue_size: int = 8,
        num_workers: int = 2,
        device_put: Optional[Callable[[dict], dict]] = None,
        make_batch_factory: Optional[Callable[[int], Callable[[], dict]]] = None,
    ):
        """Either `make_batch` (ONE shared producer — run with
        num_workers=1 unless it is thread-safe; np.RandomState and the
        index samplers are not) or `make_batch_factory(worker_id)`
        giving each worker its OWN producer (own rng/generator —
        the safe way to scale workers)."""
        if (make_batch is None) == (make_batch_factory is None):
            raise ValueError("pass exactly one of make_batch / make_batch_factory")
        if make_batch_factory is None and num_workers > 1:
            raise ValueError(
                "num_workers > 1 with a single shared make_batch races on "
                "its rng/index state; use make_batch_factory"
            )
        self.device_put = device_put
        self.q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self.workers = [
            threading.Thread(
                target=self._worker,
                args=(make_batch if make_batch is not None else make_batch_factory(i),),
                daemon=True,
            )
            for i in range(num_workers)
        ]
        for w in self.workers:
            w.start()

    def _worker(self, make_batch):
        while not self._stop.is_set():
            batch = make_batch()
            while not self._stop.is_set():
                try:
                    self.q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        batch = self.q.get()
        if self.device_put is not None:
            batch = self.device_put(batch)
        return batch

    def close(self):
        self._stop.set()


def compact_feed(batch: dict, pixel_means, drop=("depth",)) -> dict:
    """Compress a host minibatch for the tunnel: image → uint8 (the
    mean is re-added so the range is [0, 255]; the train step converts
    back on device, engine/train.decompress_feed), label → uint8
    (num_classes < 256), and transfer-only-dead keys dropped (depth is
    unused by the COLOR+2D flagship step).

    Motivation: host→device moves over the axon tunnel are the train
    step's bandwidth bound AND the tunnel PJRT client leaks host
    memory proportional to transfer volume (train_chunked.sh header) —
    a 4× smaller image plus dropping float32 depth cuts ~12.5 MB/iter
    to ~2 MB at half-scale batch 8, and linearly extends pass length
    before the leak forces a restart. The reference feeds full float32
    blobs (its queue is host-local, gt_synthesize_layer/layer.py);
    this is a tunnel-topology deviation, value-preserving to ±0.5/255
    intensity (quantization noise ≪ the ±8σ pool augmentation noise).
    """
    out = {}
    pm = np.asarray(pixel_means, np.float32)
    for k, v in batch.items():
        if k in drop:
            continue
        if k == "data":
            out[k] = np.clip(v + pm, 0.0, 255.0).astype(np.uint8)
        elif k == "label":
            out[k] = v.astype(np.uint8)
        else:
            out[k] = v
    return out


def make_sharded_device_put(mesh=None, replicated_keys=("gt_poses", "gt_valid")):
    """Build the device_put hook: batch-dim arrays sharded over the
    mesh 'data' axis, GT rows replicated (XLA inserts no transfer for
    already-placed arrays)."""
    import jax
    import jax.numpy as jnp

    if mesh is None:
        return lambda batch: {k: jnp.asarray(v) for k, v in batch.items()}

    from posecnn_tpu.parallel.mesh import batch_sharding, replicated

    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(batch):
        return {
            k: jax.device_put(jnp.asarray(v), rep if k in replicated_keys else bs)
            for k, v in batch.items()
        }

    return put
