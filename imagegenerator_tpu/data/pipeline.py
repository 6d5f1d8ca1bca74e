"""Prefetching device loader: host threads -> collated numpy -> sharded
device-resident batches.

Replaces the reference's DataLoader(num_workers=8, prefetch_factor=16) +
MpDeviceLoader(prefetch 8/4) stack (``/root/reference/data_loader.py:
97-106``, ``train.py:126-132``) with a thread-pool fetch/decode pipeline
and a double-buffered ``jax.device_put``:

* worker threads pull sample indices, fetch+decode+resize images, and
  fill per-batch slots (I/O-bound GCS/disk reads release the GIL);
* a collator thread tokenizes captions and assembles fixed-shape numpy
  batches;
* the consumer-facing iterator device_puts batches with the mesh
  sharding ``P('data')`` so each host transfer lands directly on the
  right devices, ``device_prefetch`` batches ahead of compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DataLoader:
    def __init__(
        self,
        dataset,
        tokenizer,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        host_prefetch: int = 8,
        device_prefetch: int = 2,
        mesh: Mesh | None = None,
    ):
        if not drop_last:
            raise NotImplementedError(
                "fixed-shape batches require drop_last (XLA static shapes)"
            )
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.host_prefetch = host_prefetch
        self.device_prefetch = device_prefetch
        self.mesh = mesh
        self._sharding = (
            NamedSharding(mesh, P("data")) if mesh is not None else None
        )
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(n)
        return np.arange(n)

    def _host_batches(self):
        """Yield collated numpy batches, produced by a worker pool that
        keeps ``host_prefetch`` batches in flight."""
        indices = self._epoch_indices()
        nb = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.host_prefetch)
        stop = threading.Event()

        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def build_batch(b: int):
            rows = indices[b * self.batch_size : (b + 1) * self.batch_size]
            samples = list(pool.map(self.dataset.__getitem__, rows))
            captions = [s[0] for s in samples]
            images = np.stack([s[1] for s in samples])
            batch = dict(self.tokenizer(captions))
            batch["image"] = images
            return batch

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    out_q.put(build_batch(b))
            finally:
                out_q.put(None)
                pool.shutdown(wait=False)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def __iter__(self):
        """Device-resident batch iterator (double-buffered transfers)."""
        self.epoch += 1
        pending: list = []
        for host_batch in self._host_batches():
            if self._sharding is not None:
                dev = jax.device_put(host_batch, self._sharding)
            else:
                dev = jax.device_put(host_batch)
            pending.append(dev)
            if len(pending) > self.device_prefetch:
                yield pending.pop(0)
        yield from pending
