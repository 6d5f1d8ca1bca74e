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

from collections import deque
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
        """Yield collated numpy batches with ``host_prefetch`` whole
        batches building CONCURRENTLY (round 1 built batches one at a
        time — parallel within a batch only — so prefetch rarely held
        more than one batch in flight; the reference keeps 8 workers x
        prefetch_factor 16 across batches, data_loader.py:103-105).

        Two pools: ``sample_pool`` does the real work (fetch/decode/
        resize; I/O releases the GIL), ``batch_pool`` threads only
        orchestrate + collate — separate pools so a batch waiting on its
        samples can never deadlock the samples' own workers."""
        indices = self._epoch_indices()
        nb = len(self)
        sample_pool = ThreadPoolExecutor(max_workers=self.num_workers)
        batch_pool = ThreadPoolExecutor(
            max_workers=max(2, min(self.host_prefetch, 8))
        )

        def build_batch(b: int):
            rows = indices[b * self.batch_size : (b + 1) * self.batch_size]
            futures = [
                sample_pool.submit(self.dataset.__getitem__, i) for i in rows
            ]
            samples = [f.result() for f in futures]
            captions = [s[0] for s in samples]
            images = np.stack([s[1] for s in samples])
            batch = dict(self.tokenizer(captions))
            batch["image"] = images
            return batch

        window: deque = deque()
        next_b = 0
        try:
            while next_b < min(self.host_prefetch, nb):
                window.append(batch_pool.submit(build_batch, next_b))
                next_b += 1
            while window:
                batch = window.popleft().result()
                if next_b < nb:
                    window.append(batch_pool.submit(build_batch, next_b))
                    next_b += 1
                yield batch
        finally:
            batch_pool.shutdown(wait=False, cancel_futures=True)
            sample_pool.shutdown(wait=False, cancel_futures=True)

    def _to_device(self, host_batch):
        if self._sharding is None:
            return jax.device_put(host_batch)
        if jax.process_count() > 1:
            # Multi-host: each process builds only its addressable shard
            # (batch_size = global / process_count here); assemble the
            # global array from per-process local data — the supported
            # construction for shardings spanning non-addressable devices
            # (jax.device_put of distinct host data is not).
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    self._sharding, np.asarray(x)
                ),
                host_batch,
            )
        return jax.device_put(host_batch, self._sharding)

    def __iter__(self):
        """Device-resident batch iterator (double-buffered transfers)."""
        self.epoch += 1
        pending: list = []
        for host_batch in self._host_batches():
            pending.append(self._to_device(host_batch))
            if len(pending) > self.device_prefetch:
                yield pending.pop(0)
        yield from pending
