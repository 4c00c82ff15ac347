"""Host data loading: per-host sharded infinite sampler + threaded prefetching
loader with device transfer.

Reference: ``vision_base/data/dataloader/`` — ``TrainingSampler``
(detectron2-style infinite stream, rank-sharded ``indices[rank::world]``,
``distributed_sampler.py:6-56``) and ``build_dataloader`` (torch DataLoader,
drop_last=True, ``dataloader_builder.py:5-17``).

TPU-native design: worker THREADS (cv2/numpy release the GIL for the heavy
ops) feed a bounded queue; batches are collated then device_put asynchronously
so step N+1's H2D overlaps step N's compute — replacing torch's worker
processes + pinned-memory pipeline (SURVEY.md §7 hard-part 8).
"""
from __future__ import annotations

import itertools
import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from ..utils.builder import build
from ..utils.keys import encode_batch
from .datasets.dataset_utils import collate_fn


class TrainingSampler:
    """Infinite stream of dataset indices, sharded ``indices[rank::world]``
    with an epoch-seeded shuffle (reference ``distributed_sampler.py:6-56``)."""

    def __init__(self, size: int, shuffle: bool = True,
                 seed: Optional[int] = None, rank: int = 0, world_size: int = 1):
        self._size = size
        self._shuffle = shuffle
        self._seed = int(seed) if seed is not None else 2 ** 31
        self._rank = rank
        self._world_size = world_size

    def __iter__(self) -> Iterator[int]:
        start = self._rank
        yield from itertools.islice(
            self._infinite_indices(), start, None, self._world_size)

    def _infinite_indices(self) -> Iterator[int]:
        rng = np.random.RandomState(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)


class InferenceSampler:
    """One sequential pass (used by eval hooks)."""

    def __init__(self, size: int):
        self._size = size

    def __iter__(self):
        return iter(range(self._size))

    def __len__(self):
        return self._size


class Dataloader:
    """Threaded map-style loader.

    ``iter(loader)`` yields collated, string-keyed numpy batches. Set
    ``num_workers=0`` for in-line loading (tests / determinism).
    """

    def __init__(self, dataset, batch_size: int, sampler,
                 collate: Callable = collate_fn, num_workers: int = 4,
                 drop_last: bool = True, prefetch: int = 4,
                 infinite: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.collate = collate
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = (infinite if infinite is not None
                         else isinstance(sampler, TrainingSampler))

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> Iterator[Sequence[int]]:
        it = iter(self.sampler)
        while True:
            idxs = list(itertools.islice(it, self.batch_size))
            if not idxs:
                return
            if len(idxs) < self.batch_size and self.drop_last:
                return
            yield idxs

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.num_workers == 0:
            for idxs in self._index_batches():
                yield encode_batch(self.collate([self.dataset[i] for i in idxs]))
            return
        yield from self._threaded_iter()

    def _threaded_iter(self):
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        batch_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        SENTINEL = object()

        index_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)

        def q_put(q, item):
            """Blocking put that aborts when the consumer stopped (threads
            otherwise block forever on a full queue and die only at abrupt
            daemon teardown — observed as cv2's terminate() on exit)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def q_get(q):
            while not stop.is_set():
                try:
                    return q.get(timeout=0.1)
                except queue.Empty:
                    continue
            return SENTINEL

        def feeder():
            try:
                for batch_no, idxs in enumerate(self._index_batches()):
                    for pos, i in enumerate(idxs):
                        if not q_put(index_q, (batch_no, pos, i)):
                            return
                q_put(index_q, SENTINEL)
            except Exception:  # pragma: no cover
                q_put(index_q, SENTINEL)

        def worker():
            while not stop.is_set():
                item = q_get(index_q)
                if item is SENTINEL:
                    q_put(index_q, SENTINEL)  # propagate to other workers
                    q_put(sample_q, SENTINEL)
                    return
                batch_no, pos, i = item
                try:
                    q_put(sample_q, (batch_no, pos, self.dataset[i]))
                except Exception as e:  # surface dataset errors to the consumer
                    q_put(sample_q, (batch_no, pos, e))

        def assembler():
            pending: Dict[int, list] = {}
            next_batch = 0
            finished_workers = 0
            while not stop.is_set():
                item = q_get(sample_q)
                if item is SENTINEL:
                    finished_workers += 1
                    if stop.is_set() or finished_workers == self.num_workers:
                        q_put(batch_q, SENTINEL)
                        return
                    continue
                batch_no, pos, sample = item
                if isinstance(sample, Exception):
                    q_put(batch_q, sample)
                    return
                pending.setdefault(batch_no, [None] * self.batch_size)[pos] = sample
                while (next_batch in pending
                       and all(s is not None for s in pending[next_batch])):
                    samples = pending.pop(next_batch)
                    q_put(batch_q, encode_batch(self.collate(samples)))
                    next_batch += 1

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        threads.append(threading.Thread(target=assembler, daemon=True))
        for t in threads:
            t.start()

        try:
            while True:
                item = batch_q.get()
                if item is SENTINEL:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=2.0)


def build_dataloader(dataset, num_workers: int = 4, batch_size: int = 8,
                     collate_fn: Callable = collate_fn, local_rank: int = -1,
                     world_size: int = 1, sampler_cfg: Optional[Dict] = None,
                     **kwargs) -> Dataloader:
    """Config-facing factory (reference ``dataloader_builder.py:5-17``)."""
    sampler_cfg = dict(
        sampler_cfg
        or dict(name="fsnet_tpu.data.dataloader.TrainingSampler", shuffle=True))
    sampler = build(size=len(dataset),
                    rank=max(local_rank, 0), world_size=max(world_size, 1),
                    **sampler_cfg)
    return Dataloader(dataset, batch_size=batch_size, sampler=sampler,
                      collate=collate_fn, num_workers=num_workers,
                      drop_last=True)


def device_prefetch(iterator: Iterator, mesh=None, size: int = 2):
    """Wrap a host batch iterator with async device transfer: keeps ``size``
    batches in flight on device (sharded over the mesh 'data' axis when a mesh
    is given) so H2D overlaps compute."""
    import jax
    from ..parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sharding)

    it = iter(iterator)
    buf = []
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for nxt in it:
        out = buf.pop(0)
        buf.append(put(nxt))
        yield out
    while buf:
        yield buf.pop(0)
