"""Host-side batching with background prefetch.

Replaces torch DataLoader (dataloader/data_utils.py:25-35): seeded shuffling,
drop-last batching, a collater, and an N-deep background prefetch thread that
overlaps wav decode/resample with device compute (the reference used 2 worker
processes; decode here is cheap numpy, so threads suffice and avoid fork
overhead under JAX).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from dl_speech_enhancement_tpu.data.collate import CollaterAudio
from dl_speech_enhancement_tpu.data.dataset import random_split


class DataLoader:
    def __init__(self, dataset, batch_size: int, collate_fn, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            items = [self.dataset[int(i)] for i in sel]
            out = self.collate_fn(items)
            if out is not None:
                yield out

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer is gone —
            # otherwise every abandoned iterator (early epoch break) leaks a
            # thread blocked on q.put forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # a dataset/collate exception must reach the CONSUMER — a bare
            # sentinel would make the training loop read it as a normal
            # (truncated) end of epoch and silently train on partial data
            try:
                for batch in self._batches():
                    if not _put(batch):
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised below
                _put(e)
                return
            _put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # runs on exhaustion AND on generator close/GC (abandoned zip)
            stop.set()


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap host->device batch upload with device compute: device_put the
    next ``size`` batches ahead while the current step runs. Significant when
    the link to the chip is slow (tunneled chips here: ~40 ms per 3 MB
    batch); a no-op-cost wrapper otherwise. Pass ``sharding`` (e.g. the DP
    mesh's batch sharding) to upload straight to the mesh layout — never
    via the default device."""
    import collections
    import jax

    queue_: collections.deque = collections.deque()

    def _put(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue_.append(_put(next(it)))
    except StopIteration:
        pass
    while queue_:
        out = queue_.popleft()
        try:
            queue_.append(_put(next(it)))
        except StopIteration:
            pass
        yield out


def create_dataloader(dataset, batch_size, batch_length, seed, pair=False,
                      prefetch: int = 2):
    from dl_speech_enhancement_tpu.data.collate import CollaterAudioPair

    coll_cls = CollaterAudioPair if pair else CollaterAudio
    collater = coll_cls(batch_length, rng=np.random.default_rng(seed + 1))
    return DataLoader(dataset, batch_size, collater, seed=seed, prefetch=prefetch)


def get_dataloaders(dataset, splits=None, batch_size=8, batch_length=2 * 48000,
                    seed=82, pair=False):
    """Seeded 70/15/15 split -> 3 loaders (data_utils.py:38-51)."""
    if splits is None:
        splits = [0.7, 0.15, 0.15]
    subsets = random_split(dataset, splits, seed)
    return [
        create_dataloader(s, batch_size, batch_length, seed, pair=pair)
        for s in subsets
    ]
