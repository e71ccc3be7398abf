"""Bucketed batching data loader (host).

Replaces the PyG DataLoader + __inc__ collation (ref
scripts/train_diffusion_decomp.py:121-133) with: featurize on worker threads,
group samples by bucket key so every batch pads into one of a few fixed
shapes, prefetch ahead of the device loop.
"""

from __future__ import annotations

import queue
import threading
from collections import Counter, deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from decompdiff_tpu.data.collate import (
    GROUP_BUCKETS, LIGAND_BUCKETS, PROTEIN_BUCKETS, bucket_key, collate)


class BucketedLoader:
    """Infinite iterator of ComplexBatch (role: ref utils/train.py:25-31
    inf_iterator + DataLoader)."""

    def __init__(self, dataset, indices: Sequence[int], batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 num_threads: int = 2, prefetch: int = 4,
                 protein_buckets=PROTEIN_BUCKETS,
                 ligand_buckets=LIGAND_BUCKETS,
                 group_buckets=GROUP_BUCKETS,
                 infinite: bool = True,
                 drop_oversize: bool = True):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.num_threads = max(1, int(num_threads))
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.buckets = (protein_buckets, ligand_buckets, group_buckets)
        self.infinite = infinite
        self.drop_oversize = drop_oversize
        # featurization failures counted by exception type (the reference's
        # preprocessing logs typed fail buckets, ref preprocess_subcomplex.py
        # :245-262; a silently shrunken corpus must be observable)
        self.skip_counts: Counter = Counter()
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _record_iter(self, pool):
        """Epochs of featurized records. Featurization runs on `pool`
        (num_threads workers — numpy releases the GIL for the heavy parts),
        with a bounded in-flight window consumed in submission order so the
        record stream stays deterministic for a fixed seed."""
        depth = 2 * self.num_threads + 2
        while True:
            order = np.array(self.indices)
            if self.shuffle:
                self.rng.shuffle(order)
            ok = 0
            inflight = deque()
            it = iter(order)

            def submit_next():
                for idx in it:
                    inflight.append(pool.submit(self.dataset.__getitem__,
                                                int(idx)))
                    return
            for _ in range(depth):
                submit_next()
            while inflight:
                fut = inflight.popleft()
                submit_next()
                if self._stop.is_set():
                    return
                try:
                    rec = fut.result()
                except Exception as e:
                    # error-bucket robustness: skip bad samples, but count
                    self.skip_counts[type(e).__name__] += 1
                    continue
                ok += 1
                yield rec
            if len(order) and ok == 0:
                # every sample failed: an infinite loader would otherwise
                # spin at 100% CPU forever while the consumer blocks on an
                # empty queue with no diagnostic (mis-built store, wrong
                # featurize config, ...). Fail loudly instead; the error
                # reaches the consumer through the queue.
                raise RuntimeError(
                    'BucketedLoader: every sample in the epoch failed to '
                    f'featurize; skip counts: {dict(self.skip_counts)}')
            if not self.infinite:
                return

    def _producer(self):
        pb, lb, gb = self.buckets
        pending: dict = {}
        try:
            with ThreadPoolExecutor(
                    max_workers=self.num_threads,
                    thread_name_prefix='ddtpu-featurize') as pool:
                yield_iter = self._record_iter(pool)
                self._bucket_loop(yield_iter, pb, lb, gb, pending)
        except Exception as e:  # surface producer errors to the consumer
            self._put(e)

    def _put(self, item) -> bool:
        """Enqueue unless close() was requested; never blocks forever on a
        full queue with no consumer (returns False once stopped)."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _bucket_loop(self, records, pb, lb, gb, pending):
        # A corpus where EVERY record featurizes but is dropped as oversize
        # would spin the infinite loader forever just like the all-failed
        # epoch (_record_iter's raise) — detect it via a run of consecutive
        # oversize drops and fail loudly. Threshold is TWO epochs' worth:
        # a single-epoch threshold can false-positive across an epoch
        # boundary (a surviving record FIRST in epoch k and LAST in the
        # reshuffled epoch k+1 legally yields 2N-2 consecutive drops), while
        # a truly all-oversize corpus exceeds 2N after two epochs.
        oversize_run = 0
        for rec in records:
            if self._stop.is_set():
                return
            try:
                key = bucket_key(rec, pb, lb, gb)
            except ValueError:
                if self.drop_oversize:
                    self.skip_counts['oversize'] += 1
                    oversize_run += 1
                    if oversize_run >= 2 * max(1, len(self.indices)):
                        raise RuntimeError(
                            'BucketedLoader: two epochs of records were '
                            'dropped as oversize with none surviving '
                            '(bucket ladders too small for this corpus); '
                            f'skip counts: {dict(self.skip_counts)}')
                    continue
                raise
            oversize_run = 0
            pending.setdefault(key, []).append(rec)
            if len(pending[key]) == self.batch_size:
                batch = collate(pending.pop(key),
                                np_override=key[0], nl_override=key[1],
                                na_override=key[2])
                if not self._put(batch):
                    return
        if self._stop.is_set():
            # close() mid-stream: don't flush partial batches into a queue
            # nobody drains (the producer would block forever and leak the
            # featurize pool)
            return
        # flush partial batches at the end of a finite pass
        for key, recs in pending.items():
            if recs:
                if not self._put(collate(
                        recs, np_override=key[0], nl_override=key[1],
                        na_override=key[2])):
                    return
        self._put(None)

    def __iter__(self) -> Iterator:
        while True:
            try:
                item = self._queue.get(timeout=0.2)
            except queue.Empty:
                # After close() the producer exits WITHOUT enqueuing the None
                # sentinel (it must not block on a queue nobody drains), so a
                # blocked consumer has to notice the stop itself: drain
                # whatever was already buffered, then end.
                if self._stop.is_set():
                    return
                continue
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()
