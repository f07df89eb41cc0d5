"""Prefetching data loader (replaces torch.utils.data.DataLoader in the
reference's trainer, trainer.py:106-120).

Worker threads featurize utterances concurrently (the hot work — FFT and
matmuls — is numpy, which releases the GIL) and a bounded queue keeps
`prefetch` collated batches ready, so the TPU step never waits on the host.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from masr_tpu.data.collate import collate_fn


class DataLoader(object):
    def __init__(self, dataset, batch_sampler, num_workers=4, prefetch=4,
                 feature_bucket=16, label_bucket=8, collate=None, seed=0):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate = collate or (lambda items, rng: collate_fn(
            items, feature_bucket=feature_bucket, label_bucket=label_bucket,
            rng=rng))
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for batch_idx in self.batch_sampler:
                        if stop.is_set():
                            break
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        q.put(self.collate(items, self._rng))
                except Exception as e:  # surface worker errors to the consumer
                    q.put(e)
                finally:
                    q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
