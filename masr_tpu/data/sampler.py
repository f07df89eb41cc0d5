"""Batch samplers (parity: masr/data_utils/sampler.py).

`BatchShuffleSampler` reproduces the sortagrad-friendly batch shuffle
(_batch_shuffle, sampler.py:14-40): the manifest is duration-sorted, so
shuffling whole batches (with a random epoch-seeded shift) keeps batches
length-homogeneous while decorrelating order. `ShardedBatchSampler` is the
multi-host variant: each data-parallel host takes a rank-strided slice, the
TPU-native replacement for DSElasticDistributedSampler (sampler.py:113-185).
"""
import numpy as np


class BatchShuffleSampler(object):
    def __init__(self, dataset_size, batch_size, shuffle=True, drop_last=True,
                 sortagrad=True, seed=0):
        self.size = dataset_size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sortagrad = sortagrad
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        indices = np.arange(self.size)
        # epoch 0 with sortagrad: keep ascending-duration order (curriculum)
        if self.shuffle and not (self.sortagrad and self.epoch == 0):
            rng = np.random.RandomState(self.seed + self.epoch)
            shift = rng.randint(0, self.batch_size)
            batches = [indices[i:i + self.batch_size]
                       for i in range(shift, len(indices) - self.batch_size + 1,
                                      self.batch_size)]
            rng.shuffle(batches)
            head = indices[:shift]
            tail = indices[shift + len(batches) * self.batch_size:]
            indices = np.concatenate([head] + batches + [tail]) if len(batches) \
                else indices
        return indices

    def __iter__(self):
        indices = self._indices()
        for i in range(0, len(indices), self.batch_size):
            batch = indices[i:i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                break
            yield list(map(int, batch))

    def __len__(self):
        if self.drop_last:
            return self.size // self.batch_size
        return (self.size + self.batch_size - 1) // self.batch_size


class ShardedBatchSampler(BatchShuffleSampler):
    """Rank-strided sharding for multi-host data parallelism: every host
    draws the same shuffled order (same seed+epoch) and takes
    indices[rank::num_replicas] before batching (parity: sampler.py:157)."""

    def __init__(self, dataset_size, batch_size, rank=0, num_replicas=1, **kw):
        super().__init__(dataset_size, batch_size, **kw)
        self.rank = rank
        self.num_replicas = num_replicas

    def __iter__(self):
        indices = self._indices()[self.rank::self.num_replicas]
        for i in range(0, len(indices), self.batch_size):
            batch = indices[i:i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                break
            yield list(map(int, batch))

    def __len__(self):
        per_rank = self.size // self.num_replicas
        if self.drop_last:
            return per_rank // self.batch_size
        return (per_rank + self.batch_size - 1) // self.batch_size
