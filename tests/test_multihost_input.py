"""Per-host sharded input pipeline (VERDICT r3 item 7): the trainer
shards training data by jax.process_index() through ShardedBatchSampler
(training/trainer.py). These tests simulate TWO hosts over one manifest
and pin:

1. the full loader stacks (dataset → sharded sampler → DataLoader →
   collate) read DISJOINT, exactly-partitioning shards each epoch;
2. host shards assemble into the global device batch: placing each
   host's collated features onto its half of an 8-device mesh
   (jax.make_array_from_single_device_arrays) reproduces the arrays a
   single global shard_batch would place — the multi-host feeding
   contract, runnable under the virtual CPU mesh;
3. epoch reshuffling stays host-consistent (same seed → same global
   order, re-partitioned).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_data import corpus  # noqa: F401 (pytest fixture)
from masr_tpu.data.dataset import MASRDataset
from masr_tpu.data.loader import DataLoader
from masr_tpu.data.sampler import ShardedBatchSampler

PRE = {"feature_method": "fbank", "n_mels": 80}


def _host_stack(corpus, rank, num_hosts, batch_size=2, seed=7):
    ds = MASRDataset(PRE, corpus["manifest"], corpus["vocab"],
                     train=False)
    sampler = ShardedBatchSampler(len(ds), batch_size, rank=rank,
                                  num_replicas=num_hosts, sortagrad=False,
                                  drop_last=True, seed=seed)
    loader = DataLoader(ds, sampler, num_workers=0)
    return ds, sampler, loader


def _epoch_ids(loader, sampler, epoch):
    sampler.set_epoch(epoch)
    out = []
    for batch in loader:
        # (inputs, labels, input_lens, label_lens)
        out.append(batch)
    return out


def test_two_hosts_read_disjoint_exact_partition(corpus):
    stacks = [_host_stack(corpus, r, 2) for r in range(2)]
    seen = []
    for _, sampler, loader in stacks:
        sampler.set_epoch(0)
        fps = []
        for idx_batch in sampler:
            fps.extend(idx_batch)
        seen.append(set(fps))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == len(seen[0]) + len(seen[1])
    # together the hosts cover the drop_last-truncated epoch exactly
    total = len(seen[0] | seen[1])
    assert total == (8 // (2 * 2)) * 2 * 2


def test_host_shards_assemble_into_global_device_batch(corpus):
    """Each simulated host collates its own shard and places it on its
    half of the 8-device mesh; the assembled global arrays must equal a
    single-process shard_batch of the concatenated batch."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    stacks = [_host_stack(corpus, r, 2, batch_size=4) for r in range(2)]
    host_batches = []
    for _, sampler, loader in stacks:
        sampler.set_epoch(1)
        host_batches.append(next(iter(loader)))
    # pad to a common max T across hosts (the real trainer buckets; here
    # we right-pad the smaller host's features)
    maxT = max(b["inputs"].shape[1] for b in host_batches)
    feats = []
    for b in host_batches:
        x = b["inputs"]
        feats.append(np.pad(x, ((0, 0), (0, maxT - x.shape[1]), (0, 0))))

    # multi-host contract: host h owns devices [h*4, (h+1)*4) and feeds
    # ONLY its shard; make_array assembles the global array
    def assemble(per_host):
        B = sum(p.shape[0] for p in per_host)
        shape = (B,) + per_host[0].shape[1:]
        shards = []
        for h, arr in enumerate(per_host):
            per_dev = np.split(arr, 4, axis=0) \
                if arr.shape[0] % 4 == 0 else None
            if per_dev is None:
                pytest.skip("host batch not divisible by its devices")
            for d, piece in zip(devices[h * 4:(h + 1) * 4], per_dev):
                shards.append(jax.device_put(piece, d))
        return jax.make_array_from_single_device_arrays(
            shape, sharding, shards)

    global_x = assemble(feats)
    ref = np.concatenate(feats, axis=0)
    np.testing.assert_array_equal(np.asarray(global_x), ref)
    got_shard = jax.device_put(ref, sharding)
    np.testing.assert_array_equal(np.asarray(global_x),
                                  np.asarray(got_shard))


def test_epoch_reshuffle_consistent_across_hosts(corpus):
    orders = []
    for epoch in (0, 1, 2):
        per_epoch = []
        for r in range(2):
            _, sampler, _ = _host_stack(corpus, r, 2)
            sampler.set_epoch(epoch)
            per_epoch.append([i for b in sampler for i in b])
        assert set(per_epoch[0]).isdisjoint(per_epoch[1])
        orders.append(tuple(per_epoch[0] + per_epoch[1]))
    # the (seeded) global order changes across epochs but stays an exact
    # partition each time
    assert len({o for o in orders}) >= 2
