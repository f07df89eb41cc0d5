"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP layer (trainer.py:522-542, SURVEY.md §5.8).

Data parallelism: a 1-D Mesh over all devices (ICI within a slice, DCN
across), params replicated, the batch sharded on its leading axis. Gradient
averaging needs no explicit collective — XLA inserts the psum when the
jitted loss reduces over a sharded batch axis.

`jax.distributed.initialize()` is called lazily for multi-host runs (env
driven, mirrors torchrun's LOCAL_RANK contract).
"""
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """Multi-host init when launched under a JAX cluster env. Single-host
    (or already-initialized) runs are a no-op."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized


def make_mesh(devices=None, axis_name="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_shardings(mesh, axis_name="data"):
    """→ (replicated_sharding, batch_sharding)."""
    return (NamedSharding(mesh, P()), NamedSharding(mesh, P(axis_name)))


def shard_batch(batch, mesh, axis_name="data"):
    """Place a host batch dict onto the mesh, sharded on the leading axis.
    Pads the batch to a multiple of the mesh size if needed (padded rows get
    zero lengths so they contribute nothing to the loss)."""
    # pad to the DATA axis size (a 2-D dp×tp mesh shards the batch on
    # "data" only; rows replicate across the model axis)
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        axis_name, mesh.devices.size)
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        B = x.shape[0]
        if B % n:
            pad = n - B % n
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


# --------------------------------------------------------------------- #
# Active-mesh registry: Pallas kernels can't be auto-partitioned by
# GSPMD, so the fused paths route through shard_map instead — but the
# flax modules that decide fused-vs-XLA don't receive the mesh as an
# argument. The trainer / serving engines register their mesh here; the
# encoder reads it to build the shard_map wrapper (conformer.py
# _fused_eligible). None ⇒ multi-device runs keep the plain XLA path.
_ACTIVE_MESH = None


def set_active_mesh(mesh):
    """Register `mesh` as the mesh fused Pallas paths shard_map over
    (pass None to clear). Returns the previous value."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return prev


def get_active_mesh():
    return _ACTIVE_MESH


def fused_route_mesh(batch):
    """Routing decision for a fused Pallas path whose leading dim is
    `batch`: → (ok, mesh). mesh=None ⇒ direct single-device call;
    ok=False ⇒ caller must keep the XLA path (multi-chip without a
    registered mesh, or batch not divisible by the mesh size)."""
    mesh = _ACTIVE_MESH
    if mesh is not None and mesh.size > 1:
        if batch % mesh.size:
            return False, None
        return True, mesh
    if jax.default_backend() == "tpu" and jax.device_count() > 1:
        return False, None
    return True, None


class active_mesh:
    """Context manager: `with active_mesh(mesh): ...`"""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        self.prev = set_active_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_active_mesh(self.prev)
