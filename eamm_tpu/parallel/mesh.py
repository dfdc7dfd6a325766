"""Device mesh + sharding helpers.

The reference's only parallelism is single-process DataParallel with a
thread-based synchronized BatchNorm (ref:train.py:53-63, ref:sync_batchnorm/).
The TPU-native equivalent is a named ``jax.sharding.Mesh`` with the batch
(identities / clips / frames) sharded over the ``data`` axis:

- gradients: averaged automatically when the loss reduces over the sharded
  batch under ``jit`` (XLA inserts the ICI all-reduce),
- batch-norm statistics: the BN mean/var reductions over the sharded batch
  axis likewise become cross-chip collectives — this *is* SyncBN,
- the per-frame generator in inference is embarrassingly parallel, so clip
  rendering shards the frame axis the same way.

Multi-host DCN is handled transparently by jax.distributed initialization;
nothing here changes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def host_cpu_mesh(n_devices: int, axis_name: str = "data") -> Mesh:
    """Mesh over host CPU devices (tests / dry runs).  Requires
    ``--xla_force_host_platform_device_count=<n>`` to have been set."""
    cpus = jax.devices("cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"need {n_devices} cpu devices, have {len(cpus)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count")
    return Mesh(np.asarray(cpus[:n_devices]), (axis_name,))


def make_mesh_for_batch(batch_size: int, devices=None,
                        axis_name: str = "data") -> Mesh:
    """1-D mesh over the largest device prefix that divides batch_size."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(tree, sharding):
    if jax.process_count() > 1:
        # multi-host: each process holds its own (disjoint) local batch —
        # DataLoader(shard=(process_index, process_count)) — and the global
        # array is assembled from the per-process shards over DCN
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    return _put(tree, batch_sharding(mesh, axis_name))


def shard_stacked_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Device-put a [K, B, ...] stack of K batches (multi-step dispatch):
    the scan axis K stays whole, the batch axis shards over the mesh."""
    return _put(tree, NamedSharding(mesh, P(None, axis_name)))


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree across every device of the mesh, multi-host
    safe: under ``jax.distributed`` each process contributes its identical
    full copy (model state is computed identically on every host from the
    same seed — the reference's DataParallel broadcast, done by
    construction)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
