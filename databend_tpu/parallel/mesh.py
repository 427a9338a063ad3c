"""Device-mesh construction for distributed query execution.

The reference scales out with stateless query nodes exchanging Arrow Flight
streams (reference: src/query/service/src/servers/flight/v1/exchange/
exchange_manager.rs:168, schedulers/fragments/fragmenter.rs:59). The
TPU-native design replaces that data plane with a `jax.sharding.Mesh` and
XLA collectives over ICI: table shards live on mesh axis ``shard`` (the
analog of Mod-sharded segments, reference read_partitions.rs:263-290) and
query batches can additionally be split over axis ``dp``.

Collective mapping (SURVEY §2.3):
  * Merge exchange (gather-to-one)  -> per-shard top-k + all_gather + k-select
  * Broadcast exchange              -> replicated sharding spec
  * Shuffle exchange                -> all_to_all / psum_scatter
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"
DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, dp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(dp, shard)`` mesh over ``n_devices`` (default: all).

    ``dp`` splits the query batch; the remaining factor shards the corpus.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if n_devices % dp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by dp={dp}")
    shard = n_devices // dp
    arr = np.asarray(devices).reshape(dp, shard)
    return Mesh(arr, (DP_AXIS, SHARD_AXIS))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Rows of `[N, d]` corpus split over the ``shard`` axis (the analog of
    Mod-sharding table segments across query nodes)."""
    return NamedSharding(mesh, P(SHARD_AXIS, None))


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Query batch `[B, d]` split over ``dp``, replicated over ``shard``."""
    return NamedSharding(mesh, P(DP_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices owned by other jax processes
    (multi-host over DCN; reference: the multi-node cluster case)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_sharded(host_array: np.ndarray, mesh: Mesh,
                spec: P) -> jax.Array:
    """Place a host array onto the mesh under ``spec``.

    Single-process: plain ``device_put``. Multi-process (DCN) meshes:
    every process holds the SAME full host array (SPMD at the SQL level —
    each query node scanned the same shared storage), so each builds its
    addressable shards via ``make_array_from_callback``; ``device_put``
    to non-addressable shardings is not supported."""
    sh = NamedSharding(mesh, spec)
    if mesh_spans_processes(mesh):
        return jax.make_array_from_callback(
            host_array.shape, sh, lambda idx: host_array[idx])
    return jax.device_put(host_array, sh)


def shard_rows(x: np.ndarray, mesh: Mesh, pad_value: float = 1e18) -> Tuple[jax.Array, int]:
    """Place a host `[N, d]` corpus onto the mesh row-sharded.

    Pads N up to a multiple of the shard-axis size with ``pad_value`` rows
    (distance-+inf-safe, never enter a top-k). Returns (device array, n_valid).
    """
    n = x.shape[0]
    s = mesh.shape[SHARD_AXIS]
    rem = (-n) % s
    if rem:
        pad = np.full((rem, x.shape[1]), pad_value, dtype=np.asarray(x).dtype)
        x = np.concatenate([np.asarray(x), pad], axis=0)
    return put_sharded(np.asarray(x), mesh, P(SHARD_AXIS, None)), n


_DEFAULT_MESH = None


def get_default_mesh() -> Optional[Mesh]:
    """Process-wide mesh over all visible devices (None when single-device
    — distributed paths fall back to the host operators)."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        devs = jax.devices()
        if len(devs) < 2:
            return None
        _DEFAULT_MESH = make_mesh(len(devs))
    return _DEFAULT_MESH
