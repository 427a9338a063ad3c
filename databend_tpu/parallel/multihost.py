"""Multi-host (DCN) cluster join: meta-service topology -> jax.distributed.

The reference builds its per-query node list from the meta service
(reference: src/query/service/src/clusters/cluster.rs:83,620 —
ClusterDiscovery registers/heartbeats nodes and every query plans against
the discovered list; exchange_manager.rs:168 then opens Flight channels).
The TPU-native analog: query processes register in the same meta KV, and
the *registered topology* elects the jax.distributed coordinator and
assigns process ids — after ``join_cluster_mesh`` the default mesh spans
every process's devices and the existing exchange programs (psum merge,
ordered top-n, shuffle) run their collectives over DCN unchanged.

SPMD at the SQL level: each process executes the same statement; scans
read the same shared storage, so host-side states agree and the mesh
programs see identical replicated inputs.
"""

from __future__ import annotations

import time
from typing import Optional

from .mesh import make_mesh


def join_cluster_mesh(meta, my_node_id: str, n_expected: int,
                      cluster_id: str = "default",
                      timeout: float = 60.0,
                      local_device_count: Optional[int] = None):
    """Wait for ``n_expected`` registered query nodes, join the
    jax.distributed cluster they define, and install the global mesh.

    Coordinator election and process ids come from the meta registry:
    nodes sort by node_id (every process reads the same list, so all
    agree); the first node's ``address`` is the coordinator endpoint.
    Returns (mesh, process_id).
    """
    from ..meta.cluster import ClusterDiscovery
    disc = ClusterDiscovery(meta, cluster_id=cluster_id)
    deadline = time.time() + timeout
    nodes = []
    while time.time() < deadline:
        nodes = disc.list_nodes()
        if len(nodes) >= n_expected:
            break
        time.sleep(0.05)
    if len(nodes) < n_expected:
        raise TimeoutError(
            f"only {len(nodes)}/{n_expected} query nodes registered")
    nodes = nodes[:n_expected]
    ids = [n.node_id for n in nodes]
    if my_node_id not in ids:
        raise ValueError(f"local node {my_node_id!r} not in registry")
    process_id = ids.index(my_node_id)
    coordinator = nodes[0].address
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=len(nodes),
                               process_id=process_id,
                               local_device_ids=None)
    mesh = make_mesh(jax.device_count())
    set_default_mesh(mesh)
    return mesh, process_id


def set_default_mesh(mesh) -> None:
    """Install ``mesh`` as the process-wide default the distributed
    executor paths pick up (parallel/mesh.get_default_mesh)."""
    from . import mesh as _m
    _m._DEFAULT_MESH = mesh
