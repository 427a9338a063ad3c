"""databend_tpu — a TPU-native SQL warehouse with first-class vector search.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
databendlabs/databend (see SURVEY.md): columnar tables over immutable
snapshot storage, SQL front end, block/predicate pruning, HNSW vector
indexes, BM25 full-text search, and distributed top-k serving over a TPU
mesh. The compute path is jitted XLA programs (distance matmuls on the MXU,
k-select, batched graph traversal); the host side orchestrates IO, planning
and metadata.
"""

from .version import __version__

__all__ = ["__version__", "SessionContext"]


def __getattr__(name):
    # Lazy import: keep `import databend_tpu` light (no jax init) until used.
    if name == "SessionContext":
        from .service.session import SessionContext
        return SessionContext
    raise AttributeError(name)
