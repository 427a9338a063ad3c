from .graph import HnswGraph
from .build import build_hnsw
from .search import hnsw_search

__all__ = ["HnswGraph", "build_hnsw", "hnsw_search"]
