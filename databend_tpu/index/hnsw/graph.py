"""HNSW graph container + serialization.

TPU-native re-design of the reference's HNSW storage
(reference: src/query/storages/common/index/src/hnsw_index/{graph_layers.rs,
graph_links.rs}). The reference bitpacks link lists for CPU cache walks;
on TPU the graph IS the layout the kernels gather from: dense padded
``[n, m]`` int32 neighbor arrays per level, -1 padding — one
``jnp.take`` per beam expansion, no decode step.

Level semantics match the reference (hnsw.rs:53-59): level 0 keeps
``m0 = 2*m`` links, upper levels ``m``; point levels are geometric with
factor ``1/ln(m)`` (graph_layers_builder.rs:242-249).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class HnswGraph:
    """links[0] is [n, m0]; links[l>0] are [n_l, m] over ``level_ids[l]``
    (global point ids of that level's members, sorted ascending). All link
    entries are GLOBAL point ids, -1 = padding."""

    metric: str  # cosine | l2 | ip | l1 (cosine vectors are pre-normalized)
    m: int
    ef_construct: int
    entry_points: np.ndarray  # [e] global ids, highest level first
    links: List[np.ndarray] = field(default_factory=list)
    level_ids: List[Optional[np.ndarray]] = field(default_factory=list)  # None for level 0

    @property
    def num_points(self) -> int:
        return self.links[0].shape[0]

    @property
    def num_levels(self) -> int:
        return len(self.links)

    @property
    def m0(self) -> int:
        return self.links[0].shape[1]

    def nbytes(self) -> int:
        return sum(l.nbytes for l in self.links) + sum(
            i.nbytes for i in self.level_ids if i is not None)

    # ------------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        payload = {
            "meta": np.array([self.m, self.ef_construct, self.num_levels],
                             dtype=np.int64),
            "metric": np.frombuffer(self.metric.encode(), dtype=np.uint8),
            "entry_points": self.entry_points.astype(np.int32),
        }
        for l, arr in enumerate(self.links):
            payload[f"links_{l}"] = arr.astype(np.int32)
        for l, ids in enumerate(self.level_ids):
            if ids is not None:
                payload[f"ids_{l}"] = ids.astype(np.int32)
        np.savez_compressed(buf, **payload)
        return buf.getvalue()

    @staticmethod
    def from_bytes(data: bytes) -> "HnswGraph":
        z = np.load(io.BytesIO(data))
        m, ef_construct, num_levels = z["meta"].tolist()
        metric = z["metric"].tobytes().decode()
        links = [z[f"links_{l}"] for l in range(num_levels)]
        level_ids: List[Optional[np.ndarray]] = [None] * num_levels
        for l in range(1, num_levels):
            if f"ids_{l}" in z:
                level_ids[l] = z[f"ids_{l}"]
        return HnswGraph(metric, int(m), int(ef_construct),
                         z["entry_points"], links, level_ids)

    def save(self, path: str) -> int:
        from ...storage.operator import OPERATOR
        data = self.to_bytes()
        OPERATOR.write_bytes(path, data)
        return len(data)

    @staticmethod
    def load(path: str) -> "HnswGraph":
        from ...storage.operator import OPERATOR
        return HnswGraph.from_bytes(OPERATOR.read_bytes(path))
