"""Session settings with defaults and ranges.

Analog of the reference's 221-setting registry
(reference: src/query/settings/src/settings_default.rs). The subset here is
what the TPU engine actually consults; unknown settings raise like the
reference's UnknownSetting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

from .errors import UnknownSetting, WrongValueForSetting


@dataclass
class SettingDef:
    name: str
    default: Any
    desc: str
    range: Optional[Tuple[Any, Any]] = None


DEFAULT_SETTINGS: Dict[str, SettingDef] = {
    s.name: s for s in [
        SettingDef("max_threads", 8, "host-side parallelism for IO stages", (1, 1024)),
        SettingDef("max_block_size", 262144, "max rows per processed block", (1, 1 << 24)),
        SettingDef("max_memory_usage", 0, "query memory limit in bytes (0=unlimited)"),
        SettingDef("enable_distributed_pruning", True,
                   "shard segment pruning across the mesh (reference settings_default.rs:1470)"),
        SettingDef("hnsw_ef_search_scale", 4,
                   "ef = scale * limit for HNSW search (reference hnsw.rs:108)", (1, 64)),
        SettingDef("vector_search_mode", "auto",
                   "per-block KNN strategy: auto = exact MXU scan for blocks"
                   " up to vector_exact_scan_max_rows (faster AND exact on"
                   " TPU), hnsw = always graph search, exact = always scan"),
        SettingDef("vector_exact_scan_max_rows", 1 << 20,
                   "auto mode: blocks with fewer rows use the exact MXU scan"
                   " instead of HNSW (the 262k-row reference block cap is"
                   " far below the crossover on TPU)", (0, 1 << 40)),
        SettingDef("vector_host_scan_max_rows", 1 << 16,
                   "corpora at or below this many total rows are scored on"
                   " the host (numpy) — a device dispatch costs a full RTT,"
                   " which dwarfs small scans", (0, 1 << 40)),
        SettingDef("vector_search_bf16", True,
                   "score candidates in bfloat16 on the MXU (exact rerank keeps recall)"),
        SettingDef("enable_vector_index", True, "use HNSW indexes for KNN queries"),
        SettingDef("enable_inverted_index", True, "use inverted indexes for match()/query()"),
        SettingDef("enable_bloom_filter_index", True, "bloom-prune point predicates"),
        SettingDef("enable_range_index", True, "zone-map pruning"),
        SettingDef("timezone", "UTC", "session timezone"),
        SettingDef("sql_dialect", "databend", "SQL dialect"),
        SettingDef("query_result_cache_ttl_secs", 0, "result cache TTL (0=off)"),
        SettingDef("enable_query_profiling", False, "collect per-operator timings"),
        SettingDef("enable_distributed_execution", False,
                   "run group-by/top-n/broadcast-join through the mesh"
                   " exchange operators (reference fragmenter.rs Shuffle/"
                   "Merge/Expansive exchanges as XLA collectives)"),
        SettingDef("enable_cbo", True,
                   "cost-based optimizer: filter pushdown + DP join"
                   " reordering (reference optimizers/{cascades,hyper_dp})"),
        SettingDef("sort_spill_row_threshold", 8_000_000,
                   "rows above which ORDER BY spills sorted runs to disk "
                   "(reference sort_spill.rs); 0 disables spilling", (0, 1 << 40)),
        SettingDef("aggregate_spill_row_threshold", 8_000_000,
                   "buffered input rows above which GROUP BY hash-partitions"
                   " its input to disk and aggregates partition-by-partition"
                   " (reference spillers/inner.rs:269); 0 disables", (0, 1 << 40)),
        SettingDef("join_spill_row_threshold", 8_000_000,
                   "build-side rows above which a hash join grace-partitions"
                   " both sides to disk and joins per partition"
                   " (reference spillers/inner.rs:269); 0 disables", (0, 1 << 40)),
    ]
}


class Settings:
    def __init__(self):
        self._values: Dict[str, Any] = {}
        self._globals: Dict[str, Any] = {}

    def get(self, name: str) -> Any:
        key = name.lower()
        if key in self._values:
            return self._values[key]
        if key in self._globals:
            return self._globals[key]
        if key not in DEFAULT_SETTINGS:
            raise UnknownSetting(f"unknown setting {name!r}")
        return DEFAULT_SETTINGS[key].default

    def set(self, name: str, value: Any, is_global: bool = False) -> None:
        key = name.lower()
        if key not in DEFAULT_SETTINGS:
            raise UnknownSetting(f"unknown setting {name!r}")
        d = DEFAULT_SETTINGS[key]
        if isinstance(d.default, bool) and not isinstance(value, bool):
            value = str(value).lower() in ("1", "true", "on")
        elif isinstance(d.default, int) and not isinstance(value, bool):
            try:
                value = int(value)
            except (TypeError, ValueError):
                raise WrongValueForSetting(f"{name} expects an integer, got {value!r}")
            if d.range and not (d.range[0] <= value <= d.range[1]):
                raise WrongValueForSetting(
                    f"{name}={value} outside range {d.range}")
        (self._globals if is_global else self._values)[key] = value

    def all(self):
        out = []
        for key in sorted(DEFAULT_SETTINGS):
            d = DEFAULT_SETTINGS[key]
            out.append((key, self.get(key), d.default, d.desc))
        return out
