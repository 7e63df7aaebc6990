"""Engine configuration: dataclass defaults + ``FSR_*`` env overrides.

Mirrors the reference's YAML config + ``FEATHERSTORE_*`` env override scheme
(pkg/config/config.go:71-96) in idiomatic-Python form; used by CLI entry
points and ``ray job submit`` payloads.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    # storage (reference defaults: pkg/config/config.go:105-115)
    compression: str = "zstd"
    row_group_size: int = 131_072  # shipped config.yaml:19
    # partitioning
    num_buckets: int = 64
    target_partition_bytes: int = 256 * 1024 * 1024
    # actor pools
    max_pool_size: int = 8
    # window defaults
    rolling_window_hours: int = 24
    session_gap_minutes: int = 30

    @classmethod
    def from_env(cls, prefix: str = "FSR_") -> "EngineConfig":
        """Build from defaults, overriding any field from ``FSR_<UPPER>``."""
        kwargs = {}
        for f in fields(cls):
            raw = os.environ.get(prefix + f.name.upper())
            if raw is None:
                continue
            kwargs[f.name] = int(raw) if f.type in ("int", int) else raw
        return cls(**kwargs)
