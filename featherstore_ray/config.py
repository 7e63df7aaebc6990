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

    @classmethod
    def load(cls, path: str | None = None, prefix: str = "FSR_") -> "EngineConfig":
        """Load with the reference's precedence (pkg/config/config.go:71-96):
        defaults < config file < environment. ``path=None`` checks
        ``$FSR_CONFIG`` then skips the file layer. The file is YAML; when
        PyYAML is absent a flat ``key: value`` subset is parsed instead
        (nested YAML then raises so a half-read config can't ship)."""
        path = path or os.environ.get(prefix + "CONFIG")
        kwargs: dict = {}
        if path:
            data = _read_config_file(path)
            known = {f.name: f for f in fields(cls)}
            for k, v in data.items():
                f = known.get(str(k))
                if f is None:
                    raise ValueError(f"unknown config key {k!r} in {path}")
                kwargs[f.name] = int(v) if f.type in ("int", int) else str(v)
        for f in fields(cls):
            raw = os.environ.get(prefix + f.name.upper())
            if raw is not None:
                kwargs[f.name] = int(raw) if f.type in ("int", int) else raw
        return cls(**kwargs)


def _read_config_file(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        import yaml  # ray[data] ships pyyaml; guarded anyway

        data = yaml.safe_load(text) or {}
        if not isinstance(data, dict):
            raise ValueError(f"config file {path} must be a mapping")
        return data
    except ImportError:
        data = {}
        for ln in text.splitlines():
            ln = ln.split("#", 1)[0].strip()
            if not ln:
                continue
            if ":" not in ln or ln.endswith(":"):
                raise ValueError(
                    f"config line {ln!r} needs PyYAML (flat 'key: value' "
                    "fallback parser only)")
            k, v = ln.split(":", 1)
            data[k.strip()] = v.strip()
        return data
