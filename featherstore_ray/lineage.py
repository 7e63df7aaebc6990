"""Per-partition lineage records (JSONL manifest) for resumable runs.

The reference logs+skips failed reads (pkg/storage/parquet/parquet.go:380-387)
— silently lossy. We do the opposite: every output partition gets a lineage
record (partition id, rows, bytes, content hash, wall time) and a run resumes
by SKIPPING partitions whose records validate, recomputing the rest. Content
is a pure function of (input, partition id) — deterministic replay.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path


@dataclass
class PartitionRecord:
    partition_id: int
    rows: int
    num_bytes: int
    content_hash: str
    duration_sec: float
    path: str


class LineageLog:
    """Append-only JSONL manifest next to the output dir."""

    def __init__(self, out_dir: str | Path):
        self.path = Path(out_dir) / "_lineage.jsonl"

    def completed(self) -> dict[int, PartitionRecord]:
        done: dict[int, PartitionRecord] = {}
        if not self.path.exists():
            return done
        for line in self.path.read_text().splitlines():
            if not line.strip():
                continue
            rec = PartitionRecord(**json.loads(line))
            # validate: the output file must still exist
            if Path(rec.path).exists():
                done[rec.partition_id] = rec
        return done

    def append(self, rec: PartitionRecord) -> None:
        with self.path.open("a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")

    def append_many(self, recs) -> None:
        with self.path.open("a") as f:
            for rec in recs:
                f.write(json.dumps(asdict(rec)) + "\n")
