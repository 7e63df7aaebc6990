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
    status: str = "done"  # "done" | "invalidated" | "delta" (epoch marker)


class LineageLog:
    """Append-only JSONL manifest next to the output dir.

    Replay semantics: a partition is complete iff its LAST record is a
    validated completion — an ``invalidated`` record written later (an
    incremental delta superseding the bucket) re-opens it for recompute.
    ``delta`` records are epoch markers (partition_id=-1) making delta
    application idempotent; they never mark a partition."""

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
            if rec.status == "invalidated":
                done.pop(rec.partition_id, None)
            elif rec.status == "done" and Path(rec.path).exists():
                # validate: the output file must still exist
                done[rec.partition_id] = rec
        return done

    def invalidate(self, partition_ids, delta_id: str = "") -> None:
        """Re-open partitions for recompute (incremental maintenance)."""
        self.append_many(
            PartitionRecord(partition_id=int(p), rows=0, num_bytes=0,
                            content_hash=delta_id, duration_sec=0.0,
                            path="", status="invalidated")
            for p in partition_ids
        )

    def mark_delta(self, delta_id: str) -> None:
        """Durable epoch marker: ``delta_id``'s invalidations are on disk."""
        self.append(PartitionRecord(
            partition_id=-1, rows=0, num_bytes=0, content_hash=delta_id,
            duration_sec=0.0, path="", status="delta"))

    def applied_deltas(self) -> set[str]:
        if not self.path.exists():
            return set()
        return {
            rec["content_hash"]
            for line in self.path.read_text().splitlines()
            if line.strip()
            for rec in [json.loads(line)]
            if rec.get("status") == "delta"
        }

    def append(self, rec: PartitionRecord) -> None:
        with self.path.open("a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")

    def append_many(self, recs) -> None:
        with self.path.open("a") as f:
            for rec in recs:
                f.write(json.dumps(asdict(rec)) + "\n")
