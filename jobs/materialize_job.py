#!/usr/bin/env python
"""Materialization job entrypoint for ``ray job submit``.

Runs the flagship point-in-time + window feature suite over a tokenized
Parquet corpus and materializes the result as checkpointed partitioned
Parquet with per-partition lineage (resumable: re-submitting the same job
skips completed partitions and replays only the missing ones).

Usage (cluster):
    ray job submit -- python jobs/materialize_job.py \
        --input /data/tokens --output /data/features --num-buckets 4096

Usage (local smoke):
    python jobs/materialize_job.py --rows 100000 --output /tmp/fsr_job_out

Configuration also honors FSR_* env overrides (featherstore_ray.config).
The script owns its Ray session (guarded init; the driver-contract module
__ray_entry__.py never does).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="tokens parquet dir (doc_id/tokens/n_tok/source)")
    p.add_argument("--rows", type=int, default=0,
                   help="generate a deterministic corpus of N rows instead of --input")
    p.add_argument("--output", required=True)
    p.add_argument("--num-buckets", type=int, default=0,
                   help="output partitions (0 = auto from input size)")
    p.add_argument("--address", default="local")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=args.address,
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from featherstore_ray.config import EngineConfig
    from featherstore_ray.partition import choose_num_buckets
    from featherstore_ray.pipelines.materialize import materialize
    from featherstore_ray.pipelines.tokens_features import derive_doc_events
    from featherstore_ray.pipelines.feature_suite import _window_kernel
    from featherstore_ray.sources.tokens import tokens_parquet

    cfg = EngineConfig.from_env()
    if args.rows:
        input_dir = tokens_parquet(args.rows)
    elif args.input:
        input_dir = args.input
    else:
        p.error("one of --input / --rows is required")

    tokens = ray.data.read_parquet(input_dir)
    events = derive_doc_events(tokens)
    nb = args.num_buckets or choose_num_buckets(
        tokens, target_partition_bytes=cfg.target_partition_bytes
    )

    from datetime import timedelta

    wk = _window_kernel(
        "doc_id", "ts", "value", "seq_hash",
        rolling_window=timedelta(hours=cfg.rolling_window_hours),
        session_gap=timedelta(minutes=cfg.session_gap_minutes),
    )

    t0 = time.monotonic()
    recs = materialize(
        events,
        args.output,
        entity_col="doc_id",
        kernel=wk,
        sort_cols=["doc_id", "ts", "seq_hash"],
        num_buckets=nb,
        compression=cfg.compression,
    )
    wall = time.monotonic() - t0
    done_rows = sum(r.rows for r in recs)
    print(json.dumps({
        "written_partitions": len(recs),
        "skipped_partitions": nb - len(recs),
        "rows": done_rows,
        "sec": round(wall, 2),
        "rows_per_sec": round(done_rows / max(wall, 1e-9), 1),
        "output": args.output,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
