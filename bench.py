#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "feature_rows": R, "feature_rows_per_sec": ...}

``--scaling`` runs the headline suite twice in fresh subprocesses
(num_cpus=8 then 32) on the same input and reports both throughputs plus the
scaling efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _pipelines(sf_dir: str):
    """name -> zero-arg callable returning (rows_out,). Defined lazily so
    ray is initialised first."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from featherstore_ray.pipelines.feature_suite import feature_suite, window_features
    from featherstore_ray.pipelines.tokens_features import (
        tokens_feature_suite,
        tokens_minhash_pairs,
    )
    from featherstore_ray.sources.tokens import sf_num_rows, tokens_parquet
    from featherstore_ray.stages.aggregate import grouped_aggregate
    from featherstore_ray.stages.ann import cosine_topk
    from featherstore_ray.stages.dedup import exact_dedup, minhash_lsh_dedup

    events_path = f"{sf_dir}/events.parquet"
    nb = max(NUM_CPUS * 2, 32)

    def p_feature_suite():
        out = feature_suite(ray.data.read_parquet(events_path), num_buckets=nb)
        return out.count()

    def p_window_features():
        out = window_features(ray.data.read_parquet(events_path), num_buckets=nb)
        return out.count()

    tokens_dir = tokens_parquet(sf_num_rows(sf_dir))  # cached, untimed

    def p_tokens_feature_suite():
        out = tokens_feature_suite(
            ray.data.read_parquet(tokens_dir), num_buckets=nb
        )
        return out.count()

    def p_tokens_minhash():
        out = tokens_minhash_pairs(
            ray.data.read_parquet(tokens_dir), num_buckets=nb
        )
        return out.count()

    def p_tokens_suite():
        ds = ray.data.read_parquet(tokens_dir)

        def check(t: pa.Table) -> pa.Table:
            n = pc.cast(pc.list_value_length(t["tokens"]), pa.int32())
            if not pc.all(pc.equal(n, t["n_tok"])).as_py():
                raise ValueError("token invariant violated")
            return t

        ds = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
        stats = grouped_aggregate(
            ds.select_columns(["source", "n_tok"]),
            ["source"],
            {"docs": ("n_tok", "count"), "total_tokens": ("n_tok", "sum")},
            final="driver",  # 20 groups: partials are tiny, skip the shuffle
        )
        return stats.count()

    def p_tokens_dedup():
        import numpy as np

        ds = ray.data.read_parquet(tokens_dir)

        def add_hash(t: pa.Table) -> pa.Table:
            toks = t["tokens"]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            h = (flat + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
            csum = np.concatenate(([np.uint64(0)], np.cumsum(h, dtype=np.uint64)))
            seq_hash = (csum[offsets[1:]] - csum[offsets[:-1]]) ^ (
                (offsets[1:] - offsets[:-1]).astype(np.uint64)
            )
            return t.append_column("seq_hash", pa.array(seq_hash.view(np.int64)))

        hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        out = exact_dedup(
            hashed.select_columns(["doc_id", "seq_hash", "n_tok"]),
            ["seq_hash", "n_tok"],
            keep_col="doc_id",
            num_buckets=max(NUM_CPUS, 16),
        )
        return out.count()

    def p_minhash_docs():
        out = minhash_lsh_dedup(
            ray.data.read_parquet(f"{sf_dir}/documents.parquet"),
            id_col="doc_id",
            threshold=0.6,
        )
        return len(out)

    def p_ann_topk():
        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(pc.is_in(emb["vec_id"], value_set=pa.array([0, 1, 2])))
        out = cosine_topk(
            ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"), queries, k=5
        )
        return out.count()

    return {
        "feature_suite": p_feature_suite,
        "window_features": p_window_features,
        "tokens_feature_suite": p_tokens_feature_suite,
        "tokens_minhash": p_tokens_minhash,
        "tokens_suite": p_tokens_suite,
        "tokens_dedup": p_tokens_dedup,
        "minhash_docs": p_minhash_docs,
        "ann_topk": p_ann_topk,
    }


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    pipes = _pipelines(SF_DIR)
    # warm the page cache (untimed read)
    ray.data.read_parquet(f"{SF_DIR}/events.parquet").count()

    timings: dict[str, float] = {}
    feature_rows = 0
    suite_names = ("feature_suite", "window_features", "tokens_feature_suite")
    for name, fn in pipes.items():
        t0 = time.monotonic()
        rows = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        if name in suite_names:
            feature_rows += rows
    total = round(sum(timings.values()), 3)
    suite_sec = sum(timings[n] for n in suite_names)
    result = {
        "metric": "feature materialization suite wall time (asof+windows+tokens)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "feature_rows": feature_rows,
        "feature_rows_per_sec": round(feature_rows / max(suite_sec, 1e-9), 1),
    }
    ray.shutdown()
    return result


# The scaling criterion is evaluated on the corpus workload — the pipelines
# that run over the pre-tokenized sequence table (the 10^12-sequence design
# point of BASELINE.json). The sf0.1 star-schema pipelines (100k-row events)
# are correctness coverage; at that size they are fixed-overhead-bound on any
# engine and are reported separately.
CORPUS_PIPELINES = (
    "tokens_feature_suite",
    "tokens_minhash",
    "tokens_suite",
    "tokens_dedup",
)


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, __file__],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)

    def eff_over(names) -> tuple[float, float, float]:
        t_lo = sum(r_lo["queries"][n] for n in names)
        t_hi = sum(r_hi["queries"][n] for n in names)
        return t_lo, t_hi, round((t_lo / t_hi) / (hi / lo), 3)

    c_lo, c_hi, c_eff = eff_over(CORPUS_PIPELINES)
    a_lo, a_hi, a_eff = eff_over(r_lo["queries"].keys())
    corpus_rows = r_hi["feature_rows"]
    return {
        "metric": "throughput scaling efficiency (N→4N cpus)",
        "scaling_efficiency": c_eff,
        "corpus_sec_8": round(c_lo, 3),
        "corpus_sec_32": round(c_hi, 3),
        "rows_per_sec_8": round(corpus_rows / r_lo["value"], 1),
        "rows_per_sec_32": round(corpus_rows / r_hi["value"], 1),
        "all_pipelines_efficiency": a_eff,
        "all_sec_8": round(a_lo, 3),
        "all_sec_32": round(a_hi, 3),
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
