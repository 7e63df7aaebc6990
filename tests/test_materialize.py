"""Resumable materialization: lineage, skip-completed, deterministic replay."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from featherstore_ray.lineage import LineageLog
from featherstore_ray.pipelines.materialize import materialize, read_materialized
from featherstore_ray.stages.multimodal import decode_images


def _events(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
            "ts": pa.array(np.sort(rng.integers(0, 10**9, n)) * 1000,
                           pa.timestamp("us")),
            "value": pa.array(rng.normal(0, 1, n), pa.float64()),
        }
    )


def _make_kernel():
    # defined inside a factory so cloudpickle ships it by value (test modules
    # are not importable from Ray workers)
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="stable").reset_index(drop=True)
        df["value_cumsum"] = df.groupby("user_id")["value"].cumsum()
        return df

    return kernel


def test_materialize_and_resume_identical(tmp_path):
    _kernel = _make_kernel()
    tbl = _events()
    full_dir = tmp_path / "full"
    recs = materialize(
        ray.data.from_arrow(tbl),
        full_dir,
        entity_col="user_id",
        kernel=_kernel,
        sort_cols=["event_id"],
        num_buckets=8,
    )
    assert len(recs) == 8
    assert sum(r.rows for r in recs) == tbl.num_rows
    assert (full_dir / "_lineage.jsonl").exists()

    # simulate a failed run: only 3 partitions written, then resume
    part_dir = tmp_path / "partial"
    part_dir.mkdir()
    log = LineageLog(part_dir)
    for rec in recs[:3]:
        src = full_dir / f"part-{rec.partition_id:05d}.parquet"
        dst = part_dir / f"part-{rec.partition_id:05d}.parquet"
        dst.write_bytes(src.read_bytes())
        rec.path = str(dst)
        log.append(rec)

    new = materialize(
        ray.data.from_arrow(tbl),
        part_dir,
        entity_col="user_id",
        kernel=_kernel,
        sort_cols=["event_id"],
        num_buckets=8,
    )
    # resume computed only the missing 5 partitions
    assert len(new) == 5
    assert {r.partition_id for r in new} == {
        r.partition_id for r in recs
    } - {r.partition_id for r in recs[:3]}

    # byte-identical output vs the uninterrupted run
    for rec in recs:
        a = (full_dir / f"part-{rec.partition_id:05d}.parquet").read_bytes()
        b = (part_dir / f"part-{rec.partition_id:05d}.parquet").read_bytes()
        assert a == b, f"partition {rec.partition_id} differs after resume"

    # read back: same rows as input, plus the derived column
    back = read_materialized(full_dir).to_pandas()
    assert len(back) == tbl.num_rows
    assert "value_cumsum" in back.columns


def test_materialize_noop_when_complete(tmp_path):
    tbl = _events(500)
    d = tmp_path / "out"
    first = materialize(
        ray.data.from_arrow(tbl), d, entity_col="user_id", num_buckets=4
    )
    assert len(first) == 4
    again = materialize(
        ray.data.from_arrow(tbl), d, entity_col="user_id", num_buckets=4
    )
    assert again == []  # everything skipped


def test_multimodal_fake_decode():
    rng = np.random.default_rng(2)
    payloads = [rng.bytes(100) for _ in range(10)] + [None]
    tbl = pa.table(
        {
            "id": pa.array(range(11), pa.int64()),
            "image": pa.array(payloads, pa.binary()),
        }
    )
    out = decode_images(
        ray.data.from_arrow(tbl), feat_dim=8, concurrency=1, batch_size=4
    ).to_pandas()
    assert len(out) == 11
    assert out["decode_ok"].sum() == 10
    feats = np.stack(out.sort_values("id")["feat"].to_numpy())
    assert feats.shape == (11, 8)
    # deterministic: same payload → same features
    out2 = decode_images(
        ray.data.from_arrow(tbl), feat_dim=8, concurrency=1, batch_size=4
    ).to_pandas()
    feats2 = np.stack(out2.sort_values("id")["feat"].to_numpy())
    np.testing.assert_array_equal(feats, feats2)


def test_multimodal_frame_sampling():
    from featherstore_ray.stages.multimodal import sample_frames

    rng = np.random.default_rng(3)
    payloads = [rng.bytes(64) for _ in range(6)] + [None]
    tbl = pa.table(
        {
            "id": pa.array(range(7), pa.int64()),
            "video": pa.array(payloads, pa.binary()),
        }
    )
    out = sample_frames(
        ray.data.from_arrow(tbl), num_frames=3, feat_dim=8, concurrency=1
    ).to_pandas()
    # 6 non-null payloads x 3 frames; the null row is dropped
    assert len(out) == 18
    assert set(out["frame_idx"]) == {0, 1, 2}
    feats = np.stack(out.sort_values(["id", "frame_idx"])["frame_feat"].to_numpy())
    assert feats.shape == (18, 8)
    # per-frame determinism, and distinct frames differ
    out2 = sample_frames(
        ray.data.from_arrow(tbl), num_frames=3, feat_dim=8, concurrency=1
    ).to_pandas()
    feats2 = np.stack(out2.sort_values(["id", "frame_idx"])["frame_feat"].to_numpy())
    np.testing.assert_array_equal(feats, feats2)
    assert not np.array_equal(feats[0], feats[1])


def test_compression_codecs(tmp_path):
    from featherstore_ray.catalog import FeatherStore

    for codec in ["snappy", "zstd", "gzip"]:
        store = FeatherStore(tmp_path / codec, compression=codec)
        store.create_feature_set(
            "fs", {"entity_id": "string", "timestamp": "timestamp[us]", "f": "float64"}
        )
        tbl = pa.table(
            {
                "entity_id": pa.array(["a", "b"]),
                "timestamp": pa.array([1, 2], pa.timestamp("us")),
                "f": pa.array([1.5, 2.5]),
            }
        )
        store.ingest("fs", tbl)
        back = store.dataset("fs").to_pandas().sort_values("entity_id")
        assert list(back["f"]) == [1.5, 2.5]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        FeatherStore(tmp_path / "bad", compression="lzma")


def test_multimodal_audio_features():
    import pyarrow as pa

    from featherstore_ray.stages.multimodal import audio_features

    tbl = pa.table(
        {
            "clip_id": pa.array([1, 2, 3], pa.int64()),
            "audio": pa.array([b"\x01\x02" * 100, None, b"\x05" * 50],
                              pa.binary()),
        }
    )
    out = audio_features(
        ray.data.from_arrow(tbl), num_windows=4, feat_dim=8
    ).to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert list(out["n_windows"]) == [4, 0, 4]
    assert all(len(f) == 32 for f in out["audio_feat"])
    # deterministic
    out2 = audio_features(
        ray.data.from_arrow(tbl), num_windows=4, feat_dim=8
    ).to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert (out["audio_feat"].apply(tuple) == out2["audio_feat"].apply(tuple)).all()


def test_multimodal_pillow_gate():
    import pytest

    from featherstore_ray.stages.multimodal import ImageDecodeStage

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the gated real decoder would activate")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        ImageDecodeStage(decoder="pillow")


# -- incremental maintenance -------------------------------------------------


def _file_bytes(d):
    from pathlib import Path

    return {p.name: p.read_bytes() for p in Path(d).glob("part-*.parquet")}


def test_incremental_rederives_only_affected_buckets(tmp_path):
    from featherstore_ray.pipelines.materialize import materialize_incremental
    from featherstore_ray.partition import bucket_of

    _kernel = _make_kernel()
    base = _events()
    base_dir = tmp_path / "inc"
    materialize(ray.data.from_arrow(base), base_dir, entity_col="user_id",
                kernel=_kernel, sort_cols=["event_id"], num_buckets=8)
    before = _file_bytes(base_dir)

    # delta touches 3 users -> a strict subset of the 8 buckets
    delta = pa.table({
        "event_id": pa.array([10_000, 10_001, 10_002], pa.int64()),
        "user_id": pa.array([0, 7, 21], pa.int64()),
        "ts": pa.array([2 * 10**12] * 3, pa.timestamp("us")),
        "value": pa.array([1.5, -0.5, 3.0], pa.float64()),
    })
    affected = set(
        bucket_of(delta["user_id"], 8).tolist())
    assert 0 < len(affected) < 8
    full = pa.concat_tables([base, delta])

    recs = materialize_incremental(
        ray.data.from_arrow(full), ray.data.from_arrow(delta), base_dir,
        entity_col="user_id", delta_id="delta-1", kernel=_kernel,
        sort_cols=["event_id"], num_buckets=8)
    assert {r.partition_id for r in recs} == affected

    # byte-identical to a from-scratch run over base + delta
    scratch_dir = tmp_path / "scratch"
    materialize(ray.data.from_arrow(full), scratch_dir,
                entity_col="user_id", kernel=_kernel,
                sort_cols=["event_id"], num_buckets=8)
    after = _file_bytes(base_dir)
    assert after == _file_bytes(scratch_dir)
    # unaffected partitions were never rewritten
    for name, blob in before.items():
        pid = int(name.split("-")[1].split(".")[0])
        if pid not in affected:
            assert after[name] == blob

    # re-applying the same delta_id is a no-op (idempotent)
    recs2 = materialize_incremental(
        ray.data.from_arrow(full), ray.data.from_arrow(delta), base_dir,
        entity_col="user_id", delta_id="delta-1", kernel=_kernel,
        sort_cols=["event_id"], num_buckets=8)
    assert recs2 == []
    assert _file_bytes(base_dir) == after


def test_incremental_changes_only_affected_entities(tmp_path):
    """snapshot_diff between the old and new materialized outputs shows
    changes confined to the delta's entities."""
    from featherstore_ray.pipelines.materialize import (
        materialize_incremental, read_materialized)
    from featherstore_ray.stages.join import snapshot_diff

    _kernel = _make_kernel()
    base = _events(n=800, seed=9)
    out_old = tmp_path / "old"
    out_new = tmp_path / "new"
    materialize(ray.data.from_arrow(base), out_old, entity_col="user_id",
                kernel=_kernel, sort_cols=["event_id"], num_buckets=4)
    # second copy to evolve incrementally
    materialize(ray.data.from_arrow(base), out_new, entity_col="user_id",
                kernel=_kernel, sort_cols=["event_id"], num_buckets=4)

    delta = pa.table({
        "event_id": pa.array([20_000], pa.int64()),
        "user_id": pa.array([13], pa.int64()),
        "ts": pa.array([2 * 10**12], pa.timestamp("us")),
        "value": pa.array([9.0], pa.float64()),
    })
    full = pa.concat_tables([base, delta])
    materialize_incremental(
        ray.data.from_arrow(full), ray.data.from_arrow(delta), out_new,
        entity_col="user_id", kernel=_kernel, sort_cols=["event_id"],
        num_buckets=4)

    diff = snapshot_diff(
        read_materialized(out_old), read_materialized(out_new),
        ["event_id"], ["user_id", "value", "value_cumsum"],
        num_buckets=4).to_pandas()
    assert len(diff) > 0
    touched = set(
        diff.loc[diff["status"] == "added", "user_id_new"].tolist()
        + diff.loc[diff["status"] == "changed", "user_id_new"].tolist()
        + diff.loc[diff["status"] == "removed", "user_id_old"].tolist())
    assert touched == {13}


def test_incremental_resume_after_partial_failure(tmp_path):
    """A crash mid-incremental (one affected bucket written, one not)
    resumes to the exact full result without rewriting finished buckets."""
    from featherstore_ray.lineage import LineageLog
    from featherstore_ray.pipelines.materialize import materialize_incremental
    from featherstore_ray.partition import bucket_of

    _kernel = _make_kernel()
    base = _events()
    d = tmp_path / "inc"
    materialize(ray.data.from_arrow(base), d, entity_col="user_id",
                kernel=_kernel, sort_cols=["event_id"], num_buckets=8)

    delta = pa.table({
        "event_id": pa.array([10_000, 10_001], pa.int64()),
        "user_id": pa.array([0, 7], pa.int64()),
        "ts": pa.array([2 * 10**12] * 2, pa.timestamp("us")),
        "value": pa.array([1.0, 2.0], pa.float64()),
    })
    full = pa.concat_tables([base, delta])
    affected = sorted(set(bucket_of(delta["user_id"], 8).tolist()))
    assert len(affected) == 2

    # simulate the crash: invalidations + delta marker are durable but no
    # bucket was recomputed yet
    log = LineageLog(d)
    log.invalidate(affected, "delta-x")
    log.mark_delta("delta-x")
    assert set(log.completed()) == set(range(8)) - set(affected)

    # resume with the same delta_id: completes ONLY the open buckets
    recs = materialize_incremental(
        ray.data.from_arrow(full), ray.data.from_arrow(delta), d,
        entity_col="user_id", delta_id="delta-x", kernel=_kernel,
        sort_cols=["event_id"], num_buckets=8)
    assert sorted(r.partition_id for r in recs) == affected

    scratch = tmp_path / "scratch"
    materialize(ray.data.from_arrow(full), scratch, entity_col="user_id",
                kernel=_kernel, sort_cols=["event_id"], num_buckets=8)
    assert _file_bytes(d) == _file_bytes(scratch)
