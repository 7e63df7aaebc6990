"""FeatureBuilder UDF hook: partitioning contract + custom builder."""

import numpy as np
import pyarrow as pa

import ray.data

from featherstore_ray.stages.builder import apply_feature_builder


def test_custom_builder_ewma():
    rng = np.random.default_rng(4)
    n = 4000
    tbl = pa.table(
        {
            "eid": pa.array(np.arange(n), pa.int64()),
            "entity": pa.array(rng.integers(0, 50, n), pa.int64()),
            "ts": pa.array(np.sort(rng.integers(0, 10**9, n)) * 1000,
                           pa.timestamp("us")),
            "value": pa.array(rng.normal(0, 1, n), pa.float64()),
        }
    )

    def make_builder():
        def ewma(df):
            df["value_ewma"] = (
                df.groupby("entity")["value"].transform(
                    lambda s: s.ewm(alpha=0.5).mean()
                )
            )
            return df

        return ewma

    out = apply_feature_builder(
        ray.data.from_arrow(tbl),
        make_builder(),
        entity_col="entity",
        ts_col="ts",
        tiebreak="eid",
        num_buckets=4,
    ).to_pandas()
    assert len(out) == n
    # reference: pandas on the whole table with the same ordering
    pdf = tbl.to_pandas().sort_values(["entity", "ts", "eid"], kind="stable")
    exp = pdf.groupby("entity")["value"].transform(lambda s: s.ewm(alpha=0.5).mean())
    m = out.set_index("eid")["value_ewma"]
    e = exp.set_axis(pdf["eid"]).rename("value_ewma")
    np.testing.assert_allclose(m.sort_index(), e.sort_index(), atol=1e-12)


def test_builder_sees_whole_entity():
    # contract check: fn must receive ALL rows of each entity in one call
    tbl = pa.table(
        {
            "entity": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )

    def make_counter():
        def fn(df):
            g = df.groupby("entity", as_index=False)["v"].agg(["count", "sum"])
            return g.reset_index(drop=True)

        return fn

    out = (
        apply_feature_builder(
            ray.data.from_arrow(tbl),
            make_counter(),
            entity_col="entity",
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("entity")
    )
    assert list(out["count"]) == [2, 2, 1]
    assert list(out["sum"]) == [3.0, 7.0, 5.0]
