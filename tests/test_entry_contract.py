"""Mini-driver: run every __ray_entry__ query against its DuckDB oracle.

Mirrors the real driver's comparison: row count, column names (sorted), and
order-insensitive value equality. Uses sf0.001 to stay fast; the driver runs
sf0.01.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, con):
    ray_df = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_df = _canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: column mismatch {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: row count"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        # The real driver hashes raw values, so 42.0 vs 42 is a mismatch:
        # dtype *kind* must agree (int vs float vs datetime vs object).
        assert a.dtype.kind == b.dtype.kind, (
            f"{name}.{c}: dtype kind {a.dtype} vs oracle {b.dtype}"
        )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), atol=1e-6, equal_nan=True,
                err_msg=f"{name}.{c}",
            )
        else:
            assert (a.isna() == b.isna()).all(), f"{name}.{c}: null mask"
            mask = ~a.isna()
            assert (a[mask].to_numpy() == b[mask].to_numpy()).all(), f"{name}.{c}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
    # deterministic: same call twice → identical result
    df2 = _to_pandas(entrymod.queries()[name](SF_DIR))
    pd.testing.assert_frame_equal(_canon(df), _canon(df2))


def test_entry_smoke():
    out = _to_pandas(entrymod.entry())
    assert len(out) > 0
    assert "value_asof" in out.columns and "session_id" in out.columns
    # zero temporal leakage on the flagship output
    m = out["ts_asof"].notna()
    assert (
        out.loc[m, "ts_asof"].to_numpy("datetime64[us]")
        <= out.loc[m, "ts"].to_numpy("datetime64[us]")
    ).all()
