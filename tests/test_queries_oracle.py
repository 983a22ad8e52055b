"""End-to-end driver-contract check: every queries() entry vs its DuckDB
oracle at sf0.001, replicating the driver's compare (row count + schema
names + order-insensitive values)."""

import math

import duckdb
import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")

from fast_carpenter_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_sf():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "region", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck_sf):
    fn, oracle = QUERIES[name]
    sdf = fn(spark, SF).toPandas()
    if oracle is None:
        assert len(sdf) >= 0
        return
    ddf = duck_sf.execute(oracle).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), f"{name}: column names differ"
    assert len(sdf) == len(ddf), f"{name}: row counts differ ({len(sdf)} vs {len(ddf)})"
    # dtype KINDS must match before normalization: DuckDB widening (e.g.
    # sum(BIGINT) -> HUGEINT -> pandas float64) is a driver hash mismatch
    # even at equal values, and _normalize's int64 cast would mask it
    for c in sdf.columns:
        ks, kd = sdf[c].dtype.kind, ddf[c].dtype.kind
        assert ks == kd or {ks, kd} <= {"i", "u"}, (
            f"{name}: column {c} dtype kind differs (spark {sdf[c].dtype} "
            f"vs oracle {ddf[c].dtype}) — cast the oracle expression"
        )
    a = _normalize(sdf)
    b = _normalize(ddf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if av.dtype.kind == "f":
            both_nan = pd.isna(av) & pd.isna(bv)
            eq = (av == bv) | both_nan
        else:
            eq = av == bv
        assert eq.all(), f"{name}: column {c} differs (first diff idx {int((~eq).argmax())})"
