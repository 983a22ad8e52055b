"""Targeted driver-grain oracle sweep: compare named queries() entries
against their DuckDB oracle at a given SF dir, replicating the driver's
compare (row count + schema names + order-insensitive values).

Usage:
    python scripts/sweep_oracle.py [--sf /root/testdata/sf0.01] [names...]
With no names, sweeps the full registry.
"""

import argparse
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["documents", "embeddings", "events", "lineitem", "orders",
          "customer", "supplier", "part", "region", "nation"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from fast_carpenter_spark.queries import QUERIES
    from fast_carpenter_spark.session import build_session

    spark = build_session(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.sql.session.timeZone": "UTC"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or sorted(QUERIES)
    failures = []
    for name in names:
        fn, oracle = QUERIES[name]
        try:
            sdf = fn(spark, args.sf).toPandas()
            if oracle is None:
                print(f"{name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.execute(oracle).fetchdf()
            s, o = normalize(sdf), normalize(odf)
            assert list(s.columns) == list(o.columns), (list(s.columns), list(o.columns))
            assert len(s) == len(o), (len(s), len(o))
            pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                          rtol=1e-9, atol=1e-12)
            print(f"{name}: OK ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: FAIL {type(e).__name__}: {e}")
            traceback.print_exc(limit=3)
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
