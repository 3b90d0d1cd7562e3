"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and an order-insensitive value multiset.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    """pandas DF -> sorted multiset of stringified rows, columns sorted."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float) and v == int(v):
            return str(int(v))
        if isinstance(v, bool):
            return str(int(v))
        if hasattr(v, "item"):
            v = v.item()
        return str(v)

    rows = ["|".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from aws_log_ingestion_spark.session import get_spark

    spark = get_spark("correctness-check", cores=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0 and name not in ("dedup_simhash",):
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {ex}")
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            failures.append(name)
            print(f"FAIL  {name}: columns {s_cols} != {o_cols}")
            continue
        # dtype alignment (the driver may compare schemas): require equal
        # pandas dtypes modulo object/string
        dt_mismatch = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in s_cols
            if str(sdf[c].dtype) != str(odf[c].dtype)
            and not (sdf[c].dtype == object or odf[c].dtype == object)
        ]
        if dt_mismatch:
            failures.append(name)
            print(f"FAIL  {name}: dtype mismatch {dt_mismatch}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(sdf)} != {len(odf)}")
            continue
        ns, no = normalize(sdf), normalize(odf)
        if ns != no:
            failures.append(name)
            diff = [(a, b) for a, b in zip(ns, no) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
            continue
        print(f"ok    {name}: MATCH ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
