#!/usr/bin/env python
"""Dev harness emulating the driver's correctness gate: run every catalog
query on Spark AND its oracle SQL on DuckDB over the same sf dir, sort
columns by name + rows by value, and diff.  Usage:

    python tools/check_catalog.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Everything to canonical strings (mirrors a value-hash over cells):
    datetimes -> iso-with-us, floats -> %.6f, ints -> int string."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda x: "nan" if pd.isna(x) else "%.6f" % x)
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("int64").astype(str)
        else:
            out[c] = col.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from dagger_spark.catalog import QUERIES
    from dagger_spark.session import get_spark

    spark = get_spark("check_catalog", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_fail = n_rowsonly = 0
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows-only {name}: {len(sdf)} rows")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = normalize(sdf), normalize(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
            n_fail += 1
            continue
        print(f"ok   {name}: {len(a)} rows")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_fail} FAILED")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
