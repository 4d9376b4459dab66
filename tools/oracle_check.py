"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet fixtures, then compares
row count, column names, and an order-insensitive value hash (columns
sorted by name; doubles rounded to 1e-9; rows sorted canonically).

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical_hash(df: pd.DataFrame) -> tuple[int, tuple[str, ...], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v) if not isinstance(v, str) else v)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    rows = sorted(map(repr, df.itertuples(index=False, name=None)))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(df), tuple(df.columns), h


def main() -> int:
    from bench import warn_untracked_artifacts

    warn_untracked_artifacts()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from reshape_on_flink_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(sdf)} (no oracle; rows-only check)")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        sn, scols, sh = canonical_hash(sdf)
        on, ocols, oh = canonical_hash(odf)
        dt = time.time() - t0
        if (sn, scols, sh) == (on, ocols, oh):
            print(f"PASS  {name}: rows={sn} ({dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows {sn}/{on} cols {scols}/{ocols} hash {sh[:10]}/{oh[:10]}")
            if sn and on and scols == ocols:
                s_rows = set(map(repr, sdf[sorted(sdf.columns)].round(6).itertuples(index=False, name=None)))
                o_rows = set(map(repr, odf[sorted(odf.columns)].round(6).itertuples(index=False, name=None)))
                for r in list(s_rows - o_rows)[:3]:
                    print(f"      spark-only: {r}")
                for r in list(o_rows - s_rows)[:3]:
                    print(f"      duck-only:  {r}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
