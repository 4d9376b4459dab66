"""Triage sweep: the 22 canonical TPC-H query texts through the dialect
layer on Spark vs DuckDB on identical dbgen parquet, at any scale
factor (TPCH_SF env, default 0.01). Mirror of tools/tpcds_sweep.py for
the TPC-H suite (tests/test_tpch_literal.py is the pinned sf0.01 form).

Usage:  TPCH_SF=1 python tools/tpch_sweep.py [q1 q2 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reshape_on_flink_spark.sources import tpcds as T
from reshape_on_flink_spark.sources import tpch as H

SF = float(os.environ.get("TPCH_SF", "0.01"))
DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tpch_cache",
    f"sf{SF}",
)

ONLY = sys.argv[1:] or None


def main():
    from reshape_on_flink_spark.api.table_env import TableEnvironment
    from reshape_on_flink_spark.session import get_spark

    H.generate_tpch(DATA_DIR, sf=SF)
    spark = get_spark("tpch-sweep", cores=8)
    session = spark.newSession()
    H.register_tpch(session, DATA_DIR)
    tenv = TableEnvironment.create(session)
    duck = H.duckdb_tpch(DATA_DIR)

    texts = H.query_texts()
    ok, okl, bad = [], [], []
    for name in [f"q{i}" for i in range(1, 23)]:
        if ONLY and name not in ONLY:
            continue
        sql = texts[name]
        t0 = time.time()
        try:
            spd = tenv.execute_sql(sql).toPandas()
        except Exception as e:  # noqa: BLE001 - triage tool
            bad.append((name, "SPARK", repr(e)[:300]))
            print(f"{name:4s} SPARK-ERR {repr(e)[:200]}")
            continue
        try:
            dpd = duck.execute(T.to_duckdb_dialect(sql)).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append((name, "DUCK", repr(e)[:300]))
            print(f"{name:4s} DUCK-ERR {repr(e)[:200]}")
            continue
        msg = T.compare_results(spd, dpd)
        mode = "full"
        if msg is not None and T.top_limit(sql) is not None and len(dpd) == T.top_limit(sql):
            nolim = T.strip_top_limit(sql)
            try:
                spd2 = tenv.execute_sql(nolim).toPandas()
                dpd2 = duck.execute(T.to_duckdb_dialect(nolim)).fetchdf()
                msg2 = T.compare_results(spd2, dpd2)
                if msg2 is None:
                    msg, mode = None, "nolimit"
                else:
                    msg = msg + " | nolimit: " + msg2
            except Exception as e:  # noqa: BLE001
                msg = msg + " | nolimit raised: " + repr(e)[:150]
        dt = time.time() - t0
        if msg is None:
            (ok if mode == "full" else okl).append(name)
            print(f"{name:4s} OK({mode}) rows={len(spd)} {dt:.1f}s")
        else:
            bad.append((name, "MISMATCH", msg))
            print(f"{name:4s} MISMATCH {msg[:220]}  {dt:.1f}s")
    print(f"\nfull={len(ok)} nolimit={len(okl)} bad={len(bad)}")
    for b in bad:
        print("BAD", b[0], b[1], b[2][:160])


if __name__ == "__main__":
    main()
