"""Profile where the CEP timeout family spends its time (verdict r13
item 5 scoping): per-query wall clock with the Python-UDF profiler on,
so the consolidated pandas scan's internal hot spots (the per-start
branch replay) are separated from plan/exchange overhead.

    python tools/profile_cep_timeout.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reshape_on_flink_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = sys.argv[2:] or [
    "q_cep_timeout_skip",
    "q_cep_timeout_group_times",
    "q_cep_timeout_group_greedy",
    "q_cep_timeout_group_opt",
]


def main() -> None:
    from reshape_on_flink_spark.queries import merged

    queries, _ = merged()
    spark = get_spark("profile_cep_timeout")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    for name in QUERIES:
        fn = queries[name]
        # warm pass
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(f"\n==== {name}: {time.time() - t0:.2f}s ====", flush=True)
    spark.profile.show(type="perf")


if __name__ == "__main__":
    main()
