"""Time a subset of registered queries via the noop sink (bench
methodology: warm pass + N reps, per-query MIN). Prints one JSON line.

Usage: python tools/time_queries.py q_a q_b ... [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from reshape_on_flink_spark.queries import merged
    from reshape_on_flink_spark.session import get_spark

    queries, _ = merged()
    spark = get_spark("time_queries")

    def run(name):
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in args:  # warm
        run(name)
    samples = {name: [] for name in args}
    for _ in range(reps):
        for name in args:
            t0 = time.perf_counter()
            run(name)
            samples[name].append(time.perf_counter() - t0)
    print(json.dumps({n: round(min(s), 3) for n, s in samples.items()}))


if __name__ == "__main__":
    main()
