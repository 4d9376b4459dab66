"""Interleaved A/B of streaming/state-store knobs on
q_changelog_join_transitions (verdict r13 item 4).

Times the full declared query (noop-equivalent: the query itself writes a
parquet sink and reads it back; we materialize the returned DataFrame via
the noop sink) under knob variants, interleaved A/B/A/B to cancel box
drift. Usage:

    python tools/profile_join_transitions.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reshape_on_flink_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "nodata_off": {"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    "statefmt_unsafe": {
        # avro<->unsaferow conversion off for the state rows
        "spark.sql.streaming.stateStore.formatValidation.enabled": "false"
    },
    "async_progress": {
        "spark.sql.streaming.asyncProgressTrackingEnabled": "true"
    },
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
    },
    "no_snapshots": {
        # with <=5 micro-batches the HDFS provider never snapshots anyway;
        # confirm that's true (a null result is evidence)
        "spark.sql.streaming.stateStore.minDeltasForSnapshot": "100"
    },
    "unload_off": {
        # keep loaded state store providers resident across batches
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s"
    },
    "combo": {
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
        "spark.sql.streaming.stateStore.formatValidation.enabled": "false",
    },
}


def run_once(spark, variant: dict[str, str]) -> float:
    from reshape_on_flink_spark.queries.streaming_batch import (
        q_changelog_join_transitions,
    )

    saved = {}
    for k, v in variant.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        t0 = time.time()
        df = q_changelog_join_transitions(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main() -> None:
    spark = get_spark("profile_join_transitions")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(VARIANTS)
    # warm pass (JIT, file index) on base
    run_once(spark, VARIANTS["base"])
    times: dict[str, list[float]] = {n: [] for n in names}
    for r in range(REPS):
        for n in names:  # interleaved: every variant once per rep
            spark.sparkContext.setJobDescription(f"jct:{n}:rep{r}")
            times[n].append(run_once(spark, VARIANTS[n]))
    for n in names:
        ts = times[n]
        print(f"{n:18s} min={min(ts):6.2f} all={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
