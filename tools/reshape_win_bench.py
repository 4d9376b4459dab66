"""Reshape wall-clock WIN experiment (round 12, verdict r11 #3).

Question: does the Reshape controller's salted reroute BEAT no-mitigation
wall-clock on a genuinely serializing hot key, on this box?

Two measurements, both on a 90%-mass hot key (200 keys, key 0 carries
90% of rows — more extreme than zipf 1.5), aggregated through a keyed
PROCESS stage (``applyInPandas``). That operator class is the honest
Flink analog: Spark never map-side-combines custom keyed stages, so
every record of the hot key crosses the shuffle into ONE task — exactly
the subtask serialization the reference's reroute targets
(``WorkerSimulator.scala:22-42``). For relational count/sum, Spark's
map-side partial aggregation already performs the mitigation (at most
one partial row per key x map partition reaches the reducer), which is
WHY the long-standing ``skew_replay_*`` pair shows the controller as
pure overhead — that pair measures the control loop's cost on an
operator that doesn't need it.

1. ``batch_mechanism``: one micro-batch-sized job (plain vs
   controller-derived routing), interleaved min-of-N — isolates the
   mechanism from streaming fixed costs.
2. ``streaming_replay``: the verdict's requested shape — chunked replay
   through ReshapeStreamingAgg(engine='process') with the controller
   ON vs OFF, steady-state batches 1..N (batch 0 is unrouted for both:
   the controller needs one observation to detect), interleaved reps.

Run: ``python tools/reshape_win_bench.py [n_rows] [reps]`` (defaults
24M / 3). Prints one JSON line; committed output: RESHAPE_WIN.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reshape_on_flink_spark.session import get_spark  # noqa: E402
from reshape_on_flink_spark.sources.readers import datagen  # noqa: E402
from reshape_on_flink_spark.streaming.reshape import (  # noqa: E402
    PartialUpsertSink,
    ReshapeConf,
    ReshapeController,
    ReshapeStreamingAgg,
    keyed_process_agg,
    observe_candidates,
)
from reshape_on_flink_spark.streaming.source import chunked_replay  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_keys, hot_share, n_chunks = 200, 0.9, 5
    spark = get_spark("reshape_win")
    out: dict = {
        "metric": "reshape_win",
        "n_rows": n_rows,
        "n_keys": n_keys,
        "hot_share": hot_share,
        "engine": "process (applyInPandas keyed stage, no map-side combine)",
        "reps": reps,
    }

    hot = datagen(spark, n_rows, n_keys=n_keys, skew_hot_share=hot_share).select(
        "id", "key", "value"
    )
    hot_dir = ".tmp/reshape_win_src.parquet"
    hot.write.mode("overwrite").parquet(hot_dir)
    src = spark.read.parquet(hot_dir)

    # -- 1. batch mechanism: one batch-sized job, controller-derived
    # routing, interleaved min-of-reps ---------------------------------
    rconf = ReshapeConf(parallelism=32, freq_ms=0)
    controller = ReshapeController(rconf)
    sink_dir = ".tmp/reshape_win_sink"
    shutil.rmtree(sink_dir, ignore_errors=True)
    sink = PartialUpsertSink(spark, sink_dir, "key", compact_every=100)

    def one_pass(routing: dict, epoch: int) -> None:
        sink.write(keyed_process_agg(src, "key", "value", routing, "id"), epoch)

    one_pass({}, 0)  # warm + observation source
    total_rows, candidates = observe_candidates(
        sink.read_epoch(0), "key", rconf, {}
    )
    controller.observe(candidates, total_rows)
    routing = controller.routing()
    assert routing, "controller failed to detect the hot key"
    out["controller_routing"] = {str(k): v for k, v in routing.items()}
    mech: dict[str, list] = {"plain": [], "reshape": []}
    epoch = 1
    for _ in range(reps):
        for lab, r in (("plain", {}), ("reshape", routing)):
            t0 = time.perf_counter()
            one_pass(r, epoch)
            mech[lab].append(round(time.perf_counter() - t0, 3))
            epoch += 1
    out["batch_mechanism"] = {
        "plain_sec": min(mech["plain"]),
        "reshape_sec": min(mech["reshape"]),
        "samples": mech,
        "win": round(min(mech["plain"]) / min(mech["reshape"]), 2),
    }
    shutil.rmtree(sink_dir, ignore_errors=True)

    # -- 2. streaming replay: ReshapeStreamingAgg ON vs OFF, steady-state
    # batches 1..N (the existing skew_replay methodology), interleaved --
    def replay(enabled: bool, rep: int) -> float | None:
        replay_dir = f".tmp/reshape_win_replay_{enabled}_{rep}"
        ckpt = f"{replay_dir}_ckpt"
        sdir = f"{replay_dir}_sink"
        for d in (ckpt, sdir):
            shutil.rmtree(d, ignore_errors=True)
        stream = chunked_replay(
            spark, src, replay_dir, n_chunks=n_chunks, order_col="id"
        )
        agg = ReshapeStreamingAgg(
            "key", "value", "id",
            ReshapeConf(enabled=enabled, parallelism=32, freq_ms=10_000),
            sink=PartialUpsertSink(spark, sdir, "key", compact_every=10),
            engine="process",
        )
        q = agg.attach(stream, ckpt)
        q.awaitTermination(600)
        prog = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
        steady = (
            sum(p["durationMs"]["triggerExecution"] for p in prog[1:]) / 1000.0
            if prog[1:]
            else None
        )
        for d in (replay_dir, ckpt, sdir):
            shutil.rmtree(d, ignore_errors=True)
        return steady

    stream_s: dict[str, list] = {"plain": [], "reshape": []}
    for rep in range(reps):
        for lab, enabled in (("plain", False), ("reshape", True)):
            s = replay(enabled, rep)
            if s is not None:
                stream_s[lab].append(round(s, 3))
    out["streaming_replay"] = {
        "plain_steady_sec": statistics.median(stream_s["plain"]),
        "reshape_steady_sec": statistics.median(stream_s["reshape"]),
        "plain_min_sec": min(stream_s["plain"]),
        "reshape_min_sec": min(stream_s["reshape"]),
        "samples": stream_s,
        "win_median": round(
            statistics.median(stream_s["plain"])
            / statistics.median(stream_s["reshape"]),
            2,
        ),
        "win_min": round(min(stream_s["plain"]) / min(stream_s["reshape"]), 2),
        "note": (
            "steady-state batches 1..N; batch 0 runs unrouted on both "
            "(one observation to detect). Streaming fixed costs (chunk "
            "read + shuffle write of every record, paid by both paths) "
            "dilute the mechanism win; at cluster scale those terms "
            "parallelize across executors while the hot key's serial "
            "term keeps growing, so the dilution shrinks with data size."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
