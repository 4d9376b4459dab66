"""Reshape-equivalent adaptive skew handling for streaming aggregation.

Reference (the fork's signature mechanism, SURVEY.md §0):
``flink-runtime/src/main/scala/org/apache/flink/runtime/reshape/
ControllerSimulator.scala`` — a JobMaster timer that, every ``reshapeFreq``
ms, marks subtasks with busyRatio > ``hiThreshold`` as skewed and
< ``loThreshold`` as helpers, pairs them stickily, and instructs upstream
writers (``WorkerSimulator.scala:22-42``) to reroute the first
``toHelper`` of every ``toAll`` records; the reroute ratio is fixed at 90%
for the first ``firstPhaseNum`` iterations, then adapts to equalize
cumulative input counts (``ControllerSimulator.scala:133-143``).

Spark re-expression
-------------------
Spark cannot reroute records of a running stage, and the reference's
reroute is *routing-only* — rerouted keyed records land on workers that
don't own their key group, so keyed aggregation results are only exact if
someone later merges (the repo never does; SURVEY.md §0.5). This engine
keeps the control loop but makes the mechanism exact:

- **detect**: per micro-batch, measure per-key load (row counts — the
  micro-batch analog of busyRatio: a key whose share exceeds
  ``hiThreshold × batch/parallelism`` would saturate one task).
- **mitigate**: split hot keys into ``n_salts`` salted sub-keys
  (*the reroute*), aggregate partially per (key, salt) — map-side combine
  means every task does bounded work — then **merge** the partials per
  key (*the stage the reference omits*), so results are exact.
- **two-phase schedule**: a fresh hot key starts at the aggressive
  first-phase salt fan-out (90% reroute ≈ split into
  ``1/(1-firstPhaseRatio) = 10`` sub-keys) for ``firstPhaseNum``
  controller iterations, then adapts: salts sized to the key's measured
  excess over the mean task load (the count-equalizing ratio of
  ``ControllerSimulator.scala:140-142``). Keys cool down and are dropped
  when their load falls below ``loThreshold ×`` the per-task mean —
  mirroring the cancel-when-caught-up rule (``:111-118``).
- **sticky**: salt assignments persist across iterations
  (``prevSkewedHelperPairs`` analog) so state keys stay stable.

Batch queries don't need any of this: AQE skew-join/partition splitting
(`spark.sql.adaptive.*`, on by default in session.py) is the built-in
equivalent.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ReshapeConf:
    """Mirrors the reference's knobs (README.md:15-23 of the reference)."""

    enabled: bool = True
    hi_threshold: float = 0.8  # hiThreshold: key share of task capacity => skewed
    lo_threshold: float = 0.2  # loThreshold: cool-down share
    freq_ms: int = 10_000  # reshapeFreq: controller iteration period
    first_phase_num: int = 6  # firstPhaseNum: iterations at fixed ratio
    first_phase_ratio: float = 0.9  # reroute 90 of every 100 records
    parallelism: int = 32  # stand-in for subtask count
    max_salts: int = 64

    @classmethod
    def from_spark_conf(cls, spark) -> "ReshapeConf":
        g = spark.conf.get
        return cls(
            enabled=g("spark.reshape.enabled", "false") == "true",
            hi_threshold=float(g("spark.reshape.hiThreshold", "0.8")),
            lo_threshold=float(g("spark.reshape.loThreshold", "0.2")),
            freq_ms=int(g("spark.reshape.freqMs", "10000")),
            first_phase_num=int(g("spark.reshape.firstPhaseNum", "6")),
            first_phase_ratio=float(g("spark.reshape.firstPhaseRatio", "0.9")),
        )


@dataclass
class _HotKey:
    salts: int
    iterations: int = 0  # controller iterations since detection


@dataclass
class ReshapeController:
    """Driver-side feedback controller (the ControllerSimulator analog).

    Holds the sticky hot-key -> salt-count routing table and updates it
    from per-key load observations at most once per ``freq_ms``.
    """

    conf: ReshapeConf
    hot_keys: dict = field(default_factory=dict)  # key value -> _HotKey
    _last_update: float = 0.0

    def routing(self) -> dict:
        return {k: hk.salts for k, hk in self.hot_keys.items()}

    def observe(self, key_counts: dict[object, int], total_rows: int) -> None:
        """One controller iteration (rate-limited to freq_ms)."""
        now = time.monotonic()
        if self._last_update and (now - self._last_update) * 1000 < self.conf.freq_ms:
            return
        self._last_update = now
        if total_rows <= 0:
            return
        task_mean = total_rows / self.conf.parallelism
        first_phase_salts = max(2, round(1.0 / (1.0 - self.conf.first_phase_ratio)))

        for key, count in key_counts.items():
            if key in self.hot_keys:
                hk = self.hot_keys[key]
                hk.iterations += 1
                if count < self.conf.lo_threshold * task_mean:
                    # caught up: cancel mitigation (ControllerSimulator:111-118)
                    del self.hot_keys[key]
                elif hk.iterations >= self.conf.first_phase_num:
                    # adaptive phase: size the split to the measured excess
                    # (count-equalizing ratio, ControllerSimulator:140-142)
                    hk.salts = int(min(self.conf.max_salts, max(2, math.ceil(count / task_mean))))
            elif count > self.conf.hi_threshold * task_mean:
                # newly skewed: aggressive first phase
                self.hot_keys[key] = _HotKey(salts=first_phase_salts)

        # keys that vanished from the batch cool down too
        for key in list(self.hot_keys):
            if key not in key_counts:
                del self.hot_keys[key]


def salted_partial_merge_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    routing: dict,
    spread_col: str,
) -> DataFrame:
    """Exact two-phase aggregation under a salt routing table.

    partial: groupBy(key, salt) — the shuffle that used to hot-spot now
    fans hot keys over n_salts reducers; merge: groupBy(key) over at most
    max_salts rows per key. Emits (key, cnt, sum_value).

    ``spread_col`` must be high-cardinality (event id, payload hash); the
    salt is ``hash(spread_col) pmod n_salts`` — deterministic, so replays
    route identically (exactly-once safe).
    """
    if not routing:
        return df.groupBy(key_col).agg(
            F.count("*").alias("cnt"), F.sum(value_col).alias("sum_value")
        )

    salt_map = F.create_map(
        *[x for k, n in routing.items() for x in (F.lit(k), F.lit(int(n)))]
    )
    n_salts = F.coalesce(salt_map.getItem(F.col(key_col)), F.lit(1))
    salt = F.pmod(F.hash(F.col(spread_col)), n_salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(F.count("*").alias("p_cnt"), F.sum(value_col).alias("p_sum"))
    )
    return (
        partial.groupBy(key_col)
        .agg(F.sum("p_cnt").alias("cnt"), F.sum("p_sum").alias("sum_value"))
    )


class ReshapeStreamingAgg:
    """Streaming grouped aggregation with the Reshape control loop.

    Runs as ``foreachBatch``: every micro-batch the controller observes
    per-key load, updates the routing table (rate-limited to freq_ms,
    two-phase schedule), and the batch is aggregated via
    salted_partial_merge_agg; partials are merged into a cumulative
    result table kept as a driver-side dict (exact, update-mode
    semantics). At cluster scale the merge target would be an upsert sink
    (Delta/HBase/foreachBatch-MERGE) — the control loop is identical.
    """

    def __init__(self, key_col: str, value_col: str, spread_col: str, conf: ReshapeConf):
        self.key_col = key_col
        self.value_col = value_col
        self.spread_col = spread_col
        self.conf = conf
        self.controller = ReshapeController(conf)
        self.results: dict = {}  # key -> (cnt, sum)
        self.batches_seen = 0
        self.routing_history: list[dict] = []

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.conf.enabled:
            counts = {
                r["k"]: r["n"]
                for r in batch_df.groupBy(F.col(self.key_col).alias("k"))
                .agg(F.count("*").alias("n"))
                .collect()
            }
            self.controller.observe(counts, sum(counts.values()))
        routing = self.controller.routing() if self.conf.enabled else {}
        self.routing_history.append(dict(routing))
        agg = salted_partial_merge_agg(
            batch_df, self.key_col, self.value_col, routing, self.spread_col
        )
        for r in agg.collect():
            k = r[self.key_col]
            cnt, sv = self.results.get(k, (0, 0.0))
            self.results[k] = (cnt + r["cnt"], sv + (r["sum_value"] or 0.0))
        self.batches_seen += 1

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Start the streaming query with this aggregator as the sink."""
        return (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
