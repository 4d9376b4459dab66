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
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
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
    # observation source: "inline" (observe inside process_batch, from
    # the merged aggregate the pipeline computes anyway) or "listener"
    # (a StreamingQueryListener polls the upsert sink on progress events
    # — the out-of-band control plane of the reference's JobMaster
    # timer, ControllerSimulator.scala:52-94)
    observation: str = "inline"

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
            observation=g("spark.reshape.observation", "inline"),
        )

    def __post_init__(self):
        if self.observation not in ("inline", "listener"):
            raise ValueError(
                f"spark.reshape.observation must be 'inline' or "
                f"'listener', got {self.observation!r}"
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

    def due(self) -> bool:
        """True if the next observe() would run (freq_ms window elapsed).

        Callers that must pay a Spark job to produce the observation
        (``observe_candidates``) check this first so rate-limited ticks
        cost nothing — the ControllerSimulator analog only samples
        busyRatio once per ``reshapeFreq`` too.
        """
        return not self._last_update or (time.monotonic() - self._last_update) * 1000 >= self.conf.freq_ms

    def observe(self, key_counts: dict[object, int], total_rows: int) -> None:
        """One controller iteration (rate-limited to freq_ms).

        ``key_counts`` need not be the full per-key histogram: only keys
        above ``lo_threshold × task_mean`` plus currently-tracked hot
        keys influence any branch below, so callers may (and at scale
        MUST) pre-filter to that bounded candidate set — see
        ``observe_candidates``. Tracked keys absent from ``key_counts``
        cool down exactly as if they had count 0.
        """
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


def keyed_process_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    routing: dict,
    spread_col: str,
) -> DataFrame:
    """The same exact (key, cnt, sum_value) aggregation computed through
    a keyed PROCESS stage (``applyInPandas``) instead of a relational
    aggregate — the operator shape where the reference's reroute
    actually pays.

    Why this exists: for relational count/sum, Spark's map-side partial
    aggregation already performs Reshape's mitigation — each reducer
    receives at most one partial row per (key, map partition), so no
    skew survives the shuffle and salting is pure overhead (measured:
    every committed skew_replay shows reshape >= plain). The reference's
    subtasks are NOT combining aggregates though: a Flink keyed stream
    ships every raw record of a key to one subtask that does per-record
    work (``WorkerSimulator.scala:22-42`` — the reroute redirects that
    record flow). Spark's analog of that operator class is a custom
    keyed stage (``applyInPandas`` / stateful pandas ops), which Spark
    never map-side combines: every record crosses the shuffle keyed by
    ``key_col`` and one task processes the whole hot group. THERE a hot
    key genuinely serializes a reducer, and the salted reroute
    (hash(spread_col) pmod n_salts sub-keys, partial process per
    sub-key, exact merge) is a real wall-clock win — benched as
    ``skew_process_plain`` vs ``skew_process_reshape``.
    """
    import pandas as pd

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, cnt long, sum_value double"

    def agg_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            key_col: [pdf[key_col].iloc[0]],
            "cnt": [len(pdf)],
            "sum_value": [float(pdf[value_col].sum())],
        })

    from reshape_on_flink_spark.session import repartition_for_python_stage

    if not routing:
        return (
            repartition_for_python_stage(df, key_col)
            .groupBy(key_col)
            .applyInPandas(agg_fn, out_schema)
        )

    salt_map = F.create_map(
        *[x for k, n in routing.items() for x in (F.lit(k), F.lit(int(n)))]
    )
    n_salts = F.coalesce(salt_map.getItem(F.col(key_col)), F.lit(1))
    partial_schema = f"{key_col} {key_type}, _salt int, cnt long, sum_value double"

    def partial_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            key_col: [pdf[key_col].iloc[0]],
            "_salt": [int(pdf["_salt"].iloc[0])],
            "cnt": [len(pdf)],
            "sum_value": [float(pdf[value_col].sum())],
        })

    partial = (
        repartition_for_python_stage(
            df.withColumn("_salt", F.pmod(F.hash(F.col(spread_col)), n_salts)),
            [key_col, "_salt"],
        )
        .groupBy(key_col, "_salt")
        .applyInPandas(partial_fn, partial_schema)
    )
    # merge: at most max_salts tiny partial rows per key — the exactness
    # stage the reference omits (SURVEY.md §0.5); relational here because
    # the record flow is already collapsed
    return partial.groupBy(key_col).agg(
        F.sum("cnt").alias("cnt"), F.sum("sum_value").alias("sum_value")
    )


def observe_candidates(
    merged: DataFrame, key_col: str, conf: ReshapeConf, tracked: dict
) -> tuple[int, dict]:
    """Distributed, bounded load observation for the controller.

    Input is the *merged* per-key aggregate of the current micro-batch
    (one row per key, ``cnt`` column), i.e. the result the pipeline
    computes anyway. Returns ``(total_rows, candidates)`` where
    candidates holds only keys that can influence the controller:

    - keys with ``cnt > lo_threshold × task_mean`` (every possible new
      hot key — hi_threshold ≥ lo_threshold — and every tracked key
      still above its cool-down bar), plus
    - currently ``tracked`` hot keys regardless of count (so cool-down
      sees their true low count instead of a phantom absence).

    The collect is bounded by ``parallelism / lo_threshold + |tracked|``
    rows (at most that many keys can exceed ``lo × total/parallelism``),
    independent of key cardinality — the full histogram never reaches
    the driver. This is what makes the control loop viable at 100 TB:
    the reference's controller likewise receives only per-*subtask*
    busyRatios (O(parallelism)), never per-key stats.
    """
    total = merged.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 0
    if total <= 0:
        return 0, {}
    floor = conf.lo_threshold * (total / conf.parallelism)
    cond = F.col("cnt") > F.lit(floor)
    if tracked:
        cond = cond | F.col(key_col).isin(list(tracked))
    rows = merged.filter(cond).select(key_col, "cnt").collect()
    return int(total), {r[key_col]: r["cnt"] for r in rows}


class PartialUpsertSink:
    """Cluster-scale merge target: per-epoch partial parquet + merge-on-read.

    The driver-side dict in ``ReshapeStreamingAgg`` is a test
    convenience; at 100 TB the cumulative keyed result can't live on the
    driver. This sink implements the standard upsert pattern on plain
    parquet (on a real deployment the same calls map 1:1 onto a Delta /
    Iceberg ``MERGE INTO`` in ``foreachBatch``):

    - ``write(merged, epoch_id)``: writes the batch's merged per-key
      partials to ``partials/epoch=<id>`` with dynamic overwrite — a
      replayed epoch (failure recovery) overwrites its own directory,
      so the sink is idempotent / effectively exactly-once.
    - ``result_df()``: merge-on-read — snapshot ∪ partials, re-aggregated
      per key. Distributed; never collects.
    - ``compact()``: folds snapshot + live partials into a new
      *versioned* snapshot dir, then commits with ONE atomic
      ``os.replace`` of the ``CURRENT`` pointer file (the Iceberg
      metadata-pointer pattern). Crash at any instant leaves either the
      old committed state (all partials intact) or the new one (folded
      epochs ignored via the pointer's compacted-through watermark) —
      never a missing snapshot, never a double count. Post-commit
      cleanup is best-effort garbage collection: ``write()`` skips and
      ``result_df()`` filters out partial epochs ≤ the committed
      watermark, so leftover folded partials are inert. Called
      automatically every ``compact_every`` epochs.

    On-disk layout::

        partials/epoch=<id>/   per-epoch merged partial (idempotent)
        snapshot_v<E>/         compacted through epoch E (immutable)
        CURRENT                text "snapshot_v<E>:<E>" — the commit point
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        compact_every: int = 8,
        merge_spec: dict[str, str] | None = None,
    ):
        """``merge_spec`` maps value column -> merge fn (``sum``/``min``/
        ``max``) for re-aggregating partials; None infers ``sum`` for
        every non-key column of the first written partial. Partials must
        be merge-decomposable (count/sum/min/max are; write sum+cnt pairs
        for avg)."""
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.compact_every = compact_every
        self.merge_spec = dict(merge_spec) if merge_spec else None
        self._epochs_since_compact = 0

    @property
    def _partials(self) -> str:
        return os.path.join(self.path, "partials")

    @property
    def _current(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _load_current(self) -> tuple[str | None, int]:
        """(committed snapshot dir or None, compacted-through epoch).

        The CURRENT pointer file is the only source of truth; a snapshot
        dir not named by it does not exist as far as readers are
        concerned (it is either a crashed pre-commit attempt or
        post-commit garbage awaiting cleanup).
        """
        try:
            with open(self._current) as f:
                name, _, through = f.read().strip().partition(":")
            d = os.path.join(self.path, name)
            return (d if os.path.isdir(d) else None), int(through)
        except (OSError, ValueError):
            return None, -1

    def _compacted_through(self) -> int:
        return self._load_current()[1]

    def _partial_epochs(self) -> list[int]:
        if not os.path.isdir(self._partials):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self._partials)
            if d.startswith("epoch=")
        )

    def write(self, merged: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) <= self._compacted_through():
            return  # replay of an epoch already folded into the snapshot
        merged.write.mode("overwrite").parquet(
            os.path.join(self._partials, f"epoch={int(epoch_id)}")
        )
        self._epochs_since_compact += 1
        if self._epochs_since_compact >= self.compact_every:
            self.compact()

    def read_epoch(self, epoch_id: int) -> DataFrame | None:
        """The merged partial a given epoch wrote (None if skipped as a
        replay). Reading the just-written small parquet back is the cheap
        way to observe per-key load without re-running the aggregation's
        lineage or persisting it."""
        d = os.path.join(self._partials, f"epoch={int(epoch_id)}")
        if not os.path.isdir(d):
            return None
        return self.spark.read.parquet(d)

    def _read_snapshot(self) -> DataFrame | None:
        snap_dir, _ = self._load_current()
        if snap_dir is None:
            return None
        return self.spark.read.parquet(snap_dir)

    def _read_live_partials(self) -> DataFrame | None:
        """Partials newer than the committed watermark (folded epochs
        left behind by a crash mid-cleanup are filtered out here)."""
        if not os.path.isdir(self._partials):
            return None
        try:
            df = self.spark.read.option("basePath", self._partials).parquet(self._partials)
        except Exception:
            return None  # empty dir
        _, through = self._load_current()
        return df.filter(F.col("epoch") > F.lit(through)).drop("epoch")

    def result_df(self) -> DataFrame:
        parts = [df for df in (self._read_snapshot(), self._read_live_partials()) if df is not None]
        if not parts:
            raise ValueError(f"no data written to {self.path} yet")
        union = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        spec = self.merge_spec or {
            c: "sum" for c in union.columns if c != self.key_col
        }
        mergers = {"sum": F.sum, "min": F.min, "max": F.max}
        return union.groupBy(self.key_col).agg(
            *[mergers[fn](c).alias(c) for c, fn in spec.items()]
        )

    def compact(self) -> None:
        old_snap, through = self._load_current()
        live_epochs = [e for e in self._partial_epochs() if e > through]
        if not live_epochs:
            return
        new_through = max(live_epochs)
        folded = self.result_df().coalesce(max(1, self.spark.sparkContext.defaultParallelism // 8))
        new_name = f"snapshot_v{new_through}"
        new_dir = os.path.join(self.path, new_name)
        shutil.rmtree(new_dir, ignore_errors=True)  # crashed prior attempt
        folded.write.mode("overwrite").parquet(new_dir)
        # the ONLY commit point: atomically repoint CURRENT. Crash before
        # this line -> old state fully intact (snapshot + all partials);
        # crash after -> new snapshot committed and every folded epoch is
        # ignored by write()/result_df() via the watermark, so the
        # cleanup below is pure garbage collection.
        tmp = self._current + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{new_name}:{new_through}")
        os.replace(tmp, self._current)
        if old_snap is not None:
            shutil.rmtree(old_snap, ignore_errors=True)
        for e in self._partial_epochs():
            if e <= new_through:  # folded now, or stale from a crashed cleanup
                shutil.rmtree(os.path.join(self._partials, f"epoch={e}"), ignore_errors=True)
        self._epochs_since_compact = 0


def attach_upsert(
    stream_df: DataFrame,
    sink: PartialUpsertSink,
    partial_fn,
    checkpoint_dir: str,
):
    """Generic streaming-aggregation-to-upsert-sink attachment: every
    micro-batch is reduced by ``partial_fn(batch_df) -> merged partial``
    (one row per key, merge-decomposable columns) and written to the
    sink's idempotent per-epoch store. This is the cluster-scale pattern
    for ANY keyed streaming aggregate, not just the Reshape controller:
    ``sink.result_df()`` is the cumulative table, exact under replays.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write(partial_fn(batch_df), epoch_id)

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class ReshapeStreamingAgg:
    """Streaming grouped aggregation with the Reshape control loop.

    Runs as ``foreachBatch``: each micro-batch is aggregated via
    salted_partial_merge_agg under the controller's current (sticky)
    routing table; the controller then observes per-key load *from that
    already-computed merged aggregate* — via ``observe_candidates``, so
    only the bounded heavy-hitter candidate set ever reaches the driver
    — and updates the routing for subsequent batches (rate-limited to
    freq_ms, two-phase schedule). Observing the output of the
    aggregation the pipeline runs anyway costs zero extra shuffles.

    Merge target: pass ``sink=PartialUpsertSink(...)`` for the
    cluster-scale path (per-epoch idempotent parquet upsert,
    merge-on-read, periodic compaction — the Delta-MERGE analog).
    Without a sink, results accumulate in a driver-side dict — a test
    convenience only, sized to the fixture key space.
    """

    def __init__(
        self,
        key_col: str,
        value_col: str,
        spread_col: str,
        conf: ReshapeConf,
        sink: PartialUpsertSink | None = None,
        engine: str = "relational",
    ):
        if engine not in ("relational", "process"):
            raise ValueError(
                f"engine must be 'relational' or 'process', got {engine!r}"
            )
        self.key_col = key_col
        self.value_col = value_col
        self.spread_col = spread_col
        self.conf = conf
        self.sink = sink
        # 'relational': Catalyst agg (map-side combine absorbs the skew
        # itself; the controller is overhead-only — kept as the default
        # because it IS the right plan for combinable aggs). 'process':
        # keyed applyInPandas stage (no map-side combine — the Flink
        # keyed-stream analog where the reroute genuinely pays).
        self.engine = engine
        if sink is None:
            # driver-side dict mode is test/bench-only: per-key results
            # accumulate in driver memory, which is unbounded in the key
            # cardinality. Loud by default so a production topology can't
            # silently ship without the upsert sink.
            import warnings

            warnings.warn(
                "ReshapeStreamingAgg without a PartialUpsertSink collects "
                "per-key aggregates to the driver — test/bench convenience "
                "only; pass sink=PartialUpsertSink(...) for the scale path",
                RuntimeWarning,
                stacklevel=2,
            )
        self.controller = ReshapeController(conf)
        self.results: dict = {}  # key -> (cnt, sum)
        self.batches_seen = 0
        self.routing_history: list[dict] = []
        self.listener: "ReshapeProgressListener | None" = None

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        routing = self.controller.routing() if self.conf.enabled else {}
        self.routing_history.append(dict(routing))
        agg_impl = (
            keyed_process_agg if self.engine == "process"
            else salted_partial_merge_agg
        )
        agg = agg_impl(
            batch_df, self.key_col, self.value_col, routing, self.spread_col
        )
        # listener mode: observation runs out-of-band on progress events
        # (ReshapeProgressListener) — the data path never observes
        observe_now = (
            self.conf.enabled
            and self.conf.observation == "inline"
            and self.controller.due()
        )
        if self.sink is not None:
            # scale path: the idempotent upsert write materializes the
            # merged partial anyway, so the controller observes by
            # reading that small parquet back (2 tiny jobs per tick,
            # amortized by freq_ms) — the aggregation lineage is never
            # re-run and nothing key-shaped reaches the driver
            self.sink.write(agg, epoch_id)
            if observe_now:
                written = self.sink.read_epoch(epoch_id)
                if written is not None:  # None: epoch was a skipped replay
                    total, candidates = observe_candidates(
                        written, self.key_col, self.conf, self.controller.hot_keys
                    )
                    self.controller.observe(candidates, total)
        else:
            # dict mode (tests/bench): the merged result is collected
            # anyway, so the observation is derived from those rows for
            # free — zero extra Spark jobs, same controller inputs
            rows = agg.collect()
            if observe_now:
                counts = {r[self.key_col]: r["cnt"] for r in rows}
                self.controller.observe(counts, sum(counts.values()))
            for r in rows:
                k = r[self.key_col]
                cnt, sv = self.results.get(k, (0, 0.0))
                self.results[k] = (cnt + r["cnt"], sv + (r["sum_value"] or 0.0))
        self.batches_seen += 1

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Start the streaming query with this aggregator as the sink.

        ``conf.observation == "listener"`` registers a
        :class:`ReshapeProgressListener` (stored on ``self.listener``;
        the caller owns ``spark.streams.removeListener`` on teardown).
        The query gets a unique name so the listener only reacts to its
        own progress events."""
        import uuid

        writer = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
        )
        if self.conf.enabled and self.conf.observation == "listener":
            if self.sink is None:
                raise ValueError(
                    "listener-driven observation polls the upsert sink "
                    "(the MetricStore analog); pass sink=PartialUpsertSink(...)"
                )
            name = f"reshape_{uuid.uuid4().hex[:12]}"
            self.listener = ReshapeProgressListener(self, name)
            stream_df.sparkSession.streams.addListener(self.listener)
            writer = writer.queryName(name)
        return writer.start()


try:  # StreamingQueryListener needs a live JVM bridge at import in some
    from pyspark.sql.streaming import StreamingQueryListener as _SQL
except ImportError:  # pragma: no cover - pyspark always ships it
    _SQL = object


class ReshapeProgressListener(_SQL):
    """Listener-driven controller observation — the control-plane analog
    of the reference's JobMaster timer polling the MetricFetcher
    (ControllerSimulator.scala:52-94 schedules the poll;
    createSubtaskBackPressureInfo:157-172 reads per-subtask input counts
    from the MetricStore). Here the poll source is the
    ``StreamingQueryListener`` progress event and the "metric store" is
    the PartialUpsertSink's just-written per-epoch partial: on each
    ``onQueryProgress`` for the attached query (and at most once per
    ``freq_ms``, the reshapeFreq analog) the listener reads that small
    parquet back, reduces it to the bounded heavy-hitter candidate set
    (``observe_candidates``) and feeds one controller iteration.

    The data path (``process_batch``) never observes in this mode — the
    controller thread and the micro-batch thread share only the routing
    dict (single atomic reference swap per iteration, same coupling the
    reference has between the JobMaster timer and the running workers).

    Enable with ``spark.reshape.observation=listener`` /
    ``ReshapeConf(observation="listener")``; requires the upsert sink.
    The owner removes the listener via ``spark.streams.removeListener``
    after the query terminates.
    """

    def __init__(self, agg: "ReshapeStreamingAgg", query_name: str):
        self._agg = agg
        self._query_name = query_name
        self.ticks = 0  # controller iterations driven by this listener

    def onQueryStarted(self, event):  # noqa: N802 (listener API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        if p.name != self._query_name:
            return
        agg = self._agg
        if not (agg.conf.enabled and agg.controller.due()):
            return
        written = agg.sink.read_epoch(p.batchId)
        if written is None:  # replayed/skipped epoch: nothing new to read
            return
        total, candidates = observe_candidates(
            written, agg.key_col, agg.conf, agg.controller.hot_keys
        )
        agg.controller.observe(candidates, total)
        self.ticks += 1

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass
