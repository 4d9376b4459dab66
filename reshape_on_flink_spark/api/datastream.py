"""DataStream-style fluent facade over DataFrames.

Reference surface: ``DataStream.java`` / ``KeyedStream.java`` /
``WindowedStream.java`` (map, filter, flatMap, keyBy, reduce, aggregate,
window, union, process). Users of the reference's DataStream API can port
programs 1:1; under the hood every call declares DataFrame operations so
Catalyst still optimizes the whole pipeline (the reference's DataStream
programs bypass its optimizer — here they don't, which is the point of
re-expressing rather than porting).

Python callables route through Arrow-batched ``mapInPandas`` /
``applyInPandas`` — the slow path; the docstrings push users toward the
expression variants (map_expr, filter_expr) which stay in codegen.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataStream:
    """Fluent wrapper; ``.df`` exposes the underlying DataFrame at any
    point (the Table<->DataStream bridge, BatchExecBoundedStreamScan /
    StreamExecDataStreamScan analog)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- stateless row ops ------------------------------------------------
    def map_expr(self, *cols: Column | str) -> "DataStream":
        """map() as column expressions — JVM-side, preferred."""
        return DataStream(self.df.select(*cols))

    def filter_expr(self, cond: Column | str) -> "DataStream":
        return DataStream(self.df.where(cond))

    def map_pandas(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str) -> "DataStream":
        """map()/flatMap() with arbitrary Python, Arrow-batched.
        ``fn`` maps a pandas batch to a pandas batch (row count may
        change, covering flatMap)."""

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn(pdf)

        return DataStream(self.df.mapInPandas(run, schema=schema))

    def union(self, other: "DataStream") -> "DataStream":
        return DataStream(self.df.unionByName(other.df))

    def side_output(self, cond: Column | str) -> tuple["DataStream", "DataStream"]:
        """OutputTag/getSideOutput analog (SingleOutputStreamOperator
        .java:383): returns (main, side) where side satisfies ``cond``.
        Both branches share one scan under Catalyst when written in the
        same job (filter-split pattern)."""
        cond = F.expr(cond) if isinstance(cond, str) else cond
        return DataStream(self.df.where(~cond)), DataStream(self.df.where(cond))

    def broadcast_connect(
        self, dim: DataFrame, on: Column, how: str = "left"
    ) -> "DataStream":
        """connect(broadcastStream) analog (DataStream.java:254-276,
        broadcast state): enrich every record against a small broadcast
        relation — per micro-batch in streaming, one broadcast hash join
        in batch."""
        return DataStream(self.df.join(F.broadcast(dim), on, how))

    # -- physical partitioning (reference streaming/runtime/partitioner/:
    # rebalance, rescale, broadcast, shuffle, forward, global, keyBy) ----
    def rebalance(self, n: int | None = None) -> "DataStream":
        """Round-robin redistribute (RebalancePartitioner)."""
        return DataStream(self.df.repartition(n) if n else self.df.repartition())

    def rescale(self, n: int) -> "DataStream":
        """Local-ish scale-down without full shuffle (RescalePartitioner
        ~ coalesce: merges co-located partitions, no exchange)."""
        return DataStream(self.df.coalesce(n))

    def partition_custom(self, n: int, *cols: str) -> "DataStream":
        """CustomPartitionerWrapper analog: hash-partition on chosen
        columns (add a salt column first for custom spreading)."""
        return DataStream(self.df.repartition(n, *[F.col(c) for c in cols]))

    def global_(self) -> "DataStream":
        """GlobalPartitioner: everything to one partition — only for
        tiny final results (a deliberate scalability cliff, as in the
        reference)."""
        return DataStream(self.df.coalesce(1))

    # -- keyed ops --------------------------------------------------------
    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self.df, list(keys))


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys

    def reduce(self, **aggs: Column) -> DataStream:
        """keyBy().reduce()/aggregate(): named aggregate expressions."""
        return DataStream(
            self.df.groupBy(*self.keys).agg(*[c.alias(n) for n, c in aggs.items()])
        )

    def process(
        self, fn: Callable[[tuple, pd.DataFrame], pd.DataFrame], schema: str
    ) -> DataStream:
        """KeyedProcessFunction analog: per-key pandas group transform
        (state/timers belong to the streaming layer —
        streaming/ops.py uses applyInPandasWithState)."""

        def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(key, pdf)

        from reshape_on_flink_spark.session import repartition_for_python_stage

        return DataStream(
            repartition_for_python_stage(self.df, list(self.keys))
            .groupBy(*self.keys)
            .applyInPandas(run, schema=schema)
        )

    def window_tumble(self, ts_col: str, size: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, F.window(ts_col, size))

    def window_hop(self, ts_col: str, size: str, slide: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, F.window(ts_col, size, slide))

    def window_session(self, ts_col: str, gap: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, F.session_window(ts_col, gap))

    def count_window(self, n: int, value_col: str, order_cols: tuple[str, ...]) -> DataStream:
        """countWindow(n) (GlobalWindows + CountTrigger): streaming-only;
        delegates to streaming.triggers.count_window_agg."""
        from reshape_on_flink_spark.streaming.triggers import count_window_agg

        if len(self.keys) != 1:
            raise ValueError("count_window supports a single key column")
        return DataStream(
            count_window_agg(
                self.df, n=n, key_col=self.keys[0], value_col=value_col, order_cols=order_cols
            )
        )

    def window_join(
        self, other: "KeyedStream", ts_col: str, size: str, suffix: str = "_r"
    ) -> DataStream:
        """DataStream window join (DataStream.java:721-729): equi-join on
        key within the same tumbling window — the window joins the
        shuffle key, bounding join state to one window."""
        left = self.df.withColumn("window", F.window(ts_col, size))
        right = other.df.withColumn("__w_r", F.window(ts_col, size))
        renames = {c: c + suffix for c in right.columns if c in left.columns}
        for old, new in renames.items():
            right = right.withColumnRenamed(old, new)
        cond = F.col("window") == F.col("__w_r")
        for lk, rk in zip(self.keys, other.keys):
            cond = cond & (F.col(lk) == F.col(renames.get(rk, rk)))
        return DataStream(left.join(right, cond).drop("__w_r"))

    def co_group(
        self,
        other: "KeyedStream",
        fn,
        schema: str,
        suffix: str = "_r",
    ) -> DataStream:
        """coGroup analog: ``fn(key, left_pdf, right_pdf) -> pdf`` via
        cogrouped applyInPandas (both sides shuffled once on the key)."""
        from reshape_on_flink_spark.session import repartition_for_python_stage

        return DataStream(
            repartition_for_python_stage(self.df, list(self.keys))
            .groupBy(*self.keys)
            .cogroup(
                repartition_for_python_stage(other.df, list(other.keys))
                .groupBy(*other.keys)
            )
            .applyInPandas(fn, schema=schema)
        )


class WindowedStream:
    def __init__(self, df: DataFrame, keys: list[str], window_col: Column):
        self.df = df
        self.keys = keys
        self.window_col = window_col

    def aggregate(self, **aggs: Column) -> DataStream:
        out = self.df.groupBy(*self.keys, self.window_col.alias("w")).agg(
            *[c.alias(n) for n, c in aggs.items()]
        )
        return DataStream(
            out.select(
                *self.keys,
                F.unix_timestamp("w.start").alias("window_start"),
                F.unix_timestamp("w.end").alias("window_end"),
                *aggs.keys(),
            )
        )
