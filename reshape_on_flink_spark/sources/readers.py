"""Sources & sinks — reference §2.1 (connectors + formats).

The reference ships 31 connector modules and 7 format modules
(``flink-connectors/``, ``flink-formats/``). This engine's v1 surface is
the file-based core (parquet/csv/json/orc — all DataSource V2 with
pushdown) plus the streaming sources in ``streaming/source.py`` (file
replay, rate/datagen). JDBC lives below; kafka + avro live in
``sources/kafka.py`` — config assembly and wire-format plumbing fully
built and tested, classpath-probed activation with loud errors naming
the exact package coordinate when the jar is absent.

Scale notes: always pass an explicit schema for csv/json (inference scans
the data twice and types drift between runs); parquet/orc carry schemas
and support predicate pushdown + column pruning (asserted in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from reshape_on_flink_spark.session import ensure_confs

FORMATS = ("parquet", "orc", "json", "csv", "text")
#: read-only formats: fixed schemas defined by Spark, no write path.
#: binaryFile = (path, modificationTime, length, content) — the raw-media
#: ingestion door for the multimodal pipeline (llm/multimodal.py): read a
#: directory of image/audio files as binary rows, then mapInPandas-decode.
READ_ONLY_FORMATS = ("binaryFile",)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched batch read (CommonExecTableSourceScan analog)."""
    ensure_confs(spark)
    if (
        fmt not in FORMATS
        and fmt not in READ_ONLY_FORMATS
        and not _optional_format_available(spark, fmt)
    ):
        raise ValueError(f"format {fmt!r} unavailable; built-ins: {FORMATS + READ_ONLY_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} reads require an explicit schema (no inference in this engine)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-dispatched batch write (CommonExecSink analog).

    ``partition_by`` maps to hive-style directory partitioning — the
    100 TB layout lever: partition on the dominant filter column (date)
    so partition pruning skips data before any scan."""
    if fmt in READ_ONLY_FORMATS:
        raise ValueError(f"format {fmt!r} is read-only (no Spark write path)")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (+optionally sorted) table write — the co-located-join
    layout lever at 100 TB: the shuffle on the bucket key is paid ONCE
    at write time, and every later equi-join or aggregation on that key
    between same-bucketed tables runs exchange-free (asserted in
    tests/test_plans.py::test_bucketed_join_is_exchange_free). Size
    ``n_buckets`` so one bucket of the LARGEST co-bucketed table is a
    few hundred MB (e.g. 100 TB fact / 4096 buckets ≈ 25 GB... use
    32768 for ~3 GB, or bucket per date partition). ``sort_cols``
    additionally pre-sorts within buckets, turning later sort-merge
    joins into merge-only.

    Bucket metadata lives in the session catalog, so this is a
    ``saveAsTable`` path (``path`` pins the file location for an
    external table); plain ``save()`` cannot record bucketing.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def _optional_format_available(spark: SparkSession, fmt: str) -> bool:
    """Probe for optional DataSource registrations (avro, kafka...)."""
    try:
        spark.read.format(fmt).schema("x int").load("/nonexistent__probe__")
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find" not in str(e) and "ClassNotFound" not in str(e)


def datagen(
    spark: SparkSession,
    n_rows: int,
    *,
    n_keys: int = 100,
    seed: int = 42,
    skew_hot_share: float = 0.0,
) -> DataFrame:
    """Deterministic synthetic batch table (DataGenTableSource analog):
    (id, key, value, payload). With ``skew_hot_share`` > 0, key 0
    receives that share of rows (for skew-layer experiments)."""
    base = spark.range(n_rows)
    uniform = F.pmod(F.hash(F.col("id") + seed), F.lit(n_keys))
    if skew_hot_share > 0:
        threshold = int(skew_hot_share * 100)
        key = F.when(F.pmod(F.hash(F.col("id") * 31 + seed), F.lit(100)) < threshold, F.lit(0)).otherwise(uniform)
    else:
        key = uniform
    return base.select(
        "id",
        key.alias("key"),
        (F.pmod(F.hash(F.col("id") + seed * 7), F.lit(10_000)) / 100.0).alias("value"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


def idempotent_foreach_batch(write_fn, marker_dir: str):
    """Exactly-once sink semantics for arbitrary foreachBatch writers.

    Reference parity: Flink's exactly-once sinks (TwoPhaseCommitSinkFunction
    / checkpoint-coordinated commits, CheckpointCoordinator.java:96). Spark
    guarantees foreachBatch is called with a monotonically increasing
    batch_id and re-calls the SAME id after a restart — so exactly-once
    reduces to idempotence per batch_id. This wraps any ``write_fn(df)``:
    a commit marker per batch_id is written AFTER the sink write; replayed
    ids with an existing marker are skipped.

    The marker write itself is the atomic commit point (single rename on
    any POSIX/object store with atomic rename); if the process dies
    between sink write and marker, the batch replays — so ``write_fn``
    must be overwrite-by-batch (e.g., write to a batch_id-keyed path or
    MERGE on a key), which is exactly the contract Flink's 2PC sinks
    impose on their pre-commit phase.
    """
    import os

    os.makedirs(marker_dir, exist_ok=True)

    def write(df, batch_id: int):
        marker = os.path.join(marker_dir, f"batch_{batch_id}.done")
        if os.path.exists(marker):
            return
        write_fn(df, batch_id)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed")
        os.rename(tmp, marker)

    return write


def write_jdbc(
    df,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
    **options,
):
    """JDBC sink (reference flink-connectors/flink-connector-jdbc).

    Scale: one JDBC connection per partition writes batched inserts —
    ``df.repartition(n)`` controls sink concurrency; the RDBMS, not
    Spark, is the bottleneck at 100 TB (use partitioned staging +
    LOAD/COPY for bulk loads)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "driver", driver
    )
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def read_jdbc(
    spark,
    url: str,
    table: str,
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
    partition_column: str | None = None,
    num_partitions: int = 1,
    lower_bound=None,
    upper_bound=None,
    **options,
):
    """JDBC source with optional range-partitioned parallel read (the
    reference's JdbcNumericBetweenParametersProvider split). Filters and
    column pruning push into the generated SQL (DSv1 JDBC pushdown)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table).option(
        "driver", driver
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_sequence_file(df: DataFrame, path: str, key_col: str, value_col: str) -> None:
    """Hadoop SequenceFile sink (reference flink-formats/
    flink-sequence-file SequenceFileWriterFactory): (key, value) Text
    pairs via the RDD bridge — Spark has no DataFrame-level sequence
    format, but the Hadoop IO machinery is in the JVM already."""
    df.select(
        F.col(key_col).cast("string"), F.col(value_col).cast("string")
    ).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    """SequenceFile source -> (key string, value string) DataFrame
    (reference flink-hadoop-compatibility SequenceFile input). Text
    keys/values; a production variant parameterizes the Writable
    classes the same way the reference factory does."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, "key string, value string")
