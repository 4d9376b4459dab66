"""Kafka source/sink + avro format — config assembly and wire plumbing.

Reference surface: the flagship streaming connector
(flink-connectors/flink-connector-kafka/src/main/java/org/apache/flink/
streaming/connectors/kafka/FlinkKafkaConsumer.java, FlinkKafkaProducer)
and the avro format (flink-formats/flink-avro). Spark's equivalents are
the ``kafka`` DSv2 source/sink (spark-sql-kafka-0-10 package) and
``from_avro``/``to_avro`` (spark-avro package) — neither jar ships in
this sandbox, so this module splits each connector into:

1. **Pure config assembly** (``kafka_source_options`` /
   ``kafka_sink_options``) — the full option dict Spark's kafka DSv2
   consumes, unit-testable with no jar.
2. **Wire-format plumbing** (``decode_kafka_value`` /
   ``encode_kafka_value``) — kafka rows carry ``key``/``value`` as
   BINARY; json/csv decode uses core Spark (``from_json``/``from_csv``,
   fully tested here), avro dispatches to ``pyspark.sql.avro.functions``
   behind an import probe.
3. **Activation** (``kafka_source`` / ``kafka_sink``) — probes the
   classpath and either builds the real readStream/writeStream or raises
   a loud error naming the exact ``--packages`` coordinate to add.

Delivery semantics mapping (documented divergence): Flink's
exactly-once FlinkKafkaProducer is a Kafka-transactions 2PC; Spark's
kafka sink is at-least-once — wrap the write in
``sources.readers.idempotent_foreach_batch`` for the effectively-once
pattern, or rely on downstream idempotent keys.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Spark package coordinates needed to activate each optional connector
#: (version must match the Spark build; 4.x shown).
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0"
AVRO_PACKAGE = "org.apache.spark:spark-avro_2.13:4.0.0"

#: Kafka wire schema — every kafka DSv2 row has exactly these columns
#: (key/value BINARY + metadata), independent of the payload format.
KAFKA_WIRE_COLUMNS = (
    "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"
)


def kafka_source_options(
    bootstrap_servers: str,
    *,
    topics: list[str] | None = None,
    topic_pattern: str | None = None,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: str | dict = "earliest",
    ending_offsets: str | dict | None = None,
    group_id_prefix: str | None = None,
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
    **extra: str,
) -> dict[str, str]:
    """Assemble the full kafka-source option dict (FlinkKafkaConsumer's
    constructor surface: topics | pattern | explicit partitions, offset
    initializer, consumer props).

    Exactly one of ``topics`` / ``topic_pattern`` / ``assign`` must be
    given — mirroring the reference's three subscription modes.
    ``starting_offsets``/``ending_offsets`` accept "earliest"/"latest"
    or a {topic: {partition: offset}} dict (serialized to the JSON form
    Spark expects).
    """
    modes = [m for m in (topics, topic_pattern, assign) if m]
    if len(modes) != 1:
        raise ValueError("exactly one of topics / topic_pattern / assign required")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if topics:
        opts["subscribe"] = ",".join(topics)
    elif topic_pattern:
        opts["subscribePattern"] = topic_pattern
    else:
        opts["assign"] = json.dumps(assign)
    opts["startingOffsets"] = (
        starting_offsets if isinstance(starting_offsets, str) else json.dumps(starting_offsets)
    )
    if ending_offsets is not None:
        opts["endingOffsets"] = (
            ending_offsets if isinstance(ending_offsets, str) else json.dumps(ending_offsets)
        )
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix
    opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in extra.items():  # passthrough consumer properties
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = str(v)
    return opts


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Assemble the kafka-sink option dict (FlinkKafkaProducer surface).
    ``topic=None`` means the DataFrame provides a ``topic`` column
    (reference: KeyedSerializationSchema#getTargetTopic)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic is not None:
        opts["topic"] = topic
    for k, v in extra.items():
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = str(v)
    return opts


def decode_kafka_value(
    df: DataFrame,
    fmt: str,
    schema: str,
    *,
    options: dict | None = None,
    keep_metadata: bool = False,
) -> DataFrame:
    """Decode the BINARY ``value`` column per format into typed columns
    (the reference's DeserializationSchema step).

    json/csv run on core Spark (``from_json``/``from_csv``); avro needs
    the spark-avro package (loud ImportError naming the coordinate).
    ``schema`` is a DDL string for json/csv, an avro JSON schema for
    avro. With ``keep_metadata`` the kafka columns (topic/partition/
    offset/timestamp) survive next to the decoded payload.
    """
    meta = [c for c in KAFKA_WIRE_COLUMNS if c in df.columns and c not in ("key", "value")]
    if fmt == "json":
        parsed = F.from_json(F.col("value").cast("string"), schema, options or {})
    elif fmt == "csv":
        parsed = F.from_csv(F.col("value").cast("string"), schema, options or {})
    elif fmt == "avro":
        parsed = _avro_call("from_avro", F.col("value"), schema, options or {})
    else:
        raise ValueError(f"unsupported kafka value format: {fmt!r}")
    out = df.select(*meta, parsed.alias("v")) if keep_metadata else df.select(parsed.alias("v"))
    return out.select(*meta, "v.*") if keep_metadata else out.select("v.*")


def encode_kafka_value(
    df: DataFrame,
    fmt: str,
    *,
    key_col: str | None = None,
    topic_col: str | None = None,
) -> DataFrame:
    """Encode typed columns into the kafka sink contract: ``value``
    BINARY (+ optional ``key``/``topic``). json uses core Spark
    (``to_json`` over a struct of all payload columns); avro dispatches
    to ``to_avro`` behind the import probe."""
    payload = [c for c in df.columns if c not in (key_col, topic_col)]
    struct = F.struct(*payload)
    if fmt == "json":
        value = F.to_json(struct).cast("binary")
    elif fmt == "avro":
        value = _avro_call("to_avro", struct)
    else:
        raise ValueError(f"unsupported kafka value format: {fmt!r}")
    cols = [value.alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").cast("binary").alias("key"))
    if topic_col is not None:
        cols.append(F.col(topic_col).alias("topic"))
    return df.select(*cols)


def _avro_call(name: str, *args):
    """Dispatch to pyspark.sql.avro.functions; the python module ships
    with pyspark but the JVM side needs the spark-avro jar — a missing
    jar surfaces as py4j's 'JavaPackage not callable' TypeError, which we
    convert into a loud activation error."""
    try:
        import pyspark.sql.avro.functions as A

        return getattr(A, name)(*args)
    except (ImportError, TypeError) as e:
        raise RuntimeError(
            f"avro format needs the spark-avro package on the classpath: "
            f"spark-submit --packages {AVRO_PACKAGE}"
        ) from e


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro jar is on the classpath."""
    try:
        _avro_call("from_avro", F.lit(b""), '{"type":"string"}')
        return True  # pragma: no cover - jar-present env only
    except RuntimeError:
        return False


def kafka_available(spark: SparkSession) -> bool:
    """True iff the kafka DSv2 source is on the classpath."""
    try:
        spark.readStream.format("kafka").load()
        return True  # pragma: no cover - jar-present env only
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # missing required option => provider resolved => jar present
        return "kafka.bootstrap.servers" in msg or "subscribe" in msg


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    *,
    fmt: str = "json",
    schema: str | None = None,
    streaming: bool = True,
    **source_kwargs,
) -> DataFrame:
    """Streaming (or batch) kafka read, decoded per ``fmt``. Raises a
    loud RuntimeError naming the activation package when the jar is
    absent — the config assembly above stays testable regardless."""
    opts = kafka_source_options(bootstrap_servers, **source_kwargs)
    if not kafka_available(spark):
        raise RuntimeError(
            f"kafka connector not on the classpath; launch with "
            f"spark-submit --packages {KAFKA_PACKAGE}"
        )
    reader = (spark.readStream if streaming else spark.read).format("kafka").options(**opts)
    raw = reader.load()  # pragma: no cover - jar-present env only
    if schema is None:  # pragma: no cover
        return raw
    return decode_kafka_value(raw, fmt, schema, keep_metadata=True)  # pragma: no cover


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str | None = None,
    *,
    fmt: str = "json",
    checkpoint: str | None = None,
    key_col: str | None = None,
    **sink_kwargs,
):
    """Streaming kafka write: encode + writeStream. At-least-once (see
    module docstring for the exactly-once wrapper). Returns the
    DataStreamWriter so the caller owns trigger/start."""
    opts = kafka_sink_options(bootstrap_servers, topic, **sink_kwargs)
    spark = df.sparkSession
    if not kafka_available(spark):
        raise RuntimeError(
            f"kafka connector not on the classpath; launch with "
            f"spark-submit --packages {KAFKA_PACKAGE}"
        )
    encoded = encode_kafka_value(df, fmt, key_col=key_col)  # pragma: no cover
    writer = encoded.writeStream.format("kafka").options(**opts)  # pragma: no cover
    if checkpoint:  # pragma: no cover
        writer = writer.option("checkpointLocation", checkpoint)
    return writer  # pragma: no cover


# ---------------------------------------------------------------------------
# File-backed mock broker — an in-process stand-in honoring the kafka
# DSv2 *contract* (wire schema, subscription modes, starting offsets) so
# the full produce -> stream -> decode -> encode pipeline moves real
# bytes end-to-end without the connector jar. The mock is a topic log on
# disk: parquet segments with monotonically assigned per-(topic,
# partition) offsets, read back as a file-source stream projected to
# KAFKA_WIRE_COLUMNS. Swap mock_kafka_stream for kafka_source (same
# downstream code) once the jar is present — that is the only line that
# changes.
# ---------------------------------------------------------------------------

#: The kafka DSv2 row schema (spark-sql-kafka-0-10 KafkaRecordToRowConverter).
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def mock_kafka_produce(
    spark: SparkSession,
    broker_dir: str,
    topic: str,
    records: list[tuple[bytes | None, bytes]],
    partition: int = 0,
) -> int:
    """Append records to the mock topic log, assigning contiguous
    offsets per (topic, partition) exactly as a broker would. Returns
    the first assigned offset."""
    import datetime as _dt
    import os

    os.makedirs(broker_dir, exist_ok=True)
    meta_path = os.path.join(broker_dir, "_offsets.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    tp = f"{topic}/{partition}"
    base = int(meta.get(tp, 0))
    now = _dt.datetime.now(tz=_dt.timezone.utc).replace(tzinfo=None)
    rows = [
        (k, v, topic, partition, base + i, now, 0)  # 0 = CreateTime
        for i, (k, v) in enumerate(records)
    ]
    df = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(os.path.join(broker_dir, "log"))
    meta[tp] = base + len(records)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return base


def mock_kafka_stream(
    spark: SparkSession, broker_dir: str, options: dict[str, str]
) -> DataFrame:
    """A streaming DataFrame over the mock log, honoring the assembled
    kafka-source options (the SAME dict kafka_source_options builds):

    - ``subscribe`` (topic list), ``subscribePattern`` (regex),
      ``assign`` ({topic: [partitions]} JSON) select the records;
    - ``startingOffsets``: "earliest" or the per-partition JSON form
      ({topic: {partition: offset}}); "latest" has no meaning for a
      bounded replay log and raises.

    Consumer passthrough options (kafka.*) and rate limits are accepted
    and ignored — they configure a broker/client the mock doesn't have.
    """
    import os

    raw = (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(broker_dir, "log"))
    )
    if "subscribe" in options:
        raw = raw.where(F.col("topic").isin(options["subscribe"].split(",")))
    elif "subscribePattern" in options:
        raw = raw.where(F.col("topic").rlike(options["subscribePattern"]))
    elif "assign" in options:
        pairs = [
            (t, p)
            for t, parts in json.loads(options["assign"]).items()
            for p in parts
        ]
        cond = None
        for t, p in pairs:
            c = (F.col("topic") == t) & (F.col("partition") == p)
            cond = c if cond is None else (cond | c)
        raw = raw.where(cond if cond is not None else F.lit(False))
    else:
        raise ValueError("options select no topics (subscribe/subscribePattern/assign)")
    start = options.get("startingOffsets", "earliest")
    if start == "latest":
        raise NotImplementedError(
            "mock broker replays a bounded log; 'latest' has no meaning here"
        )
    if start != "earliest":
        cond = F.lit(True)
        for t, parts in json.loads(start).items():
            for p, off in parts.items():
                skip = (
                    (F.col("topic") == t)
                    & (F.col("partition") == int(p))
                    & (F.col("offset") < int(off))
                )
                cond = cond & ~skip
        raw = raw.where(cond)
    return raw
