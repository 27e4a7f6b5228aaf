"""Streaming ingest + windowed aggregation.

Reference parity: the reference ingests via HTTP POST batches
(``handlers.go:57-77``) and treats late/out-of-order points as ordinary
tree inserts (``node.go:229-245``). The Spark-native equivalents:

* **stream_ingest** — ``readStream`` over a landing directory of JSON doc
  batches → normalize to the canonical tick schema → ``foreachBatch``
  append through the SAME batch append path (atomic-visible commits, LWW
  via per-epoch ingest_seq). foreachBatch is the Structured Streaming
  idiom for MERGE-style sinks; checkpointing gives exactly-once appends.
* **windowed_bucket_agg** — the reference's bucket-aggregate operator
  (D3) as a continuous query: watermark bounds state, tumbling window =
  calendar bucket. Late data within the watermark updates its bucket,
  mirroring the reference's out-of-order insert semantics with an
  explicit, bounded lateness contract instead of an unbounded one.

Scale: the aggregation state is (series × open windows) rows — watermark
keeps it finite; ``foreachBatch`` appends are partitioned the same as
batch ingest, so downstream queries are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from tickdb_spark import ingest as _ingest
from tickdb_spark.schema import ns_to_ts

#: Landing-file schema for streaming doc batches (JSON lines):
#: {"time": "...", "index": "...", "value": {"field": 1.0}}
STREAM_DOC_SCHEMA = T.StructType(
    [
        T.StructField("time", T.StringType(), False),
        T.StructField("index", T.StringType(), False),
        T.StructField("value", T.MapType(T.StringType(), T.DoubleType()), False),
    ]
)


def _doc_schema(evolved_fields: "T.StructType | None") -> T.StructType:
    """The doc schema, optionally EVOLVED with extra nullable top-level
    fields (the docstats-face pattern applied to the ingest stream):
    restart the stream with the evolved schema and the same checkpoint —
    already-processed files are never re-read, new files carry the
    column, and ``ingest.read_ticks(evolved_fields=)`` NULL-backfills
    the pre-evolution partitions on read."""
    if evolved_fields is None:
        return STREAM_DOC_SCHEMA
    return T.StructType(
        list(STREAM_DOC_SCHEMA.fields)
        + [T.StructField(f.name, f.dataType, True) for f in evolved_fields.fields]
    )


def read_doc_stream(
    spark: SparkSession,
    landing_dir: str,
    evolved_fields: "T.StructType | None" = None,
) -> DataFrame:
    """File-source stream of ingest docs (the test/local stand-in for a
    Kafka topic; swap ``format`` only).

    One landing file per micro-batch: a file is the ingest-batch unit —
    the analogue of one reference HTTP POST — so each file gets its own
    ingest_seq and cross-file LWW ordering is well defined. (Within a
    single file, duplicate (series, ts) resolve arbitrarily; batch HTTP
    ingest dedups in order driver-side, see ingest.normalize_docs.)

    ``evolved_fields``: see :func:`_doc_schema` — JSON docs missing an
    evolved field parse it as NULL, so mixed landing dirs are safe."""
    return (
        spark.readStream.schema(_doc_schema(evolved_fields))
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )


def docs_from_bus(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Message-bus payload → doc frame: each record's payload column is
    ONE JSON ingest doc (the exact body one reference HTTP POST row
    carries, ``handlers.go:57-77``). Works on any frame with a binary or
    string payload column — Kafka (``value`` binary), Kinesis (``data``),
    Pulsar — batch or streaming; pure column expressions, so it runs
    incrementally. Malformed payloads parse to NULL fields and are
    dropped (a poison message must not kill the ingest query).

    Landing-dir → Kafka mapping: one landing FILE is one micro-batch
    (``maxFilesPerTrigger=1``) and one ingest_seq; on Kafka the
    micro-batch is the trigger interval's offset range, and ingest_seq
    is the foreachBatch epoch — LWW ordering across epochs is identical.
    Within-batch duplicate (series, ts) resolve arbitrarily in BOTH
    shapes (same caveat as a single landing file)."""
    parsed = F.from_json(F.col(value_col).cast("string"), STREAM_DOC_SCHEMA)
    return (
        raw.select(parsed.alias("_doc"))
        .where(F.col("_doc").isNotNull() & F.col("_doc.time").isNotNull())
        .select("_doc.time", "_doc.index", "_doc.value")
    )


def read_doc_stream_bus(
    spark: SparkSession,
    fmt: str,
    options: dict,
    value_col: str = "value",
) -> DataFrame:
    """Generic ``readStream`` adapter: any source format whose records
    carry one JSON doc per payload drives the same ingest pipeline as
    the file landing dir. Kafka shape::

        read_doc_stream_bus(spark, "kafka", {
            "kafka.bootstrap.servers": "...:9092",
            "subscribe": "ticks",
            "startingOffsets": "earliest",
        })

    then ``normalize_stream`` → :func:`stream_ingest_source` exactly as
    the file path does. (No Kafka broker in this sandbox: the payload
    parse is proven batch+streaming by
    ``tests/test_streaming.py::test_docs_from_bus_*``, and the
    source-agnostic sink by ``test_stream_ingest_from_rate_source``.)"""
    reader = spark.readStream.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return docs_from_bus(reader.load(), value_col)


def normalize_stream(
    docs: DataFrame, evolved_fields: "T.StructType | None" = None
) -> DataFrame:
    """Doc stream → canonical tick columns (parse time to ns, derive
    ts_utc). Pure column expressions — runs incrementally. Evolved
    top-level fields pass through after the canonical columns."""
    extra = list(evolved_fields.fieldNames()) if evolved_fields is not None else []
    ts_ns = (F.unix_micros(F.to_timestamp("time")) * 1000).alias("ts")
    return docs.select(
        F.col("index").alias("series"),
        ts_ns,
        F.col("value").alias("value"),
        *extra,
    ).withColumn("ts_utc", ns_to_ts(F.col("ts")))


def stream_ingest_source(
    ticks: DataFrame,
    db_path: str,
    checkpoint_dir: str,
    maintain_rollups: bool = False,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Source-agnostic continuous ingest: ANY streaming frame with the
    canonical tick columns (series, ts, value, ts_utc) — a file landing
    dir, a ``rate``/``rate-micro-batch`` source, a Kafka topic — drives
    the same foreachBatch sink. Each micro-batch goes through the batch
    append path, so visibility, LWW ordering and the partition layout are
    identical to HTTP-style batch ingest regardless of the source
    (proven on a non-file source by
    ``tests/test_streaming.py::test_stream_ingest_from_rate_source``).

    ``maintain_rollups=True`` runs an incremental rollup refresh after
    each micro-batch — the streaming form of the reference's on-insert
    rollup maintenance (``node.go:213-226``): only the (series, dt)
    partitions the batch touched are re-reduced, so coarse queries stay
    rollup-served with bounded per-batch maintenance cost.

    ``trigger`` defaults to ``{"availableNow": True}`` (drain-and-stop);
    unbounded sources pass e.g. ``{"processingTime": "1 second"}``."""
    spark = ticks.sparkSession
    db_path = str(db_path)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _ingest.append_batch(db_path, batch_df)
        if maintain_rollups:
            from tickdb_spark.rollup import RollupStore

            store = RollupStore(spark, db_path)
            if store.available():
                store.refresh_incremental()

    return (
        ticks.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger if trigger is not None else {"availableNow": True}))
        .start()
    )


def stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    db_path: str,
    checkpoint_dir: str,
    maintain_rollups: bool = False,
    evolved_fields: "T.StructType | None" = None,
) -> StreamingQuery:
    """File-landing wrapper over :func:`stream_ingest_source` (the
    test/local stand-in for a message bus — swap the source only).

    ``evolved_fields`` is mid-stream SCHEMA EVOLUTION of the MAIN
    warehouse: stop the stream, restart with the evolved field list and
    the SAME checkpoint — the file source resumes after the processed
    set, later batches append the new column to their partitions, and
    the LWW view NULL-backfills older partitions via
    ``ingest.read_ticks(evolved_fields=)``. No footer merge, no
    partition rewrite, no checkpoint reset."""
    ticks = normalize_stream(
        read_doc_stream(spark, landing_dir, evolved_fields), evolved_fields
    )
    return stream_ingest_source(
        ticks, db_path, checkpoint_dir, maintain_rollups=maintain_rollups
    )


def windowed_bucket_agg(
    ticks: DataFrame,
    field: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming D3: per-series tumbling-window sum/count/min/max over one
    field, with late data accepted up to the watermark. Output mode
    'append' emits a bucket once its watermark passes — the streaming
    contract for 'one row per non-empty bucket'."""
    v = F.col("value").getItem(field)
    return (
        ticks.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", window).alias("win"), "series")
        .agg(
            # decimal accumulation -> the sum is partition-order-independent
            # and bit-identical to any other engine's decimal sum (the same
            # discipline as every batch double-SUM in the query bank)
            F.sum(v.cast("decimal(18,6)")).cast("double").alias(f"{field}_sum"),
            F.count(v).alias(f"{field}_count"),
            F.min(v).alias(f"{field}_min"),
            F.max(v).alias(f"{field}_max"),
        )
        .select(
            "series",
            F.unix_micros(F.col("win.start")).alias("bucket_us"),
            f"{field}_sum",
            f"{field}_count",
            f"{field}_min",
            f"{field}_max",
        )
    )


def session_gap_agg(
    ticks: DataFrame,
    field: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: events on one series closer than ``gap``
    merge into one session window (``F.session_window`` — dynamic-length
    state, unlike the fixed tumbling buckets of windowed_bucket_agg).
    A session closes, and is emitted, once the watermark passes its end.

    The batch twin is the lag+running-sum sessionizer behind the
    ``sessionize_user_events`` gate query; this is the continuous form
    with bounded state (open sessions × series, capped by the watermark).
    """
    v = F.col("value").getItem(field)
    return (
        ticks.withWatermark("ts_utc", watermark)
        .groupBy("series", F.session_window("ts_utc", gap).alias("win"))
        .agg(
            F.count(v).alias("n_events"),
            # same decimal discipline as windowed_bucket_agg: order-free sum
            F.sum(v.cast("decimal(18,6)")).cast("double").alias(f"{field}_sum"),
        )
        .select(
            "series",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            F.unix_micros(F.col("win.end")).alias("session_end_us"),
            "n_events",
            f"{field}_sum",
        )
    )
