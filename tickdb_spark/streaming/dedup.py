"""Streaming incremental deduplication — the streaming face of
``operators/dedup.incremental_exact_dedup``.

A document stream dedups continuously against a persistent fingerprint
table: each micro-batch (1) elects within-batch canonical keepers (min id
per content hash), (2) anti-joins the keepers against the seen-hash
table, (3) appends survivors to the kept output and their hashes to the
fingerprint table. ``foreachBatch`` is the Structured Streaming idiom for
this read-modify-append sink shape. Writes are IDEMPOTENT per epoch
(each batch overwrites its own ``epoch_<id>/`` subdirectory, and the
anti-join reads every epoch EXCEPT its own), so a crash between the
parquet writes and the checkpoint commit re-runs the epoch to the same
state: a plain append would let the re-run see its own partial
fingerprint write and either duplicate or silently drop keepers.

Scale: state is externalized to the fingerprint table (16 bytes/doc in
parquet, bucketable by hash for a co-located join) instead of Spark
streaming state, so the dedup horizon is unbounded — a watermarked
``dropDuplicates`` would bound memory by silently forgetting old hashes,
which is exactly wrong for corpus dedup. The batch side of every join is
the small side.

Determinism (what makes this oracle-checkable): the file source processes
landing files in modification-time order, one per trigger; if every
duplicate group's minimum-id member lands in a file no later than its
duplicates (the gate plants files that way — originals in id-range order,
echoes in the last file), the kept set is exactly "min doc_id per
content hash" over the whole stream, a plain window the SQL oracle
states directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

_FP_SCHEMA = T.StructType([T.StructField("content_hash", T.StringType(), False)])


def stream_dedup_ingest(
    spark: SparkSession,
    landing_dir: str,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run the dedup stream to completion (availableNow) and return the
    kept-set DataFrame ``(doc_id, content_hash)``.

    ``work_dir`` holds the three durable pieces: ``kept/`` (survivor
    rows), ``fingerprints/`` (the seen-hash table new batches anti-join
    against) and ``checkpoint/`` (stream progress).
    """
    from tickdb_spark.operators.dedup import incremental_exact_dedup

    kept_dir = os.path.join(work_dir, "kept")
    fp_dir = os.path.join(work_dir, "fingerprints")
    ckpt_dir = os.path.join(work_dir, "checkpoint")
    # Derive the kept-table read schema from the LANDING schema's id
    # field (ADVICE r10): pinning LongType here would silently misread
    # the kept files if the landing id type ever changes — the two
    # schemas must agree by construction, not by parallel edits.
    landing_schema = batch_schema(id_col, text_col)
    kept_schema = T.StructType(
        [
            landing_schema[id_col],
            T.StructField("content_hash", T.StringType(), False),
        ]
    )
    os.makedirs(kept_dir, exist_ok=True)
    os.makedirs(fp_dir, exist_ok=True)

    def _committed_fps(s: SparkSession, own_epoch: int) -> DataFrame:
        """Every fingerprint epoch EXCEPT the handler's own: on a crash
        re-run the epoch's partial write must not feed its own
        anti-join (it would filter the keepers out and overwrite the
        kept epoch with nothing). Swap-aware (r16): a compacted-and-
        adopted ``base_<n>/`` holds committed epochs' hashes and MUST
        join the read, while absorbed replay-debris epoch dirs must
        not (their rows are in the base — the index-face ledger rule)."""
        from tickdb_spark.streaming.index import _absorbed_set

        absorbed = _absorbed_set(fp_dir)
        dirs = [
            os.path.join(fp_dir, d)
            for d in sorted(os.listdir(fp_dir))
            if os.path.isdir(os.path.join(fp_dir, d))
            and (
                d.startswith("base_")
                or (
                    d.startswith("epoch_")
                    and d != f"epoch_{own_epoch}"
                    and d not in absorbed
                )
            )
        ]
        if not dirs:
            return s.createDataFrame([], _FP_SCHEMA)
        return s.read.schema(_FP_SCHEMA).parquet(*dirs)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        s = batch.sparkSession
        seen = _committed_fps(s, epoch_id)
        res = incremental_exact_dedup(batch, seen, text_col, id_col)
        keepers = res.where(F.col("is_new")).select(id_col, "content_hash")
        # persist before the writes: both must see the same batch
        # result, and hashes feed the NEXT batch's anti-join only (within
        # this batch, exact_dedup_groups already collapsed duplicates)
        keepers.persist()
        keepers.write.mode("overwrite").parquet(
            os.path.join(kept_dir, f"epoch_{epoch_id}")
        )
        keepers.select("content_hash").write.mode("overwrite").parquet(
            os.path.join(fp_dir, f"epoch_{epoch_id}")
        )
        keepers.unpersist()

    stream = (
        spark.readStream.schema(batch_schema(id_col, text_col))
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema(kept_schema)
        .option("recursiveFileLookup", "true")
        .parquet(kept_dir)
    )


def batch_schema(id_col: str = "doc_id", text_col: str = "text") -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(text_col, T.StringType(), True),
        ]
    )
