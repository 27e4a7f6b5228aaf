"""Measure maintained-face probe read amplification vs epoch count.

VERDICT r12 #6: a long-running maintenance stream accumulates one small
parquet file per epoch; probe cost then grows with STREAM AGE (listing +
footer reads + tiny row groups), not data size. This script quantifies
that for the two faces with the most probe traffic — LSH signatures
(probe = one (table_id, bucket) cell) and BM25 postings (probe = a few
terms' posting lists) — at 10/100/500 epochs, before and after
``compact_index``, holding ROW COUNT CONSTANT so the delta is purely
layout.

The epoch layout is synthesized directly (one partitionBy write, then a
rename pass into the face's ``epoch_<id>/`` naming) — building 500 real
micro-batches would measure stream startup, not read amplification; the
read path (`_read_maintained`: explicit schema + recursiveFileLookup)
cannot tell the difference by construction.

Usage: python scripts/face_read_amplification.py
Output: one markdown table per face (paste into BASELINE.md), plus the
compaction_policy verdict at each epoch count.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.session import get_spark  # noqa: E402
from tickdb_spark.streaming.index import (  # noqa: E402
    _POSTING_SCHEMA,
    _SIG_SCHEMA,
    _read_maintained,
    compact_index,
    compaction_policy,
)

EPOCH_COUNTS = (10, 100, 500)
REPS = 3


def _epochify(df, dest: str, n_epochs: int) -> None:
    """Write df split across n_epochs epoch_<id>/ subdirs (the face's
    idempotent-write layout) with ONE Spark job + a rename pass."""
    tmp = dest + "_stage"
    (
        df.withColumn("epoch", F.abs(F.hash(*df.columns)) % n_epochs)
        .repartition("epoch")
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(tmp)
    )
    os.makedirs(dest, exist_ok=True)
    for name in os.listdir(tmp):
        if name.startswith("epoch="):
            os.rename(
                os.path.join(tmp, name),
                os.path.join(dest, f"epoch_{name.split('=', 1)[1]}"),
            )
    shutil.rmtree(tmp)


def _probe_min(fn) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="face_amp_")

    # --- LSH signature face: 100k vecs x 24 tables = 2.4M rows ---------
    sigs = spark.range(100_000 * 24).select(
        (F.col("id") % 100_000).alias("vec_id"),
        (F.col("id") % 24).cast("int").alias("table_id"),
        F.pmod(F.hash("id"), 4096).cast("int").alias("bucket"),
    )
    # --- BM25 postings face: 100k docs x ~30 terms = 3M rows -----------
    posts = spark.range(3_000_000).select(
        F.concat(F.lit("tok"), (F.pmod(F.hash("id"), 20_000)).cast("string")).alias(
            "token"
        ),
        (F.col("id") % 100_000).alias("doc_id"),
        (F.col("id") % 5 + 1).cast("long").alias("tf"),
        F.lit(30).cast("long").alias("dl"),
    )

    faces = [
        (
            "lsh_signatures",
            sigs,
            _SIG_SCHEMA,
            ["table_id", "bucket"],
            lambda df: df.where(
                (F.col("table_id") == 3) & (F.col("bucket") == 1234)
            ).count(),
        ),
        (
            "bm25_postings",
            posts,
            _POSTING_SCHEMA,
            ["token"],
            lambda df: df.where(
                F.col("token").isin("tok17", "tok4242", "tok9999")
            ).count(),
        ),
    ]

    for name, df, schema, sort_cols, probe in faces:
        df = df.localCheckpoint(eager=True)  # freeze: layout is the variable
        print(f"\n## {name} probe latency vs epoch count (min of {REPS})\n")
        print("| epochs | files | probe (log) s | probe (compacted) s | policy |")
        print("|---|---|---|---|---|")
        for e in EPOCH_COUNTS:
            d = os.path.join(work, f"{name}_{e}")
            _epochify(df, d, e)
            log_t = _probe_min(lambda: probe(_read_maintained(spark, d, schema)))
            pol = compaction_policy(d)
            dest = compact_index(spark, d, schema, sort_cols=sort_cols)
            comp_t = _probe_min(
                lambda: probe(spark.read.schema(schema).parquet(dest))
            )
            n_files = pol["files"]
            due = "DUE: " + "; ".join(pol["reasons"]) if pol["due"] else "ok"
            print(
                f"| {e} | {n_files} | {log_t:.3f} | {comp_t:.3f} | {due} |"
            )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
