"""Scaling curves for the r8 analytics additions (VERDICT r8 ask #6):
PMI collocations, classifier AUC, JL projection, PCA covariance, and
warehouse snapshot diff at 1x/2x/4x/8x input.

The 100-TB question per op:
- pmi:           bigram counts map-side combine; the ADVERSARIAL axis is
                 the broadcast unigram table, whose size grows with the
                 corpus-proportional vocab (scaled_docs tags every token
                 per copy) — the script reports the distinct-unigram
                 count per factor next to the wall time, and BASELINE.md
                 states the ceiling + shuffled-join fallback.
- auc:           the Mann-Whitney window runs over the per-(source,
                 distinct-score) AGGREGATE, never the corpus — rows per
                 source grow 8x while the aggregate stays score-bounded.
- jl_project:    pure per-row projection (16 fold expressions) — the
                 ingest-time column build, corpus-linear by shape.
- pca_cov:       d^2/2 quantized partial sums PER TASK (mapInPandas),
                 one final aggregate — corpus-linear, state is d^2/2
                 ints regardless of rows.
- snapshot_diff: one full-outer LWW join on (series, ts) between two
                 warehouse snapshots (warehouse build is untimed setup).

    python scripts/bench_analytics_scale.py

One JSON line per op with [1x, 2x, 4x, 8x] seconds and log2 growth
(1.0 = linear, 2.0 = quadratic; sub-linear = overhead-dominated).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench_text_ops_scale import SF_DIR, scaled_docs, scaled_events  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

FACTORS = (1, 2, 4, 8)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def scaled_labeled_docs(spark, factor: int):
    """factor-times docs keeping (source, lang) labels: copymark prefix
    changes fingerprints, score distributions stay realistic; sources are
    NOT multiplied — rows per source grow with the factor, which is the
    axis the AUC aggregate must stay bounded under."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    copies = spark.range(factor).select(F.col("id").alias("k"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") * factor + F.col("k")).alias("doc_id"),
            "source",
            "lang",
            F.concat(
                F.lit("copymark"), F.col("k").cast("string"), F.lit(" "), F.col("text")
            ).alias("text"),
        )
        .repartition(32)
    )


def scaled_embeddings(spark, factor: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = spark.range(factor).select(F.col("id").alias("k"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("vec_id") * factor + F.col("k")).alias("vec_id"), "embedding"
        )
        .repartition(32)
    )


def diff_warehouse(spark, factor: int) -> str:
    """UNTIMED setup: ingest factor-times events as ticks (seq 0), then
    LWW-upsert a deterministic slice (seq 1) so the diff has changes."""
    from tickdb_spark.ingest import append_batch

    ev = scaled_events(spark, factor)
    ticks = ev.select(
        F.col("event_type").alias("series"),
        (F.col("ts_us") * 1000).alias("ts"),
        F.timestamp_micros(F.col("ts_us")).alias("ts_utc"),
        F.create_map(F.lit("value"), F.col("value")).alias("value"),
    )
    db = os.path.join(tempfile.mkdtemp(prefix=f"ana_scale_wh{factor}_"), "db")
    os.makedirs(db)
    append_batch(db, ticks)
    upd = ticks.where(F.col("ts") % 7 == 0).withColumn(
        "value", F.create_map(F.lit("value"), F.lit(999.0))
    )
    append_batch(db, upd)
    return db


def main() -> None:
    spark = get_spark(
        app_name="analytics_scale", master="local[32]", shuffle_partitions=32
    )
    from tickdb_spark.ingest import snapshot_diff
    from tickdb_spark.operators.pca import embedding_covariance
    from tickdb_spark.operators.similarity import jl_project
    from tickdb_spark.querybank import pmi_collocations, quality_auc

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    scaled_docs(spark, 1).count()  # warm input caches
    scaled_embeddings(spark, 1).count()

    # PMI with the broadcast-growth axis made visible
    times, vocab = [], []
    for f in FACTORS:
        docs = scaled_docs(spark, f)
        times.append(run(pmi_collocations(docs)))
        vocab.append(
            docs.select(
                F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t")
            )
            .agg(F.countDistinct("t"))
            .collect()[0][0]
        )
    print(
        json.dumps(
            {
                "op": "pmi",
                "sec": times,
                "log2_growth": growth(times),
                "distinct_unigrams": vocab,
            }
        )
    )

    ops = (
        ("auc", lambda f: quality_auc(scaled_labeled_docs(spark, f))),
        ("jl_project", lambda f: jl_project(scaled_embeddings(spark, f))),
        (
            "pca_cov",
            lambda f: embedding_covariance(scaled_embeddings(spark, f)),
        ),
    )
    for name, build in ops:
        times = [run(build(f)) for f in FACTORS]
        print(json.dumps({"op": name, "sec": times, "log2_growth": growth(times)}))

    times = []
    for f in FACTORS:
        db = diff_warehouse(spark, f)  # untimed setup
        times.append(run(snapshot_diff(spark, db, 0)))
    print(
        json.dumps(
            {"op": "snapshot_diff", "sec": times, "log2_growth": growth(times)}
        )
    )


if __name__ == "__main__":
    main()
