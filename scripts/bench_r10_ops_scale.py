"""Scaling curves for the round-10 operators at 1x/2x/4x/8x input:
BM25 retrieval, CMS join-size estimation, and the three new streaming
maintenance faces (IVF cells, decontam grams, phash fingerprints).

The 100-TB question per op:
- bm25:            one corpus explode FILTERED to query terms before any
                   shuffle; tf/df aggregates sized by matching rows —
                   wall should track the scan (~linear).
- join_size_est:   two one-scan d*w sketch builds + a broadcast-sized
                   dot; the estimated join itself never runs — linear
                   in the scans, constant in the sketch.
- stream faces:    4 micro-batches of f-times new rows through frozen
                   state (centroids / gram hasher / dHash kernel);
                   per-batch cost ∝ new rows, corpus never reprocessed.
                   Measured end to end (stream machinery included).

    python scripts/bench_r10_ops_scale.py

One JSON line per op with [1x, 2x, 4x, 8x] seconds and log2 growth.
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

from bench_analytics_scale import scaled_embeddings  # noqa: E402
from bench_text_ops_scale import scaled_plain_docs  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

FACTORS = (1, 2, 4, 8)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def _run(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _landing(pdf, n_parts=4, prefix="scale_"):
    work = tempfile.mkdtemp(prefix=prefix)
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    step = (len(pdf) + n_parts - 1) // n_parts
    for k in range(n_parts):
        pdf.iloc[k * step : (k + 1) * step].to_parquet(
            os.path.join(landing, f"b{k}.parquet"), index=False
        )
    return work, landing


def main() -> None:
    spark = get_spark(
        app_name="r10_ops_scale", master="local[32]", shuffle_partitions=32
    )
    from tickdb_spark.operators.bm25 import bm25_topk
    from tickdb_spark.operators.kmeans import kmeans_fit
    from tickdb_spark.operators.sketch import cms_join_size_estimate
    from tickdb_spark.streaming.index import (
        stream_decontam_gram_maintenance,
        stream_ivf_cell_maintenance,
    )

    scaled_plain_docs(spark, 1).count()  # warm input caches
    scaled_embeddings(spark, 1).count()

    queries = [
        (0, "hash join merge"),
        (1, "customer order query"),
        (2, "slow spark stream"),
        (3, "the big table"),
    ]
    times = [run for f in FACTORS for run in [_run(bm25_topk(scaled_plain_docs(spark, f), queries))]]
    print(json.dumps({"op": "bm25_topk", "sec": times, "log2_growth": growth(times)}))

    # join-size estimate: f-times rows on both sides, Zipf-ish key reuse
    times = []
    for f in FACTORS:
        a = spark.range(200_000 * f).select((F.col("id") % (5_000 * f)).alias("k"))
        b = spark.range(100_000 * f).select((F.col("id") % (7_000 * f)).alias("k"))
        times.append(_run(cms_join_size_estimate(a, "k", b, "k")))
    print(
        json.dumps(
            {"op": "join_size_estimate", "sec": times, "log2_growth": growth(times)}
        )
    )

    # IVF cell maintenance: frozen centroids (trained once at 1x, untimed),
    # 4 micro-batches of f-times new vectors
    cents = kmeans_fit(
        scaled_embeddings(spark, 1), k=4, max_iter=3, tol=0.0, sample_fraction=0.5
    )
    times = []
    for f in FACTORS:
        emb = scaled_embeddings(spark, f)
        pdf = emb.orderBy("vec_id").toPandas()
        work, landing = _landing(pdf, prefix=f"sivf_scale{f}_")
        t0 = time.perf_counter()
        stream_ivf_cell_maintenance(
            spark, landing, os.path.join(work, "state"), cents, schema=emb.schema
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"op": "stream_ivf_maintenance", "sec": times, "log2_growth": growth(times)}
        )
    )

    # decontam gram maintenance: f-times eval docs through the hasher
    times = []
    for f in FACTORS:
        docs = scaled_plain_docs(spark, f)
        pdf = docs.orderBy("doc_id").toPandas()
        work, landing = _landing(pdf, prefix=f"sgram_scale{f}_")
        schema = docs.schema
        t0 = time.perf_counter()
        stream_decontam_gram_maintenance(
            spark, landing, os.path.join(work, "state"), schema, "text", "doc_id", n=8
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "op": "stream_gram_maintenance",
                "sec": times,
                "log2_growth": growth(times),
            }
        )
    )

    # inverted-index maintenance: f-times new docs through the postings
    # explode (linear in new tokens, like the gram face)
    from tickdb_spark.streaming.index import stream_bm25_index_maintenance

    times = []
    for f in FACTORS:
        docs = scaled_plain_docs(spark, f)
        pdf = docs.orderBy("doc_id").toPandas()
        work, landing = _landing(pdf, prefix=f"sbm25_scale{f}_")
        t0 = time.perf_counter()
        idx, n, tot = stream_bm25_index_maintenance(
            spark, landing, os.path.join(work, "state"), docs.schema
        )
        idx.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "op": "stream_bm25_index_maintenance",
                "sec": times,
                "log2_growth": growth(times),
            }
        )
    )

    # phash maintenance: f-times planted images, decode inside the stream
    from tickdb_spark.operators import multimodal as mm
    from tickdb_spark.streaming.index import stream_phash_index_maintenance

    times = []
    for f in FACTORS:
        docs = spark.range(512 * f).select(F.col("id").alias("doc_id"))
        path = os.path.join(tempfile.mkdtemp(prefix=f"sphash_in{f}_"), "a")
        mm.plant_phash_assets(docs, n_docs=512 * f).write.parquet(path)
        pdf = spark.read.parquet(path).orderBy("media_id").toPandas()
        work, landing = _landing(pdf, prefix=f"sphash_scale{f}_")
        media_schema = spark.read.parquet(path).schema
        t0 = time.perf_counter()
        stream_phash_index_maintenance(
            spark, landing, os.path.join(work, "state"), media_schema
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "op": "stream_phash_maintenance",
                "sec": times,
                "log2_growth": growth(times),
            }
        )
    )


def wave2() -> None:
    """1x-8x rows for the wave-3 r10 operators:
    ``python scripts/bench_r10_ops_scale.py wave2``."""
    spark = get_spark(
        app_name="r10_ops_scale2", master="local[32]", shuffle_partitions=32
    )
    from bench_analytics_scale import scaled_events
    from pyspark.sql import Window

    from tickdb_spark.operators import multimodal as mm
    from tickdb_spark.operators.bm25 import rrf_fuse  # noqa: F401
    from tickdb_spark.operators.dedup import dhash_near_pairs

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    scaled_plain_docs(spark, 1).count()
    scaled_events(spark, 1).count()

    # vwap: f-times events through the JSON parse + quantized agg
    # (scaled_events drops props — rebuild an equivalent JSON column so
    # the parse cost is measured too)
    def vwap(f):
        ev = scaled_events(spark, f).withColumn(
            "props",
            F.concat(
                F.lit('{"k": '), (F.col("event_id") % 100).cast("string"), F.lit("}")
            ),
        )
        pvq = F.expr(
            "CAST(floor((value * CAST(get_json_object(props, '$.k') AS BIGINT))"
            " * 1e6 + 0.5) AS BIGINT)"
        )
        k = F.from_json(F.col("props"), "k bigint").getItem("k")
        return (
            ev.select(
                (F.col("ts_us") - F.col("ts_us") % 86_400_000_000).alias("day_us"),
                pvq.alias("_pvq"),
                k.alias("_k"),
            )
            .groupBy("day_us")
            .agg(F.sum("_pvq").alias("pv_q"), F.sum("_k").alias("volume"))
        )

    times = [run(vwap(f)) for f in FACTORS]
    print(json.dumps({"op": "vwap_daily", "sec": times, "log2_growth": growth(times)}))

    # curriculum: f-times docs through the quality scan + per-source window
    def curriculum(f):
        docs = scaled_plain_docs(spark, f).withColumn(
            "source", (F.col("doc_id") % 5).cast("string")
        )
        scored = docs.select(
            "doc_id",
            "source",
            F.expr(
                "CAST(size(filter(split(trim(text), '\\\\s+'), "
                "t -> array_contains(array('the','a','of','and','to','is','in','that'), t)))"
                " * 100000 div greatest(size(split(trim(text), '\\\\s+')), 1) AS BIGINT)"
            ).alias("q_score"),
        )
        return scored.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("q_score"), "doc_id")
            ),
        )

    times = [run(curriculum(f)) for f in FACTORS]
    print(
        json.dumps(
            {"op": "curriculum_order", "sec": times, "log2_growth": growth(times)}
        )
    )

    # vocab drift: f-times docs through explode + conditional counts
    def drift(f):
        docs = scaled_plain_docs(spark, f)
        tok = docs.select(
            (F.col("doc_id") % 2).alias("snap"),
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        return tok.groupBy("token").agg(
            F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("a_cnt"),
            F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("b_cnt"),
        )

    times = [run(drift(f)) for f in FACTORS]
    print(json.dumps({"op": "vocab_drift", "sec": times, "log2_growth": growth(times)}))

    # audio fingerprint pairs: f x 180 planted wavs, decode + pair join
    times = []
    for f in FACTORS:
        docs = spark.range(180 * f).select(F.col("id").alias("doc_id"))
        path = os.path.join(tempfile.mkdtemp(prefix=f"sawav{f}_"), "a")
        mm.plant_signal_wavs(docs).write.parquet(path)
        wavs = spark.read.parquet(path)
        times.append(run(dhash_near_pairs(mm.audio_fingerprint(wavs), max_hamming=3)))
    print(
        json.dumps(
            {"op": "audio_fp_pairs", "sec": times, "log2_growth": growth(times)}
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "wave2":
        wave2()
    else:
        main()
