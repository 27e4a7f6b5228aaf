"""Scaling curves for the round-9 operators at 1x/2x/4x/8x input:
perceptual-hash image dedup, unigram-LM tokenizer train+tokenize, and
streaming ANN-index maintenance.

The 100-TB question per op:
- phash_pairs:    decode + dHash are per-image (linear); candidate pairs
                  come from 4x16-bit block-equality joins — buckets grow
                  with the corpus but stay group-sized, so candidates
                  (and the planted pair volume) grow ~linearly, never
                  corpus².
- unigram_train:  the corpus pays ONE word-count scan; every EM round
                  runs on the Zipf-bounded word aggregate (fixed here),
                  so wall should track the scan only.
- unigram_tok:    same shape plus the final word-count scan.
- stream_ann_maintenance: 4 micro-batches of f-times vectors through the
                  frozen-plane encoder — per-batch cost ∝ new vectors ×
                  tables (corpus never re-encodes); measured end to end
                  (stream machinery included).

    python scripts/bench_r9_ops_scale.py

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
PHASH_BASE = 512


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def main() -> None:
    spark = get_spark(
        app_name="r9_ops_scale", master="local[32]", shuffle_partitions=32
    )
    from tickdb_spark.operators import multimodal as mm
    from tickdb_spark.operators import unigram as U
    from tickdb_spark.operators.dedup import dhash_near_pairs
    from tickdb_spark.streaming.index import stream_ann_index_maintenance

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    scaled_plain_docs(spark, 1).count()  # warm input caches
    scaled_embeddings(spark, 1).count()

    # phash: f-times image corpus (f*512 planted images, pair volume ∝ f);
    # planting is untimed setup (the _materialized_assets discipline)
    times = []
    for f in FACTORS:
        docs = spark.range(PHASH_BASE * f).select(F.col("id").alias("doc_id"))
        path = os.path.join(tempfile.mkdtemp(prefix=f"phash_scale{f}_"), "a")
        mm.plant_phash_assets(docs, n_docs=PHASH_BASE * f).write.parquet(path)
        media = spark.read.parquet(path)
        times.append(run(dhash_near_pairs(mm.image_dhash(media))))
    print(json.dumps({"op": "phash_pairs", "sec": times, "log2_growth": growth(times)}))

    ops = (
        ("unigram_train", lambda f: U.unigram_train(scaled_plain_docs(spark, f))),
        (
            "unigram_tokenize",
            lambda f: U.unigram_tokenize(
                scaled_plain_docs(spark, f),
                U.unigram_train(scaled_plain_docs(spark, f)),
            ),
        ),
    )
    for name, build in ops:
        times = [run(build(f)) for f in FACTORS]
        print(json.dumps({"op": name, "sec": times, "log2_growth": growth(times)}))

    # streaming maintenance measured end to end (stream machinery incl.)
    times = []
    for f in FACTORS:
        emb = scaled_embeddings(spark, f)
        pdf = emb.orderBy("vec_id").toPandas()
        work = tempfile.mkdtemp(prefix=f"sann_scale{f}_")
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        step = (len(pdf) + 3) // 4
        for k in range(4):
            pdf.iloc[k * step : (k + 1) * step].to_parquet(
                os.path.join(landing, f"b{k}.parquet"), index=False
            )
        t0 = time.perf_counter()
        stream_ann_index_maintenance(
            spark, landing, os.path.join(work, "state"), schema=emb.schema
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"op": "stream_ann_maintenance", "sec": times, "log2_growth": growth(times)}
        )
    )


def wave2() -> None:
    """1x-8x rows for the wave-2 r9 operators:
    ``python scripts/bench_r9_ops_scale.py wave2``."""
    spark = get_spark(
        app_name="r9_ops_scale2", master="local[32]", shuffle_partitions=32
    )
    from bench_analytics_scale import scaled_labeled_docs
    from tickdb_spark.operators.domainmix import doremi_domain_weights

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    scaled_labeled_docs(spark, 1).count()
    times = [
        run(doremi_domain_weights(scaled_labeled_docs(spark, f))) for f in FACTORS
    ]
    print(json.dumps({"op": "doremi", "sec": times, "log2_growth": growth(times)}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "wave2":
        wave2()
    else:
        main()
