"""Scaling curves for the round-11 operators at 1x/2x/4x/8x input:
bottom-k quantile sketch (batch + streaming face), URL canonicalization
dedup + domain rollup, numeric drift monitor, hard-negative mining.

The 100-TB question per op:
- bottomk_sketch:   TakeOrderedAndProject — per-task bottom-k partials,
                    k-row merge; wall should track the scan (~linear),
                    state constant.
- web_url_dedup /   one canonicalization projection (codegen) + one
  domain_rollup:    hash groupBy — linear in the scan.
- numeric_drift:    two aggregates over 24 bins — linear in the scan.
- hard_negatives:   stored-signature probe; candidates grow with bucket
                    occupancy (∝ f for fixed queries) — ≤ linear, and
                    the corpus is never rescanned per query.
- stream_bk_face:   4 micro-batches of f-times rows, each batch pays its
                    own bottom-k; read-side merge is k rows per epoch.

    python scripts/bench_r11_ops_scale.py

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
from bench_text_ops_scale import scaled_events, scaled_plain_docs  # noqa: E402
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


def main() -> None:
    spark = get_spark(
        app_name="r11_ops_scale", master="local[32]", shuffle_partitions=32
    )
    from tickdb_spark.functions.web import domain_rollup, url_dedup
    from tickdb_spark.operators.sketch import bottomk_quantile_sketch
    from tickdb_spark.operators.similarity import (
        hard_negative_mining,
        lsh_signature_table,
    )
    from tickdb_spark.querybank import _WEB_URL_EXPR

    scaled_events(spark, 1).count()  # warm input caches
    scaled_plain_docs(spark, 1).count()
    scaled_embeddings(spark, 1).count()

    # bottom-k quantile sketch: f-times events through the TakeOrdered build
    times = [
        _run(bottomk_quantile_sketch(scaled_events(spark, f), "event_id", "value"))
        for f in FACTORS
    ]
    print(json.dumps({"op": "bottomk_sketch", "sec": times, "log2_growth": growth(times)}))

    # web curation: the gate entries' URL derivation over f-times docs
    def urls(f):
        return scaled_plain_docs(spark, f).select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.expr(_WEB_URL_EXPR).alias("url"),
        )

    times = [_run(url_dedup(urls(f), "url", "doc_id")) for f in FACTORS]
    print(json.dumps({"op": "web_url_dedup", "sec": times, "log2_growth": growth(times)}))

    times = [
        _run(
            domain_rollup(
                urls(f), "url", "doc_id", "n_chars",
                blocked_hosts=["site-3.example.com"],
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "web_domain_rollup", "sec": times, "log2_growth": growth(times)}))

    # numeric drift: the gate entry's two aggregates over f-times events
    def drift(f):
        ev = scaled_events(spark, f).select(
            (F.col("event_id") % 2).alias("snap"),
            F.expr("LEAST(CAST(floor(value / 25) AS BIGINT), 23)").alias("bin"),
        )
        return ev.groupBy("bin").agg(
            F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).cast("long").alias("a_cnt"),
            F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).cast("long").alias("b_cnt"),
        )

    times = [_run(drift(f)) for f in FACTORS]
    print(json.dumps({"op": "numeric_drift", "sec": times, "log2_growth": growth(times)}))

    # hard negatives: signatures are ingest-time state (built untimed per
    # factor); the timed probe reads the stored table only
    times = []
    for f in FACTORS:
        emb = scaled_embeddings(spark, f).withColumn(
            "label", (F.col("vec_id") % 16).cast("int")
        )
        sigs = lsh_signature_table(emb).localCheckpoint()  # untimed ingest
        times.append(
            _run(hard_negative_mining(emb, [0, 1, 2, 3, 4], k=5, signatures=sigs))
        )
    print(json.dumps({"op": "hard_negatives_probe", "sec": times, "log2_growth": growth(times)}))

    # boilerplate detection + removal over f-times docs with the gate's
    # planted per-source template lines (explode + keyed aggregates +
    # broadcast anti-join + per-doc reassembly — all ~linear in lines)
    from tickdb_spark.functions.web import remove_boilerplate

    def planted(f):
        return scaled_plain_docs(spark, f).select(
            "doc_id",
            (F.col("doc_id") % 16).cast("string").alias("host"),
            F.concat(
                F.lit("home login search | nav about contact "),
                (F.col("doc_id") % 16).cast("string"),
                F.lit(" | "),
                F.col("text"),
            ).alias("text2"),
        )

    times = [
        _run(remove_boilerplate(planted(f), "host", "doc_id", "text2"))
        for f in FACTORS
    ]
    print(json.dumps({"op": "boilerplate_removal", "sec": times, "log2_growth": growth(times)}))

    # streaming quantile face: 4 micro-batches of f-times rows
    from tickdb_spark.streaming.index import stream_quantile_sketch_maintenance

    times = []
    for f in FACTORS:
        ev = scaled_events(spark, f).select("event_id", "value")
        pdf = ev.orderBy("event_id").toPandas()
        work = tempfile.mkdtemp(prefix=f"sbk_scale{f}_")
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        step = (len(pdf) + 3) // 4
        for k in range(4):
            pdf.iloc[k * step : (k + 1) * step].to_parquet(
                os.path.join(landing, f"b{k}.parquet"), index=False
            )
        t0 = time.perf_counter()
        stream_quantile_sketch_maintenance(
            spark, landing, os.path.join(work, "state"), ev.schema,
            "event_id", "value",
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "stream_bk_maintenance", "sec": times, "log2_growth": growth(times)}))


if __name__ == "__main__":
    main()
