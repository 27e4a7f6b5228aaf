"""Scaling curves for the round-12 operators/fixes at 1x/2x/4x/8x:
hash-keyed boilerplate detection+removal, bulk hard-negative mining
(queries as the scaled axis), and the join planner's stats pass.

The 100-TB question per op:
- boilerplate:      detection now shuffles (host, _id, 60-bit hash)
                    only; exemplar text joins back from the tiny
                    surviving template set — wall should track the
                    explode (~linear), with NO raw-text shuffle term.
- hard_neg_bulk:    corpus fixed, QUERY set scaled 1x-8x — candidates
                    grow ∝ queries (bucket-equality probe) and the
                    mapInPandas rescore is Arrow-batched, so wall
                    should be ≤ linear in queries.
- join_planner:     two sketch builds + two per-key aggregates —
                    linear in the bigger input, join never runs.

    python scripts/bench_r12_ops_scale.py

One JSON line per op with [1x, 2x, 4x, 8x] seconds and log2 growth.
"""

from __future__ import annotations

import json
import math
import os
import sys
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
        app_name="r12_ops_scale", master="local[32]", shuffle_partitions=32
    )
    from tickdb_spark.functions.web import boilerplate_lines, remove_boilerplate
    from tickdb_spark.operators.planner import choose_join
    from tickdb_spark.operators.similarity import (
        hard_negative_mining,
        lsh_signature_table,
    )

    scaled_events(spark, 1).count()  # warm input caches
    scaled_plain_docs(spark, 1).count()
    scaled_embeddings(spark, 1).count()

    # boilerplate detection + removal over f-times docs (r12: hash-keyed
    # shuffles; same planted per-source template as the gate)
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
        _run(boilerplate_lines(planted(f), "host", "doc_id", "text2"))
        for f in FACTORS
    ]
    print(json.dumps({"op": "boilerplate_detect_hashkey", "sec": times,
                      "log2_growth": growth(times)}))
    times = [
        _run(remove_boilerplate(planted(f), "host", "doc_id", "text2"))
        for f in FACTORS
    ]
    print(json.dumps({"op": "boilerplate_removal_hashkey", "sec": times,
                      "log2_growth": growth(times)}))

    # bulk hard negatives: corpus FIXED at 8x, query DataFrame scaled
    # 1x-8x (25/50/100/200 queries); signatures are untimed ingest state
    emb = scaled_embeddings(spark, 8).withColumn(
        "label", (F.col("vec_id") % 16).cast("int")
    )
    sigs = lsh_signature_table(emb).localCheckpoint()  # untimed ingest
    emb = emb.localCheckpoint()
    n_vec = emb.count()
    times = []
    for f in FACTORS:
        step = max(1, n_vec // (25 * f))
        qset = emb.where(F.col("vec_id") % step == 0).select("vec_id")
        times.append(
            _run(hard_negative_mining(emb, qset, k=5, signatures=sigs))
        )
    print(json.dumps({"op": "hard_negatives_bulk_queries", "sec": times,
                      "log2_growth": growth(times)}))

    # join planner stats pass: f-times events vs fixed orders-sized side
    orders = scaled_events(spark, 1).select("event_id")
    times = [
        _run(
            choose_join(
                scaled_events(spark, f).select("event_id"), "event_id",
                orders, "event_id",
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "join_planner_stats", "sec": times,
                      "log2_growth": growth(times)}))

    # filtered ANN, both routes, corpus scaled 1x-8x, 5 fixed queries.
    # selective: label==5 (~6%) -> prefilter exact; broad: label>=2
    # (~87% of the 16-label corpus) -> IVF probe. Selectivity passed in
    # (production reads it from stats) so the timed plan is the search.
    from tickdb_spark.operators.similarity import ann_topk_filtered

    qids = [0, 16, 32, 48, 64]
    for name, pred, selv in [
        ("ann_filtered_prefilter", F.col("label") == 5, 0.0625),
        ("ann_filtered_ivf", F.col("label") >= 2, 0.875),
    ]:
        times = [
            _run(
                ann_topk_filtered(
                    scaled_embeddings(spark, f).withColumn(
                        "label", (F.col("vec_id") % 16).cast("int")
                    ),
                    qids,
                    pred,
                    k=5,
                    selectivity=selv,
                )
            )
            for f in FACTORS
        ]
        print(json.dumps({"op": name, "sec": times,
                          "log2_growth": growth(times)}))

    # split-leakage audit over f-times docs: pair detection dominates
    # (the audit itself is two aggregates + two pair-graph joins)
    from tickdb_spark.operators.dedup import ngram_jaccard_pairs
    from tickdb_spark.operators.sampling import split_leakage_audit

    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    times = []
    for f in FACTORS:
        docs = scaled_plain_docs(spark, f)
        pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
        times.append(
            _run(split_leakage_audit(docs, "doc_id", pairs, splits))
        )
    print(json.dumps({"op": "split_leakage_audit", "sec": times,
                      "log2_growth": growth(times)}))

    # temperature mixture allocation: one pruned-column hash aggregate
    from tickdb_spark.operators.sampling import temperature_mixture_allocation

    times = [
        _run(
            temperature_mixture_allocation(
                scaled_plain_docs(spark, f).select(
                    (F.col("doc_id") % 20).cast("string").alias("lang")
                ),
                "lang",
                10_000,
                1,
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "temperature_mixture_alloc", "sec": times,
                      "log2_growth": growth(times)}))

    # RAG chunk retrieval over f-times docs, 3 fixed queries: the
    # filtered chunk-token explode should keep growth ~linear
    from tickdb_spark.operators.bm25 import rag_chunk_topk

    rqs = [(1, "hash join strategy"), (2, "stream window aggregate"),
           (3, "vector scan filter")]
    times = [
        _run(
            rag_chunk_topk(
                scaled_plain_docs(spark, f), rqs, k_top=5,
                window=32, stride=24,
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "rag_chunk_topk", "sec": times,
                      "log2_growth": growth(times)}))

    # novelty: corpus scaled 1x-8x vs FIXED 1x reference (the broadcast
    # side stays constant — growth must track the corpus scan alone)
    from tickdb_spark.operators.decontam import novelty_report

    ref = scaled_plain_docs(spark, 1).localCheckpoint()
    times = [
        _run(
            novelty_report(
                scaled_plain_docs(spark, f), ref, "text", "doc_id", 8
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "novelty_report", "sec": times,
                      "log2_growth": growth(times)}))

    # incremental CC face: 3 landing batches of f-times pairs (chains
    # then a merging batch). Per-batch cost should track the merge
    # frontier (∝ pairs), with the stream/iteration machinery as a
    # fixed floor — NOT the pair history.
    import os
    import tempfile

    import pandas as pd

    from tickdb_spark.streaming.index import (
        PAIR_SCHEMA,
        stream_component_maintenance,
    )

    times = []
    for f in FACTORS:
        n = 500 * f
        b1 = pd.DataFrame({"id_a": range(0, n, 10)}).assign(
            id_b=lambda x: x.id_a + 1
        )
        b2 = b1.assign(id_a=b1.id_a + 1, id_b=b1.id_a + 2)
        b3 = pd.DataFrame({"id_a": range(2, n, 20)}).assign(
            id_b=lambda x: x.id_a + 10
        )
        work = tempfile.mkdtemp(prefix="scc_scale_")
        landing = os.path.join(work, "landing")
        os.makedirs(landing)
        for k, part in enumerate((b1, b2, b3)):
            p = os.path.join(landing, f"pairs_{k}.parquet")
            part.astype("int64").to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))
        t0 = time.perf_counter()
        stream_component_maintenance(
            spark, landing, os.path.join(work, "state")
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "stream_cc_maintenance", "sec": times,
                      "log2_growth": growth(times)}))


if __name__ == "__main__":
    main()
