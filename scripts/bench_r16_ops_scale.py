"""Scaling curves for the round-16 operators at 1x/2x/4x: log-rank,
Nelson-Aalen cumulative hazard, full k-core decomposition, index-sourced
batch MMR, and the quality-floored k-center.

The 100-TB question per op:
- km_logrank:   subjects collapse to (grp, dur) cells in ONE hash
                aggregate; everything after is |durations|-sized. Wall
                should track the scan (linear), the pivot invisible.
- na_cumhaz:    same cells + one ordered window sum — linear scan cost,
                no quadratic factor window (the km_curve caveat).
- kcore_decompose: per-level frontier peel over the edge list; scaled
                here as DISJOINT graph copies (same degeneracy, f×
                edges) so the curve isolates the peel, not the pair
                detector. Driver rounds are degeneracy-bounded and
                scale-invariant; per-round shuffle is linear in edges.
- mmr_batch_from_index: the corpus-sized stages are equi-joins on the
                stored signature column; candidates per query are
                bucket-bounded, so wall tracks the index probe (linear
                in corpus) with the greedy invisible.
- kcenter_select(floored): k corpus aggregates with the floor filter
                riding the scan — linear per step, k fixed.

    python scripts/bench_r16_ops_scale.py

One JSON line per op with per-factor seconds and log2 growth
(1.0 = linear, 2.0 = quadratic). Inputs localCheckpoint'd untimed.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 2, 4)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def main() -> None:
    spark = get_spark(
        app_name="bench_r16_ops",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )

    # --- survival family: events scaled by id-offset copies -------------
    from tickdb_spark.operators.survival import km_logrank, na_cumhaz

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", "event_type"
    )
    n_ev = ev.count()

    def ev_at(f):
        out = ev
        for i in range(1, f):
            out = out.unionByName(
                ev.select(
                    (F.col("event_id") + i * 100_000_000).alias("event_id"),
                    "event_type",
                )
            )
        return out.localCheckpoint()

    for name, fn in (
        (
            "km_logrank",
            lambda d: km_logrank(
                d, "event_type", "event_id % 30 + 1", "event_id % 4 != 0",
                "click", "view",
            ),
        ),
        (
            "na_cumhaz",
            lambda d: na_cumhaz(
                d, "event_type", "event_id % 30 + 1", "event_id % 4 != 0"
            ),
        ),
    ):
        times = []
        for f in FACTORS:
            d = ev_at(f)
            t0 = time.perf_counter()
            fn(d).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"op": name, "sec": times,
                          "rows": [n_ev * f for f in FACTORS],
                          "log2_growth": growth(times)}))

    # --- k-core decomposition: disjoint copies of the real pair graph ---
    from tickdb_spark.operators import cluster as C
    from tickdb_spark.operators import dedup as D

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
    )
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    times = []
    for f in FACTORS:
        d = pairs
        for i in range(1, f):
            d = d.unionByName(
                pairs.select(
                    (F.col("id_a") + i * 100_000_000).alias("id_a"),
                    (F.col("id_b") + i * 100_000_000).alias("id_b"),
                )
            )
        d = d.localCheckpoint()
        t0 = time.perf_counter()
        C.kcore_decompose(d).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "kcore_decompose", "sec": times,
                      "edges": [n_pairs * f for f in FACTORS],
                      "log2_growth": growth(times)}))

    # --- selection: embeddings scaled by id-offset copies ---------------
    from tickdb_spark.operators.diversify import (
        kcenter_select,
        mmr_select_batch_from_index,
    )
    from tickdb_spark.operators.similarity import lsh_signature_table

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_emb = emb.count()

    def emb_at(f):
        out = emb
        for i in range(1, f):
            out = out.unionByName(
                emb.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    "embedding",
                )
            )
        return out.localCheckpoint()

    times = []
    for f in FACTORS:
        d = emb_at(f)
        sig = lsh_signature_table(d).localCheckpoint()  # stored index, untimed
        t0 = time.perf_counter()
        mmr_select_batch_from_index(
            d, sig, [1, 5, 9], k=5, prefilter=32
        ).collect()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "mmr_batch_from_index", "sec": times,
                      "rows": [n_emb * f for f in FACTORS],
                      "log2_growth": growth(times)}))

    times = []
    for f in FACTORS:
        d = emb_at(f)
        t0 = time.perf_counter()
        kcenter_select(d, k=8, query_id=3, rel_floor_ppm=0).collect()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "kcenter_quality_floor", "sec": times,
                      "rows": [n_emb * f for f in FACTORS],
                      "log2_growth": growth(times)}))


if __name__ == "__main__":
    main()
