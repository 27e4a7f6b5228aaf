"""Scaling curves for the round-12 wave-2 operators at 1x/2x/4x/8x:
fuzzy linkage (SymSpell blocking), SCD2 history build, lag
autocorrelation, KMV set-operation estimates.

The 100-TB question per op:
- fuzzy_link:   vocabulary scaled 1x-8x (the aggregated side — the axis
                that grows with corpus breadth). Deletion keys multiply
                the vocab ~9x; candidates are confined to shared-key
                buckets (uniform hex words → tiny buckets), so wall
                should be ~linear in vocab. The all-pairs alternative
                would be quadratic.
- scd2:         users scaled 1x-8x with per-user history FIXED (the
                dimension-table growth axis). One key-hash exchange +
                per-key windows → linear.
- lag_acf:      series count scaled 1x-8x with per-series length FIXED
                (scaled_events suffixes series per copy) — the bounded-
                window-state axis; expect linear.
- kmv_setops:   groups scaled 1x-8x (5f sketches; value domain grows ∝
                rows). Sketch build is linear; the pairwise algebra
                grows with PAIRS of groups (quadratic in group count but
                each pair costs <= 2k sketch rows — corpus-independent,
                the property under test).

    python scripts/bench_r12w2_ops_scale.py

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

from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 2, 4, 8)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def _run(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def pseudo_vocab(spark, factor: int):
    """f x 4000 distinct-ish hex pseudo-words, lengths 6-8 (uniform —
    deletion-key buckets stay tiny, the realistic vocabulary shape)."""
    return (
        spark.range(4000 * factor)
        .select(
            F.expr(
                "substring(md5(cast(id as string)), 1, 6 + cast(id % 3 as int))"
            ).alias("w")
        )
        .distinct()
        .repartition(32)
    )


def scaled_user_events(spark, factor: int):
    """factor-times events with copy-offset user ids: users grow with f,
    per-user history stays fixed (the SCD2 dimension-growth axis)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    copies = spark.range(factor).select(F.col("id").alias("k"))
    return (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") * factor + F.col("k")).alias("event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            (F.col("user_id") + F.col("k") * 1_000_000).alias("user_id"),
            "event_type",
        )
        .repartition(32)
    )


def main() -> None:
    spark = get_spark(
        app_name="r12w2_ops_scale", master="local[32]", shuffle_partitions=32
    )
    from bench_text_ops_scale import scaled_events

    from tickdb_spark.operators.linkage import fuzzy_link
    from tickdb_spark.operators.scd2 import scd2_history
    from tickdb_spark.operators.sketch import kmv_set_cardinalities, kmv_sketch
    from tickdb_spark.operators.timeseries import lag_autocorrelation

    spark.read.parquet(f"{SF_DIR}/events.parquet").count()  # warm cache

    # fuzzy linkage: dirty side = one deterministic deletion per word
    times = []
    for f in FACTORS:
        vocab = pseudo_vocab(spark, f).localCheckpoint()  # untimed input build
        dirty = vocab.select(
            F.expr(
                "concat(substring(w, 1, (1 + length(w) % 3) - 1), "
                "substring(w, (1 + length(w) % 3) + 1, 1000000))"
            ).alias("noisy")
        ).distinct()
        times.append(_run(fuzzy_link(dirty, vocab, "noisy", "w")))
    print(json.dumps({"op": "fuzzy_link_vocab", "sec": times,
                      "log2_growth": growth(times)}))

    # SCD2: users scale, per-user history fixed
    times = [
        _run(
            scd2_history(
                scaled_user_events(spark, f), "user_id", "event_type",
                "ts_us", "event_id",
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "scd2_history_users", "sec": times,
                      "log2_growth": growth(times)}))

    # lag ACF: series scale, per-series length fixed (20k points)
    times = [
        _run(
            lag_autocorrelation(
                scaled_events(spark, f), "event_type", "ts_us", "event_id",
                "value", lags=(1, 2, 3),
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "lag_acf_series", "sec": times,
                      "log2_growth": growth(times)}))

    # KMV set ops: groups scale (5f sketches, C(5f,2) pairs — each pair
    # <= 2k sketch rows regardless of corpus size)
    times = []
    for f in FACTORS:
        ev = scaled_events(spark, f)
        sk = kmv_sketch(ev, "event_type", "event_id", k=256)
        times.append(_run(kmv_set_cardinalities(sk, k=256)))
    print(json.dumps({"op": "kmv_setops_groups", "sec": times,
                      "log2_growth": growth(times)}))

    # ---- wave 3 ----
    from pyspark.sql import Window

    from tickdb_spark.operators.timeseries import cross_correlation

    # Markov transitions: users scale, per-user history fixed — one
    # user-key window + a 25-row aggregate
    def markov(ev):
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        seq = ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        return (
            seq.where(F.col("next_type").isNotNull())
            .groupBy("prev_type", "next_type")
            .count()
        )

    times = [_run(markov(scaled_user_events(spark, f))) for f in FACTORS]
    print(json.dumps({"op": "markov_transitions_users", "sec": times,
                      "log2_growth": growth(times)}))

    # Sequence match: same axis — two lead windows + a codegen predicate
    def seq_match(ev):
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        gap = 86_400_000_000
        seq = ev.select(
            "user_id",
            F.col("event_type").alias("e0"),
            F.col("ts_us").alias("t0"),
            F.lead("event_type", 1).over(w).alias("e1"),
            F.lead("ts_us", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("e2"),
            F.lead("ts_us", 2).over(w).alias("t2"),
        )
        return (
            seq.where(
                (F.col("e0") == "view")
                & (F.col("e1") == "click")
                & (F.col("e2") == "purchase")
                & (F.col("t1") - F.col("t0") <= gap)
                & (F.col("t2") - F.col("t1") <= gap)
            )
            .groupBy("user_id")
            .count()
        )

    times = [_run(seq_match(scaled_user_events(spark, f))) for f in FACTORS]
    print(json.dumps({"op": "sequence_match_users", "sec": times,
                      "log2_growth": growth(times)}))

    # Cross-correlation: series scale (5f series → C(5f,2) pairs over a
    # FIXED bucket spine; the join input is the per-bucket aggregate,
    # |series|·|buckets| rows, corpus-independent)
    times = [
        _run(
            cross_correlation(
                scaled_events(spark, f).select(
                    "event_type", (F.col("ts_us") * 1000).alias("ts_ns"), "value"
                ),
                "event_type", "ts_ns", "value",
                bucket_ns=3_600_000_000_000, scale=10,
            )
        )
        for f in FACTORS
    ]
    print(json.dumps({"op": "cross_correlation_series", "sec": times,
                      "log2_growth": growth(times)}))

    # ---- wave 4 ----
    from tickdb_spark.operators import dq

    # DQ: rows scale — the fused aggregate should track the scan, one
    # pass regardless of the 5-check battery
    def dq_report(ev):
        checks = [
            dq.not_null("v_not_null", "value"),
            dq.in_range("v_in_0_600", "value", 0, 600),
            dq.in_range("v_le_50", "value", 0, 50),
            dq.accepted_values(
                "etype_ok", "event_type",
                tuple(f"{t}_{k}" for t in ("click", "view", "purchase",
                                           "signup", "error") for k in range(8)),
            ),
        ]
        return dq.run_checks(
            ev, "events", checks, [("event_unique", ["event_id"])]
        )

    times = [_run(dq_report(scaled_events(spark, f))) for f in FACTORS]
    print(json.dumps({"op": "dq_checks_rows", "sec": times,
                      "log2_growth": growth(times)}))

    # multi-touch: users scale (purchases AND clicks both grow ∝ f,
    # per-user click density fixed → join output grows ∝ f, never f²)
    from tickdb_spark.operators.rangejoin import point_in_interval_join

    def mta(ev):
        day = 86_400_000_000
        purchases = ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts_us").alias("p_us"),
        ).withColumn("w_start", F.col("p_us") - F.lit(7 * day))
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id",
            F.col("ts_us").alias("c_us"),
        )
        j = point_in_interval_join(
            clicks, purchases, ["user_id"], "c_us", "w_start", "p_us",
            bucket_ns=day,
        )
        w = Window.partitionBy("purchase_id")
        w_rk = Window.partitionBy("purchase_id").orderBy("c_us", "click_id")
        n = F.count(F.lit(1)).over(w)
        rk = F.row_number().over(w_rk)
        credit = F.call_function("div", F.lit(1_000_000), n) + F.when(
            rk <= F.lit(1_000_000) % n, F.lit(1)
        ).otherwise(F.lit(0))
        return j.select(
            "purchase_id", "click_id", credit.cast("long").alias("credit_ppm")
        )

    times = [_run(mta(scaled_user_events_with_value(spark, f))) for f in FACTORS]
    print(json.dumps({"op": "multitouch_users", "sec": times,
                      "log2_growth": growth(times)}))

    # RFM: users scale — the global ntile windows see only the per-user
    # aggregate (dimension-sized)
    def rfm(ev):
        agg = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
            F.max("ts_us").cast("long").alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("m"),
        )
        return agg.select(
            "user_id",
            F.ntile(5).over(Window.orderBy("last_us", "user_id")).alias("r"),
            F.ntile(5).over(Window.orderBy("frequency", "user_id")).alias("fq"),
            F.ntile(5).over(Window.orderBy("m", "user_id")).alias("mq"),
        )

    times = [_run(rfm(scaled_user_events_with_value(spark, f))) for f in FACTORS]
    print(json.dumps({"op": "rfm_users", "sec": times,
                      "log2_growth": growth(times)}))


def scaled_user_events_with_value(spark, factor: int):
    """Like scaled_user_events but keeps the value column (for RFM) —
    users grow with f, per-user history fixed."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    copies = spark.range(factor).select(F.col("id").alias("k"))
    return (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") * factor + F.col("k")).alias("event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            (F.col("user_id") + F.col("k") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(32)
    )


if __name__ == "__main__":
    main()
