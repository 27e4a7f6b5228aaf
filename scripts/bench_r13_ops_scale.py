"""Scaling curves for the round-13 operators at 1x/2x/4x/8x: containment
dedup, association rules, trailing-7d distinct users, Heaps vocabulary
growth, confusion-matrix threshold sweep, Benford first-digit audit.

The 100-TB question per op:
- containment:  corpus scaled with CONSTANT containment structure (the
                bench_dedup_scale tagging trick: per-copy token suffixes
                keep cross-copy overlap at zero while preserving each
                copy's internal pair structure). The asymmetric prefix
                filter must keep candidate volume ∝ corpus, not df².
- assoc_rules:  baskets (user-days) scale 1x-8x via copy-offset user
                ids; the item vocabulary is FIXED (5 event types), so
                pair-row OUTPUT is constant and wall should track the
                distinct + self-join volume — linear.
- trailing_distinct: DAYS scale 1x-8x via 35-day time shifts per copy;
                join volume is 7 x user-days — linear.
- heaps:        docs scale 1x-8x (tagged copies: vocabulary grows ∝ f,
                the worst case for the firsts aggregate) — linear.
- confusion:    docs scale; the sweep runs on the (score, label)
                histogram, so wall should track the SCAN, with the
                9-threshold sweep cost invisible.
- benford:      events scale; one conditional aggregate — linear.

    python scripts/bench_r13_ops_scale.py

One JSON line per op with [1x, 2x, 4x, 8x] seconds and log2 growth
(1.0 = linear, 2.0 = quadratic). Inputs localCheckpoint'd untimed.
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


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r13_ops_scale", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from bench_dedup_scale import scaled_docs

    from tickdb_spark.operators import basket as _basket
    from tickdb_spark.operators import dedup as _dedup
    from tickdb_spark.operators import dq as _dq
    from tickdb_spark.functions import text as _text

    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm cache
    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    def scaled_ev(f: int, shift_days: bool = False, offset_users: bool = False):
        copies = spark.range(f).select(F.col("id").alias("k"))
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        if shift_days:
            ts_us = ts_us + F.col("k") * F.lit(35 * 86_400_000_000)
        uid = F.col("user_id")
        if offset_users:
            uid = uid + F.col("k") * F.lit(1_000_000)
        return (
            ev_base.crossJoin(copies)
            .select(
                (F.col("event_id") * f + F.col("k")).alias("event_id"),
                ts_us.alias("ts_us"),
                uid.alias("user_id"),
                "event_type",
                "value",
            )
            .repartition(int(cpus))
            .localCheckpoint()
        )

    # containment pairs (prefix-filtered): corpus scales, structure fixed
    times = []
    for f in FACTORS:
        docs = scaled_docs(spark, f).repartition(int(cpus)).localCheckpoint()
        times.append(
            _run(_dedup.containment_pairs(docs, "text", "doc_id", tau_ppm=600_000))
        )
    print(json.dumps({"op": "containment_pairs_docs", "sec": times,
                      "log2_growth": growth(times)}))

    # association rules: baskets scale (users offset per copy)
    times = []
    for f in FACTORS:
        ev = scaled_ev(f, offset_users=True)
        base = ev.select(
            "user_id", F.expr("ts_us div 86400000000").alias("day"), "event_type"
        )
        times.append(_run(_basket.association_rules(base, ["user_id", "day"], "event_type")))
    print(json.dumps({"op": "assoc_rules_baskets", "sec": times,
                      "log2_growth": growth(times)}))

    # trailing-7d distinct users: days scale via per-copy time shifts
    times = []
    for f in FACTORS:
        ev = scaled_ev(f, shift_days=True)
        pairs = ev.select(
            "user_id", F.expr("ts_us div 86400000000").alias("day")
        ).distinct()
        contrib = pairs.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("t_day"),
        ).distinct()
        days = pairs.select(F.col("day").alias("t_day")).distinct()
        out = (
            contrib.join(days, "t_day")
            .groupBy("t_day")
            .agg(F.count(F.lit(1)).cast("long").alias("trailing7_users"))
        )
        times.append(_run(out))
    print(json.dumps({"op": "trailing_distinct_days", "sec": times,
                      "log2_growth": growth(times)}))

    # Heaps curve: docs scale, vocabulary grows ~proportionally (tagged)
    from pyspark.sql import Window

    def heaps(docs):
        tok = docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
        )
        doc_tokens = tok.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_tok")
        )
        firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
        ranked = doc_tokens.select(
            "doc_id", F.row_number().over(Window.orderBy("doc_id")).alias("rk")
        ).crossJoin(
            F.broadcast(doc_tokens.agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
        )
        spine = (
            spark.range(1, 11)
            .select(F.col("id").cast("long").alias("checkpoint"))
            .crossJoin(ranked)
            .where(F.expr("rk = (n_docs * checkpoint + 9) div 10"))
            .select("checkpoint", F.col("doc_id").alias("thr_doc"))
        )
        cum = (
            doc_tokens.crossJoin(F.broadcast(spine))
            .where(F.col("doc_id") <= F.col("thr_doc"))
            .groupBy("checkpoint")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("total_tokens"))
        )
        fv = (
            firsts.crossJoin(F.broadcast(spine))
            .where(F.col("first_doc") <= F.col("thr_doc"))
            .groupBy("checkpoint")
            .agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
        )
        return cum.join(fv, "checkpoint")

    times = []
    for f in FACTORS:
        docs = scaled_docs(spark, f).repartition(int(cpus)).localCheckpoint()
        times.append(_run(heaps(docs)))
    print(json.dumps({"op": "heaps_vocab_docs", "sec": times,
                      "log2_growth": growth(times)}))

    # confusion sweep: docs scale; sweep rides the histogram
    def confusion(docs):
        hits = _text.stopword_hits(F.col("text"), "en").cast("long")
        n_tok = _text.token_count(F.col("text")).cast("long")
        label = F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        hist = (
            docs.select(
                F.call_function("div", hits * F.lit(1_000_000), n_tok).alias("score_q"),
                label.alias("label"),
            )
            .groupBy("score_q")
            .agg(F.sum("label").cast("long").alias("pos"),
                 (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("neg"))
        )
        spine = spark.range(1, 10).select((F.col("id") * 100_000).alias("thr"))
        ge = F.col("score_q") >= F.col("thr")
        return (
            F.broadcast(spine).crossJoin(hist).groupBy("thr").agg(
                F.sum(F.when(ge, F.col("pos")).otherwise(F.lit(0))).alias("tp"),
                F.sum(F.when(ge, F.col("neg")).otherwise(F.lit(0))).alias("fp"),
            )
        )

    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    times = []
    for f in FACTORS:
        copies = spark.range(f).select(F.col("id").alias("k"))
        docs = (
            base_docs.select("doc_id", "text", "lang")
            .crossJoin(copies)
            .select((F.col("doc_id") * f + F.col("k")).alias("doc_id"), "text", "lang")
            .repartition(int(cpus))
            .localCheckpoint()
        )
        times.append(_run(confusion(docs)))
    print(json.dumps({"op": "confusion_sweep_docs", "sec": times,
                      "log2_growth": growth(times)}))

    # Benford audit: events scale; one conditional aggregate
    times = []
    for f in FACTORS:
        ev = scaled_ev(f)
        times.append(_run(_dq.benford_first_digit(ev, "value", ["event_type"])))
    print(json.dumps({"op": "benford_events", "sec": times,
                      "log2_growth": growth(times)}))


if __name__ == "__main__":
    main()
