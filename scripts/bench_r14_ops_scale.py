"""Scaling curves for the round-14 operators at 1x/2x/4x/8x: the
auto-width join planner pass, seasonal-strength ANOVA, and the MV
face's variance-state partial-aggregate + merge.

The 100-TB question per op:
- choose_join_auto: KEY CARDINALITY scales 1x-8x (copy-offset join
              keys), so the HLL estimate grows and the DERIVED width
              steps up pow2 levels with it (2^18 → 2^21 here). The
              planner pass must stay ~linear in rows even as the
              sketch it sizes grows — the width only changes the
              (depth, bucket) aggregate's cardinality, never a
              shuffle of data rows. Timed around the WHOLE call
              (the width collect is a driver planner action).
- seasonal:   events scale 1x-8x via per-copy 35-day time shifts;
              per-group state is |bins| rows regardless of corpus —
              wall should track the scan (linear), the sorted fold
              invisible.
- mv_partials: the stream handler's kernel + the report merge over
              an 8-epoch partial log, variance states included —
              both are hash aggregates; linear.

    python scripts/bench_r14_ops_scale.py

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

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 2, 4, 8)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def _run(make):
    """Time the WHOLE pipeline: plan construction (incl. any driver
    planner actions) + a noop materialization."""
    t0 = time.perf_counter()
    make().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r14_ops_scale", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from tickdb_spark.operators import planner as _planner
    from tickdb_spark.operators import timeseries as _ts
    from tickdb_spark.streaming.index import _mv_partial_agg, groupby_mv_report

    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev_base.count()  # warm page cache

    def scaled_ev(f: int, shift_days: bool = False, offset_ids: bool = False):
        copies = spark.range(f).select(F.col("id").alias("k"))
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        if shift_days:
            ts_us = ts_us + F.col("k") * F.lit(35 * 86_400_000_000)
        eid = F.col("event_id")
        if offset_ids:
            eid = eid + F.col("k") * F.lit(10_000_000)
        return (
            ev_base.crossJoin(copies)
            .select(
                eid.alias("event_id"),
                ts_us.alias("ts_us"),
                "user_id",
                "event_type",
                "value",
            )
            .repartition(int(cpus))
            .localCheckpoint()
        )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey"
    ).localCheckpoint()

    # auto-width planner pass: big-side keys scale, width steps with them
    times, widths = [], []
    for f in FACTORS:
        big = scaled_ev(f, offset_ids=True).select(
            F.col("event_id").alias("k")
        )
        small = orders.select(F.col("o_orderkey").alias("k"))
        times.append(_run(lambda: _planner.choose_join_auto(
            big, "k", small, "k", broadcast_rows=100)))
        widths.append(
            _planner.choose_join_auto(
                big, "k", small, "k", broadcast_rows=100
            ).first()["width"]
        )
    print(json.dumps({"op": "choose_join_auto_keys", "sec": times,
                      "widths": widths, "log2_growth": growth(times)}))

    # seasonal strength: corpus scales, per-group state stays 24 bins
    times = []
    for f in FACTORS:
        ev = scaled_ev(f, shift_days=True)
        times.append(_run(lambda: _ts.seasonal_strength_anova(
            ev, ["event_type"], "(ts_us div 3600000000) % 24", "value",
            1_000)))
    print(json.dumps({"op": "seasonal_strength_events", "sec": times,
                      "log2_growth": growth(times)}))

    # MV variance partials: 8-epoch partial build + merge, both hash aggs
    times = []
    for f in FACTORS:
        ev = scaled_ev(f)
        parts = None
        for e in range(8):
            p = (
                _mv_partial_agg(
                    ev.where(F.col("event_id") % 8 == e),
                    ["event_type"], "value", 1_000_000, 1_000,
                )
                .withColumn("epoch", F.lit(e).cast("long"))
                .withColumn("rebuilt", F.lit(False))
            )
            parts = p if parts is None else parts.unionByName(p)
        merged = parts
        times.append(_run(lambda: groupby_mv_report(
            merged, ["event_type"], with_variance=True)))
    print(json.dumps({"op": "mv_variance_partials", "sec": times,
                      "log2_growth": growth(times)}))


if __name__ == "__main__":
    main()
