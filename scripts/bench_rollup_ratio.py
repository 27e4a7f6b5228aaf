"""Rollup-routing speedup at a production-shaped raw:rollup ratio.

BASELINE.md's round-1 table shows routing *parity* at sf0.1 because the
driver's events table is tiny per series (raw:rollup ≈ 1000:30). The
reference's rollup tree exists for the opposite regime — years of
sub-second ticks, where a day query over raw points scans millions of
rows per series but the day rollup holds a few hundred. This script
synthesizes that regime (one series, ~1 s cadence over N days), builds
the cascade, and times the SAME day query routed vs forced-raw, warm
(2nd run of each). Run:

    python scripts/bench_rollup_ratio.py [n_days] [points_per_sec]

Prints one JSON line: {"raw_sec": ..., "routed_sec": ..., "speedup": ...,
"n_points": ..., "verified_identical": true}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.ingest import append_batch, read_ticks  # noqa: E402
from tickdb_spark.rollup import RollupStore, route_tick_query  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402
from tickdb_spark.tickquery import run_tick_query  # noqa: E402


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    pps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_rollup_ratio",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    n_points = int(n_days * 86_400 * pps)
    step_ns = int(1e9 / pps)
    base_ns = 1_700_000_000 * 10**9  # 2023-11-14T22:13:20Z, day-unaligned ok
    # align base to a day boundary so the query bounds align for routing
    base_ns -= base_ns % (86_400 * 10**9)

    ticks = spark.range(n_points).select(
        F.lit("hf").alias("series"),
        (F.lit(base_ns) + F.col("id") * step_ns).alias("ts"),
        F.timestamp_micros(
            ((F.lit(base_ns) + F.col("id") * step_ns) / F.lit(1000)).cast("long")
        ).alias("ts_utc"),
        F.create_map(
            F.lit("price"), (F.col("id") % 1000).cast("double") / 10.0
        ).alias("value"),
    )

    wh = tempfile.mkdtemp(prefix="bench_rollup_ratio_")
    try:
        t0 = time.perf_counter()
        append_batch(wh, ticks)
        ingest_sec = time.perf_counter() - t0
        store = RollupStore(spark, wh)
        t0 = time.perf_counter()
        store.refresh()
        refresh_sec = time.perf_counter() - t0

        import datetime as dt

        frm_iso = dt.datetime.fromtimestamp(
            base_ns / 1e9, dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        to_iso = dt.datetime.fromtimestamp(
            (base_ns + n_days * 86_400 * 10**9) / 1e9, dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        query = {
            "index": "hf",
            "from": frm_iso,
            "to": to_iso,
            "group": "day",
            # the gate day-query's reducer set (OHLC + stats) — what a
            # dashboard actually asks a TSDB for
            "fields": {
                "price": ["sum", "count", "min", "max", "first", "last", "avg"]
            },
        }

        def timed(fn):
            fn().write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        raw_sec = timed(lambda: run_tick_query(read_ticks(spark, wh), query))
        routed_sec = timed(lambda: route_tick_query(spark, wh, query))

        raw_rows = run_tick_query(read_ticks(spark, wh), query).collect()
        routed_rows = route_tick_query(spark, wh, query).collect()
        identical = [tuple(r) for r in raw_rows] == [tuple(r) for r in routed_rows]

        print(
            json.dumps(
                {
                    "metric": "rollup_routing_speedup",
                    "n_points": n_points,
                    "n_days": n_days,
                    "ingest_sec": round(ingest_sec, 2),
                    "rollup_refresh_sec": round(refresh_sec, 2),
                    "raw_sec": round(raw_sec, 4),
                    "routed_sec": round(routed_sec, 4),
                    "speedup": round(raw_sec / routed_sec, 1),
                    "verified_identical": identical,
                }
            )
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
