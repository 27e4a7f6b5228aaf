"""Scaling curves for the r8 operators: wall time at 1x/2x/4x/8x input
for the sketch family (HLL / CMS / KMV), DSIR selection, LTTB
downsampling and the z-order layout stats.

The 100-TB question per op:
- hll / cms:     state is groups x m (or d x w) regardless of input —
                 wall should grow ~linearly in the SCAN only (the
                 aggregate is map-side combinable; no state growth).
- kmv_pairwise:  sketches are k ints per group; the pairwise combine
                 touches pairs x 2k rows — growing GROUPS grows pairs
                 quadratically but each pair stays k-bounded; growing
                 ROWS per group leaves the combine constant.
- dsir:          feature stream ~ tokens x 2 rows of 8-byte keys; the
                 weight table is B rows at any corpus size.
- lttb:          series-partitioned sequential scans; copies add SERIES
                 (the scale-out axis).
- zorder_stats:  one hash aggregate to 64 ranges at any row count.

    python scripts/bench_sketch_scale.py

One JSON line per op with [1x, 2x, 4x, 8x] seconds and log2 growth
(1.0 = linear, 2.0 = quadratic; sub-linear = overhead-dominated).
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

from bench_text_ops_scale import (  # noqa: E402
    scaled_docs,
    scaled_events,
    scaled_plain_docs,
)
from tickdb_spark.operators.dsir import dsir_select  # noqa: E402
from tickdb_spark.operators.layout import zorder_range_stats  # noqa: E402
from tickdb_spark.operators.sketch import (  # noqa: E402
    cms_build,
    hll_estimate,
    kmv_pairwise_jaccard,
    kmv_sketch,
)
from tickdb_spark.operators.timeseries import lttb_downsample  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

FACTORS = (1, 2, 4, 8)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def main() -> None:
    spark = get_spark(
        app_name="sketch_scale", master="local[32]", shuffle_partitions=32
    )

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    scaled_events(spark, 1).count()  # warm input caches
    scaled_docs(spark, 1).count()

    def ev_ud(f):
        return scaled_events(spark, f).select(
            "event_type",
            F.concat_ws(
                "-",
                (F.col("event_id") % 100000).cast("string"),
                F.expr("ts_us div 86400000000").cast("string"),
            ).alias("ud"),
        )

    ops = (
        ("hll", lambda f: hll_estimate(ev_ud(f), ["event_type"], "ud", p=7)),
        (
            "cms",
            lambda f: cms_build(
                scaled_docs(spark, f).select(
                    F.explode(
                        F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                    ).alias("v")
                ),
                "v",
            ),
        ),
        # kmv: groups (series) grow with the factor -> pairs grow ~f^2,
        # but each pair touches only 2k sketch rows
        (
            "kmv_pairwise",
            lambda f: kmv_pairwise_jaccard(
                kmv_sketch(ev_ud(f), "event_type", "ud", k=256), k=256
            ),
        ),
        (
            "dsir",
            lambda f: dsir_select(
                scaled_plain_docs(spark, f),
                scaled_plain_docs(spark, f).where("doc_id % 3 = 0"),
                k=120,
            ),
        ),
        (
            "lttb",
            lambda f: lttb_downsample(
                scaled_events(spark, f)
                .groupBy("event_type", "ts_us")
                .agg(F.max("value").alias("v")),
                "event_type",
                "ts_us",
                "v",
                n_out=40,
            ),
        ),
        (
            "zorder_stats",
            lambda f: zorder_range_stats(
                scaled_events(spark, f),
                F.col("event_id") % 100000,
                F.col("ts_us"),
            ),
        ),
    )
    for name, build in ops:
        times = [run(build(f)) for f in FACTORS]
        print(json.dumps({"op": name, "sec": times, "log2_growth": growth(times)}))


if __name__ == "__main__":
    main()
