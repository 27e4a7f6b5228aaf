"""Isolated ingest+rollup timing (the bench.py section), for A/B runs.

Usage: python scripts/bench_ingest_ab.py [reps]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tickdb_spark.ingest import append_batch
    from tickdb_spark.querybank import events_as_ticks
    from tickdb_spark.rollup import RollupStore
    from tickdb_spark.session import get_spark

    spark = get_spark(app_name="ingest_ab", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    ticks = events_as_ticks(spark, sf_dir)
    shift = 35 * 86_400_000_000_000
    big = ticks.crossJoin(spark.range(10).select(F.col("id").alias("k"))).select(
        "series",
        (F.col("ts") + F.col("k") * shift).alias("ts"),
        F.timestamp_micros(F.expr(f"(ts + k * {shift}) div 1000")).alias("ts_utc"),
        "value",
    )
    n_points = big.count()
    for i in range(reps):
        wh = tempfile.mkdtemp(prefix="ab_ingest_")
        spark.sparkContext.setJobDescription(f"ingest rep {i}")
        t0 = time.perf_counter()
        append_batch(wh, big)
        t_ing = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"rollup rep {i}")
        t0 = time.perf_counter()
        RollupStore(spark, wh).refresh(("minute", "hour", "day"))
        t_roll = time.perf_counter() - t0
        shutil.rmtree(wh, ignore_errors=True)
        print(f"rep {i}: ingest {t_ing:.3f}s ({n_points / t_ing:,.0f} pts/s)  "
              f"rollup {t_roll:.3f}s", flush=True)


if __name__ == "__main__":
    main()
