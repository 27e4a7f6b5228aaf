"""Bench-methodology timing of named entries: one shared tuned session
(same get_spark shape as bench.py), entries in the given order, construct
and noop-write timed separately per rep. Usage:

    python scripts/r17_time_entries.py [--reps N] name1 name2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from tickdb_spark.querybank import REGISTRY
    from tickdb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r17_time_entries",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # same Arrow warm-up as bench.py
    spark.range(int(cpus), numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        for rep in range(args.reps):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            c = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            r = time.perf_counter() - t0
            print(
                f"{name:44s} rep{rep} construct {c:7.2f}s  run {r:7.2f}s",
                flush=True,
            )


main()
