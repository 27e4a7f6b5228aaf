"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology: one warm-up action first (JVM/codegen warm-up is not what we
are measuring — a 1000-executor cluster runs warm), then each query is
executed once with a count()-style action that materializes every row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tickdb_spark.querybank import REGISTRY
    from tickdb_spark.session import get_spark

    spark = get_spark(
        app_name="tickdb_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    # Warm-up: touch every input file once (OS page cache + parquet footer
    # reads), run one tiny query end to end (JIT/codegen paths).
    REGISTRY["tick_point_get"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "query_bank_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
