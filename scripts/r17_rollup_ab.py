"""Serial A/B of the rollup cascade write shape (VERDICT r16 ask #2).

Usage: python scripts/r17_rollup_ab.py <salted|series|direct> [reps]

Fresh-process per shape; builds the EXACT bench workload (10 time-shifted
copies of sf0.1 events -> ~10M points appended once), then times
`RollupStore.refresh(("minute","hour","day"))` `reps` times (default 3)
and reports per-rep seconds, the MIN, and the per-level file counts the
shape produced. Run each shape in its own invocation so JVM/codegen
state never crosses shapes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

shape = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
os.environ["SPARKTICK_ROLLUP_WRITE_SHAPE"] = shape

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark import rollup as R  # noqa: E402
from tickdb_spark.ingest import append_batch  # noqa: E402
from tickdb_spark.querybank import events_as_ticks  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

R._WRITE_SHAPE = shape  # module already imported: pin explicitly

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name=f"rollup_ab_{shape}", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
)

ticks = events_as_ticks(spark, sf_dir)
shift = 35 * 86_400_000_000_000
big = ticks.crossJoin(spark.range(10).select(F.col("id").alias("k"))).select(
    "series",
    (F.col("ts") + F.col("k") * shift).alias("ts"),
    F.timestamp_micros(F.expr(f"(ts + k * {shift}) div 1000")).alias("ts_utc"),
    "value",
)

wh = tempfile.mkdtemp(prefix=f"rollup_ab_{shape}_")
append_batch(wh, big)

secs = []
for _ in range(reps):
    t0 = time.perf_counter()
    R.RollupStore(spark, wh).refresh(("minute", "hour", "day"))
    secs.append(round(time.perf_counter() - t0, 4))

files = {}
for unit in ("minute", "hour", "day"):
    path = os.path.join(wh, "rollups", unit)
    per_series = {}
    for root, _dirs, fs in os.walk(path):
        pq = [f for f in fs if f.endswith(".parquet")]
        if pq and "series=" in root:
            series = [p for p in root.split(os.sep) if p.startswith("series=")][0]
            per_series[series] = per_series.get(series, 0) + len(pq)
    files[unit] = {
        "total": sum(per_series.values()),
        "series_dirs": len(per_series),
        "max_per_series": max(per_series.values()) if per_series else 0,
    }

shutil.rmtree(wh, ignore_errors=True)
print(json.dumps({"shape": shape, "rep_secs": secs, "min": min(secs), "files": files}))
