"""Scale proof for the r16/r17 plan claims (VERDICT r16 ask #3).

Two probes at ~10-40x the bench input, each with task-count /
shuffle-byte profiles from the UI REST API and an oracle equality check
on the scaled data:

Probe A — the `_fan_small` gate (tpch_q1):
  40 disjoint-key copies of sf0.1 lineitem (~430 MB) written as a
  multi-file parquet dir. At the default 128 MB maxPartitionBytes the
  input is 4 splits < 32 cores, so the gate still fans (correct: the
  exchange buys 8x parallelism). At maxPartitionBytes=8m the scan is
  ~54 splits >= 32, and the gate must return the PLAIN scan — no
  round-robin Exchange in the plan, scan-stage task count >= cores.
  Both shapes are oracle-checked against DuckDB on the 40x data.

Probe B — the detector substrate caches (ngram_jaccard_pairs):
  10 copies of sf0.1 documents with a per-copy word prefix (disjoint
  shingle spaces: no cross-copy pairs, so pair volume scales exactly
  10x). Records wall time, pair count, the cached shingle-substrate
  size vs storage memory, and shuffle bytes; output equality vs the
  DuckDB twin on the same scaled corpus.

Writes plan dumps to plans/r17/scale_probe_*.txt and a JSON summary to
stdout. Scaled inputs are built under /tmp/r17_scale (reused if present).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.operators import dedup as D  # noqa: E402
from tickdb_spark.querybank import REGISTRY  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/r17_scale"
LI40 = os.path.join(BASE, "li40")
DOCS10 = os.path.join(BASE, "docs10")

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(
    app_name="r17_scale_probe",
    master=f"local[{cpus}]",
    shuffle_partitions=cpus,
    extra_conf={"spark.ui.enabled": "true"},
)
app_id = spark.sparkContext.applicationId


def stages() -> dict[int, dict]:
    with urllib.request.urlopen(
        f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete",
        timeout=10,
    ) as r:
        rows = json.loads(r.read())
    return {s["stageId"]: s for s in rows}


def stage_window(before: dict[int, dict]) -> dict:
    after = stages()
    new = [s for sid, s in after.items() if sid not in before]
    return {
        "n_stages": len(new),
        "task_counts": sorted((s["numCompleteTasks"] for s in new), reverse=True),
        "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in new),
        "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in new),
        "input_bytes": sum(s["inputBytes"] for s in new),
    }


def dump_plan(name: str, df) -> None:
    with open(f"/root/repo/plans/r17/{name}.txt", "w") as f:
        f.write(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )


def build_inputs() -> None:
    if not os.path.isdir(os.path.join(LI40, "lineitem.parquet")):
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        copies = spark.range(40).select(F.col("id").alias("k"))
        key_span = 10_000_000
        big = li.crossJoin(copies).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("k") * key_span
        ).drop("k")
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(LI40, "lineitem.parquet")
        )
    if not os.path.isdir(os.path.join(DOCS10, "documents.parquet")):
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        copies = spark.range(10).select(F.col("id").alias("k"))
        id_span = 10_000_000
        big = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("k") * id_span).alias("doc_id"),
            # per-copy word prefix => disjoint shingle spaces across
            # copies: intra-copy pair structure preserved exactly, no
            # cross-copy pairs, pair volume scales exactly 10x
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda w: F.concat(F.concat(F.lit("c"), F.col("k")), F.lit("q"), w),
                ),
                " ",
            ).alias("text"),
        )
        big.repartition(8).write.mode("overwrite").parquet(
            os.path.join(DOCS10, "documents.parquet")
        )


def duck_frame(sql: str, views: dict[str, str]):
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        for name, path in views.items():
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def frames_match(sdf_pd, odf_pd) -> bool:
    import pandas as pd

    cols = sorted(sdf_pd.columns)
    s = sdf_pd[cols].sort_values(cols).reset_index(drop=True)
    o = odf_pd[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)
    return True


def probe_a() -> dict:
    out: dict = {}
    q1 = REGISTRY["tpch_q1_pricing_summary"]
    for label, mpb in (("default_128m", None), ("small_splits_8m", "8m")):
        if mpb:
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        else:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        df = q1.fn(spark, LI40)
        dump_plan(f"scale_probe_q1_{label}", df)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        fanned = "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan
        before = stages()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        win = stage_window(before)
        sdf = q1.fn(spark, LI40).toPandas()
        odf = duck_frame(q1.oracle, {"lineitem": os.path.join(LI40, "lineitem.parquet")})
        out[label] = {
            "fan_exchange_in_plan": fanned,
            "wall_sec": round(wall, 2),
            "oracle_match": frames_match(sdf, odf),
            **win,
        }
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    return out


def probe_b() -> dict:
    docs = (
        spark.read.parquet(os.path.join(DOCS10, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
    )
    before = stages()
    t0 = time.perf_counter()
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0
    win = stage_window(before)
    dump_plan("scale_probe_ngram_pairs_10x", pairs)
    # cached substrate sizes vs storage memory
    with urllib.request.urlopen(
        f"http://localhost:4040/api/v1/applications/{app_id}/storage/rdd", timeout=10
    ) as r:
        rdds = json.loads(r.read())
    cache = [
        {
            "name": s["name"][:60],
            "mem_mb": round(s["memoryUsed"] / 2**20, 1),
            "disk_mb": round(s["diskUsed"] / 2**20, 1),
            "cached_fraction": round(
                s["numCachedPartitions"] / max(1, s["numPartitions"]), 3
            ),
        }
        for s in rdds
    ]
    t0 = time.perf_counter()
    odf = duck_frame(
        D.ngram_jaccard_pairs_sql("documents", "text", "doc_id", threshold=0.5),
        {"documents": os.path.join(DOCS10, "documents.parquet")},
    )
    oracle_sec = time.perf_counter() - t0
    match = frames_match(pairs.toPandas(), odf)
    return {
        "wall_sec": round(wall, 2),
        "n_pairs": n_pairs,
        "oracle_pairs": len(odf),
        "oracle_match": match,
        "oracle_sec": round(oracle_sec, 2),
        "cached_substrates": cache,
        **win,
    }


build_inputs()
result = {"probe_a_q1_fan_gate": probe_a(), "probe_b_detector_10x": probe_b()}
print(json.dumps(result, indent=1))
