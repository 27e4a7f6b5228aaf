"""Per-entry profiling harness for the optimization rounds.

Re-runs named registry entries in isolation with the noop sink
(optimization guide §1.4), labels jobs (§1.5), times construction and
execution separately (N reps, report all), and dumps
``.explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python scripts/profile_entries.py [--reps N] [--tag r16] \
        [--suffix before] name1 name2 ...
    python scripts/profile_entries.py --top 30        # heaviest from BENCH_local_r15
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        ref = json.loads(open("BENCH_local_r15.json").read().splitlines()[0])
        q = {k: v for k, v in ref["queries"].items()
             if k not in ("ingest_events_warehouse", "rollup_build_cascade")}
        names += [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]]

    from tickdb_spark.querybank import REGISTRY
    from tickdb_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile_entries", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.ui.enabled": "true"})

    import urllib.request

    def _stage_rows(app_id: str) -> dict[int, dict]:
        try:
            with urllib.request.urlopen(
                f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete",
                timeout=5,
            ) as r:
                stages = json.loads(r.read())
        except Exception:
            return {}
        return {
            s["stageId"]: {
                "tasks": s.get("numCompleteTasks"),
                "ms": s.get("executorRunTime"),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "name": (s.get("name") or "")[:60],
            }
            for s in stages
        }

    # Same warm-up as bench.py.
    REGISTRY["tick_point_get"].fn(spark, args.sf_dir).collect()
    spark.range(int(cpus), numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    plan_dir = os.path.join("plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        if name not in REGISTRY:
            print(f"!! unknown entry {name}", file=sys.stderr)
            continue
        con, run = [], []
        app_id = spark.sparkContext.applicationId
        pre = _stage_rows(app_id)
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} [rep {i}]")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            con.append(round(time.perf_counter() - t0, 4))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            run.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        post = _stage_rows(app_id)
        new_stages = {k: v for k, v in post.items() if k not in pre}
        hot = sorted(new_stages.values(), key=lambda s: -(s["ms"] or 0))[:6]
        for s in hot:
            print(f"    stage {s['ms']:>7} ms  {s['tasks']:>3} tasks  "
                  f"in={s['in_mb']} MB  shR={s['sh_r_mb']} shW={s['sh_w_mb']}  {s['name']}")
        if not args.no_plan:
            with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        out[name] = {"construct": con, "run": run}
        print(json.dumps({"name": name, "construct": con, "run": run}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
