"""Scaling curves for the round-15 operators at 1x/2x/4x(/8x): MMR
diversified top-k, k-center greedy, the MV face's sparse-HLL register
states, and the lazy (width-as-column) auto-width planner vs the r14
collected variant.

The 100-TB question per op:
- mmr_select:     the corpus-sized stage is ONE cosine scan + a top-N
                  take; the greedy tail is prefilter-bounded driver
                  state. Wall should track the scan (linear in rows);
                  the k·N greedy is invisible.
- kcenter_select: k corpus aggregates (argmin per step) — linear in
                  rows per step, k fixed ⇒ linear overall, with the
                  accumulated greatest() chain adding ≤k folds/row.
- mv hll face:    the per-batch sparse-register kernel + the max-merge
                  report — hash aggregates, |keys|·min(batch, 2^p)
                  state; linear.
- lazy autowidth: same work as the r14 collect-then-build (the width
                  plan materializes either way); the lazy form must
                  not cost more — it only changes WHERE the width
                  flows (broadcast column vs driver literal).

    python scripts/bench_r15_ops_scale.py

One JSON line per op with per-factor seconds and log2 growth
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
FACTORS = (1, 2, 4)


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def main() -> None:
    spark = get_spark(
        app_name="bench_r15_ops",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_emb = emb.count()

    from tickdb_spark.operators.diversify import kcenter_select, mmr_select

    def emb_at(f):
        # id-offset copies: same geometry, f× rows, all ids distinct
        out = emb.select("vec_id", "embedding")
        cops = [
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                "embedding",
            )
            for i in range(1, f)
        ]
        for c in cops:
            out = out.unionByName(c)
        return out.localCheckpoint()

    for name, fn in (
        ("mmr_select", lambda d: mmr_select(d, 0, k=8, prefilter=64)),
        ("kcenter_select", lambda d: kcenter_select(d, k=8)),
    ):
        times = []
        for f in FACTORS:
            d = emb_at(f)
            t0 = time.perf_counter()
            fn(d).collect()  # k-row result; the op itself runs actions
            times.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"op": name, "sec": times, "rows": [n_emb * f for f in FACTORS],
                          "log2_growth": growth(times)}))

    # MV sparse-HLL register kernel + max-merge report at 1x-4x rows
    from tickdb_spark.operators.sketch import (
        hll_estimate_from_sparse,
        hll_hit_registers,
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_type", "user_id"
    )
    n_ev = ev.count()
    times = []
    for f in FACTORS:
        d = ev
        for i in range(1, f):
            d = d.unionByName(
                ev.select("event_type", (F.col("user_id") + i * 1_000_000).alias("user_id"))
            )
        d = d.localCheckpoint()
        t0 = time.perf_counter()
        hll_estimate_from_sparse(
            hll_hit_registers(d, ["event_type"], "user_id", 10),
            ["event_type"], 10,
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "mv_hll_register_states", "sec": times,
                      "rows": [n_ev * f for f in FACTORS],
                      "log2_growth": growth(times)}))

    # lazy autowidth vs the r14 shape (collect width, then rebuild at a
    # literal): identical work claim, measured
    from tickdb_spark.operators.planner import choose_join_auto, cms_width_plan
    from tickdb_spark.operators.sketch import cms_join_size_estimate, key_counts

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey"
    ).localCheckpoint()
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey"
    ).localCheckpoint()
    lazy_t, collected_t = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        choose_join_auto(li, "l_orderkey", orders, "o_orderkey").collect()
        lazy_t.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        ka = key_counts(li, "l_orderkey").localCheckpoint(eager=False)
        kb = key_counts(orders, "o_orderkey").localCheckpoint(eager=False)
        w = int(cms_width_plan(li, "l_orderkey", orders, "o_orderkey",
                               a_keys=ka, b_keys=kb).first()["width"])
        cms_join_size_estimate(li, "l_orderkey", orders, "o_orderkey",
                               4, w, a_keys=ka, b_keys=kb).collect()
        collected_t.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"op": "autowidth_lazy_vs_collected",
                      "lazy_sec": lazy_t, "collected_sec": collected_t,
                      "lazy_min": min(lazy_t), "collected_min": min(collected_t)}))


if __name__ == "__main__":
    main()
