"""Planner-loop adversarial scaling (VERDICT r12 #5): drive choose_join
through 1x/2x/4x/8x growth of a ZIPF-SKEWED fact x dimension join and
verify (a) the decision FLIPS at the designed thresholds as the inputs
grow, and (b) the chosen strategy is the right call — every strategy is
timed at every scale, so the table shows what the planner saved.

Scenario geometry (factor f):
  * fact: 1.5M*f rows. Zipf-ish skew: 60% of rows on key 0, the rest
    uniform over 50k*f keys — hot-key concentration stays constant, so
    the salted rule keeps firing once broadcast stops applying. 60% is
    what makes the straggler visible on LOCAL hardware: a local shuffle
    is a memcpy, so a hot reducer must dominate wall time outright for
    salting to win here (on a network-bound cluster the win starts far
    earlier).
  * dim:  40k*f unique keys -> crosses the 100k broadcast ceiling
    between f=2 and f=4: decision flips broadcast_b -> salted.
  * bloom scenario: UNIFORM fact over 4M*f keys (mostly unique), dim =
    60k*f DISTINCT keys covering ~1.5% of the fact -> flips
    broadcast_b (f=1, 60k rows fits) -> bloom_reduced (f>=2: too many
    rows to broadcast, bitmap-sized key set, CMS certifies <=10%
    match). The CMS width must scale with the key cardinality for the
    certificate to beat collision noise (width 2^23 here; ~32 MB of
    counters per row at cluster scale — the documented cost of
    certifying at multi-million-key cardinality).

Strategies timed to a noop write with AUTO-BROADCAST DISABLED
(spark.sql.autoBroadcastJoinThreshold=-1), so "shuffle" really
shuffles — with the default 10 MB threshold every dim here would be
silently broadcast and the comparison would measure nothing. MIN of 2
runs per cell (box-stall discipline).

    python scripts/bench_planner_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.operators import planner  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

FACTORS = (1, 2, 4, 8)
REPS = 2


def _timed(df) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    print("## skewed fact x growing dim: broadcast -> salted flip\n")
    print("| f | n_fact | n_dim | decision | chosen s | shuffle s | salted s | broadcast s |")
    print("|---|---|---|---|---|---|---|---|")
    for f in FACTORS:
        n, keys, d = 1_500_000 * f, 50_000 * f, 40_000 * f
        fact = (
            spark.range(n)
            .select(
                F.when(F.col("id") % 5 < 3, F.lit(0))
                .otherwise(F.col("id") % keys)
                .alias("k")
            )
            .localCheckpoint(eager=True)
        )
        dim = (
            spark.range(d)
            .select(F.col("id").alias("k"), (F.col("id") * 7).alias("w"))
            .localCheckpoint(eager=True)
        )
        row = planner.choose_join(fact, "k", dim, "k").first()
        times = {
            "shuffle": _timed(fact.join(dim, "k")),
            "salted": _timed(
                planner.apply_join_decision(fact, dim, ["k"], "salted", salts=8)
            ),
            "broadcast": _timed(
                planner.apply_join_decision(fact, dim, ["k"], "broadcast_b")
            ),
        }
        chosen = times.get(
            {"broadcast_b": "broadcast", "broadcast_a": "broadcast"}.get(
                row["decision"], row["decision"]
            ),
            float("nan"),
        )
        print(
            f"| {f} | {n} | {d} | {row['decision']} | {chosen:.2f} "
            f"| {times['shuffle']:.2f} | {times['salted']:.2f} "
            f"| {times['broadcast']:.2f} |"
        )

    print("\n## uniform sparse-key fact x selective dim: broadcast -> bloom_reduced flip\n")
    print("| f | n_fact | n_dim | decision | est/n_a ppm | survivors ppm | bloom s | shuffle s | rows equal |")
    print("|---|---|---|---|---|---|---|---|---|")
    for f in FACTORS:
        n, keys, d = 1_500_000 * f, 4_000_000 * f, 60_000 * f
        fact = (
            spark.range(n)
            .select(((F.col("id") * 2_654_435_761) % keys).alias("k"))
            .localCheckpoint(eager=True)
        )
        # d DISTINCT dim keys striding the key space -> ~n*d/keys fact
        # rows match (~1.5%)
        dim = (
            spark.range(d)
            .select((F.col("id") * (keys // d)).alias("k"),
                    (F.col("id") * 3).alias("w"))
            .localCheckpoint(eager=True)
        )
        row = planner.choose_join(fact, "k", dim, "k", width=1 << 23).first()
        bloom = planner.bloom_reduced_join(fact, dim, "k")
        plain = fact.join(dim, "k")
        t_bloom = _timed(bloom)
        t_plain = _timed(plain)
        eq = bloom.count() == plain.count()
        # the quantity bloom reduction actually buys at cluster scale:
        # big-side rows that reach the shuffle (true matches + Bloom FPs)
        surv = plain.count() * 1_000_000 // n  # lower bound (FPR ~small)
        print(
            f"| {f} | {n} | {d} | {row['decision']} "
            f"| {row['est_rows'] * 1_000_000 // row['n_a']} | {surv} "
            f"| {t_bloom:.2f} | {t_plain:.2f} | {eq} |"
        )


if __name__ == "__main__":
    main()
