"""Kaplan-Meier survival curves (Kaplan & Meier 1958) — duration
analysis over right-censored observations: churn ("how long do users
stay active"), job/run lifetimes, time-to-conversion. The reference
engine has nothing in this family; this extends the analytics surface
with the standard product-limit estimator.

Per group and distinct duration t: at-risk count ``n_t`` (subjects
whose duration ≥ t), events ``d_t``, censored ``c_t``, and the survival
probability ``S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'})``.

Cross-engine float discipline: ``n_t``/``d_t``/``c_t`` are EXACT
BIGINTs (one count aggregate + one cumulative window sum); each factor
``(1 − d/n)`` is one fixed double expression of exact integers; and the
cumulative PRODUCT folds over a DURATION-SORTED factor list (Spark's
1.0-seeded ``aggregate(array_sort(collect_list(...)))`` over a running
window == DuckDB's ordered ``list(...) OVER`` + seedless
``list_reduce`` — 1.0·x == x exactly, and multiplication in one fixed
order is bit-identical), then quantizes to ppm. The same sorted-fold
recipe that landed seasonal strength (r14) applied to a product instead
of a sum.

Scale shape: one hash aggregate to (group, duration) cells, one window
over cells (state per group = |distinct durations| rows, never
subjects), the fold over ≤|durations| factors per row. At 100 TB the
subject table collapses to cells in the first aggregate; everything
after is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the per-duration survival factor — ONE expression text both engines
#: run on exact integers (d can be 0: factor 1.0 exactly, a no-op term)
_FACTOR = "(CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))"


def km_curve(
    df: DataFrame,
    group_col: str,
    duration_expr: str,
    event_expr: str,
) -> DataFrame:
    """Per group: ``(group_col, duration, n_risk, d_events, c_censored,
    surv_ppm)`` — one row per distinct observed duration, survival as
    ppm of the group's population. ``duration_expr`` must be integer
    (exact cumulative sums); ``event_expr`` is a boolean (TRUE =
    event observed, FALSE = right-censored at that duration)."""
    subj = df.select(
        F.col(group_col).alias("grp"),
        F.expr(duration_expr).cast("long").alias("dur"),
        F.expr(event_expr).cast("boolean").alias("ev"),
    )
    cells = subj.groupBy("grp", "dur").agg(
        F.sum(F.when(F.col("ev"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("ev"), 0).otherwise(1)).cast("long").alias("c"),
    )
    w = Window.partitionBy("grp").orderBy("dur")
    wall = Window.partitionBy("grp")
    # at-risk at t includes subjects ending AT t: total − everyone who
    # ended strictly before t
    cells = cells.withColumn(
        "n_risk",
        (
            F.sum(F.col("d") + F.col("c")).over(wall)
            - (F.sum(F.col("d") + F.col("c")).over(w) - (F.col("d") + F.col("c")))
        ).cast("long"),
    )
    # duration-sorted running factor list → one fixed fold order: the
    # window collects the (dur, factor) structs over the running frame
    # (unbounded preceding → current row), the fold happens in a plain
    # projection (a whole fold can't BE the window expression)
    facs = F.collect_list(
        F.struct(F.col("dur").alias("dur"), F.expr(_FACTOR).alias("f"))
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = F.expr(
        "aggregate(array_sort(_facs), CAST(1.0 AS DOUBLE),"
        " (acc, x) -> acc * x.f)"
    )
    return cells.withColumn("_facs", facs).withColumn("surv_raw", run).select(
        F.col("grp").alias(group_col),
        F.col("dur").alias("duration"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.col("c").alias("c_censored"),
        F.expr("CAST(floor(surv_raw * 1000000.0 + 0.5) AS BIGINT)").alias(
            "surv_ppm"
        ),
    )


def km_curve_sql(
    rel: str,
    group_col: str,
    duration_expr: str,
    event_expr: str,
) -> str:
    """DuckDB twin: same cells, same cumulative at-risk window. DuckDB
    1.0 does not implement ORDER BY inside window aggregates, so the
    running ``list(...) OVER`` collects (dur, factor) STRUCTS in frame
    order and the next projection ``list_sort``s them (struct order =
    field order, dur first — the same total order as Spark's
    array_sort) before the seedless ``list_reduce`` product (1.0-seeded
    == seedless for multiplication: 1.0·x == x exactly)."""
    return f"""
    WITH subj AS (
      SELECT {group_col} AS grp,
             CAST({duration_expr} AS BIGINT) AS dur,
             CAST({event_expr} AS BOOLEAN) AS ev
      FROM {rel}
    ),
    cells AS (
      SELECT grp, dur,
             CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
      FROM subj GROUP BY grp, dur
    ),
    risk AS (
      SELECT grp, dur, d, c,
             CAST(SUM(d + c) OVER (PARTITION BY grp)
                  - (SUM(d + c) OVER (PARTITION BY grp ORDER BY dur)
                     - (d + c)) AS BIGINT) AS n_risk
      FROM cells
    ),
    collected AS (
      SELECT grp, dur, d, c, n_risk,
             list(struct_pack(dur := dur, f := {_FACTOR}))
               OVER (PARTITION BY grp ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS facs
      FROM risk
    ),
    folded AS (
      SELECT grp, dur, d, c, n_risk,
             list_reduce(list_transform(list_sort(facs), s -> s.f),
                         (x, y) -> x * y) AS surv_raw
      FROM collected
    )
    SELECT grp AS {group_col}, dur AS duration, n_risk,
           d AS d_events, c AS c_censored,
           CAST(floor(surv_raw * 1000000.0 + 0.5) AS BIGINT) AS surv_ppm
    FROM folded
    """
