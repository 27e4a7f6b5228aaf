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


def _km_cells(
    df: DataFrame, group_col: str, duration_expr: str, event_expr: str
) -> DataFrame:
    """The shared first aggregate of the KM family: collapse subjects to
    ``(grp, dur, d, c, n_risk)`` cells — one hash aggregate plus one
    cumulative window, state per group = |distinct durations| rows."""
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
    return cells.withColumn(
        "n_risk",
        (
            F.sum(F.col("d") + F.col("c")).over(wall)
            - (F.sum(F.col("d") + F.col("c")).over(w) - (F.col("d") + F.col("c")))
        ).cast("long"),
    )


#: Default ceiling on distinct durations per group: the running
#: collect_list window materializes each row's full factor prefix, so D
#: distinct durations cost ~D²/2 struct copies per group (VERDICT r15
#: audit). D scales with duration RESOLUTION, not corpus size — day
#: granularity stays in the thousands forever; second-resolution input
#: must be bucketed in duration_expr (e.g. ``secs div 86400``), and
#: this guard makes that requirement an ERROR instead of a quadratic
#: window-state blowup.
KM_MAX_DURATIONS = 10_000


def _guard_max_durations(
    cells: DataFrame, max_durations: int, fn_name: str
) -> DataFrame:
    """Shared D-ceiling guard: error any group whose distinct-duration
    count exceeds the budget, telling the caller to bucket the duration
    column (shared by the product window, which is O(D²), and the
    hazard sum, where the ceiling just keeps state dimension-sized)."""
    wall = Window.partitionBy("grp")
    return cells.withColumn(
        "_n_durs", F.count(F.lit(1)).over(wall)
    ).where(
        F.assert_true(
            F.col("_n_durs") <= int(max_durations),
            F.lit(
                f"{fn_name}: a group exceeds max_durations="
                f"{int(max_durations)} distinct durations — coarsen "
                "duration_expr (bucket seconds to days) instead of "
                "raising the ceiling"
            ),
        ).isNull()
    ).drop("_n_durs")


def km_curve(
    df: DataFrame,
    group_col: str,
    duration_expr: str,
    event_expr: str,
    max_durations: int = KM_MAX_DURATIONS,
) -> DataFrame:
    """Per group: ``(group_col, duration, n_risk, d_events, c_censored,
    surv_ppm)`` — one row per distinct observed duration, survival as
    ppm of the group's population. ``duration_expr`` must be integer
    (exact cumulative sums); ``event_expr`` is a boolean (TRUE =
    event observed, FALSE = right-censored at that duration).
    ``max_durations`` bounds distinct durations per group (the running
    factor-prefix window is quadratic in it — bucket the duration
    instead of raising the ceiling)."""
    cells = _guard_max_durations(
        _km_cells(df, group_col, duration_expr, event_expr),
        max_durations, "km_curve",
    )
    w = Window.partitionBy("grp").orderBy("dur")
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


#: scale for the Nelson-Aalen hazard terms: each d/n quantizes to
#: floor(d·S/n) ≤ S = 10^9 per duration, so the cumulative BIGINT sum
#: has headroom to ~9×10^9 distinct durations — unreachable under the
#: KM_MAX_DURATIONS discipline.
_NA_SCALE = 10**9


def na_cumhaz(
    df: DataFrame,
    group_col: str,
    duration_expr: str,
    event_expr: str,
    max_durations: int = KM_MAX_DURATIONS,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard estimator (Nelson 1972, Aalen
    1978): per group and distinct duration t, ``H(t) = Σ_{t'≤t}
    d_{t'}/n_{t'}`` — the additive companion to the Kaplan-Meier
    product-limit curve (H ≈ −ln S for small hazards), preferred when
    hazard INCREMENTS are the signal (failure-rate monitoring, churn
    acceleration). Shares :func:`km_curve`'s cell aggregate.

    Unlike the KM product (a sorted FOLD, quadratic window state), the
    cumulative hazard is a plain ordered window SUM of per-duration
    terms — each term ``floor(d·S/n)`` is exact BIGINT arithmetic
    (truncating division, identical on both engines), so the running
    sum is exact integer and bit-identical cross-engine at any
    partitioning. Emits ``(group_col, duration, n_risk, d_events,
    c_censored, cumhaz_scaled)`` with the hazard at scale 10^9."""
    cells = _guard_max_durations(
        _km_cells(df, group_col, duration_expr, event_expr),
        max_durations, "na_cumhaz",
    )
    w = Window.partitionBy("grp").orderBy("dur")
    term = F.expr(f"d * {_NA_SCALE} div n_risk")
    return cells.withColumn("_t", term).withColumn(
        "cumhaz_scaled", F.sum("_t").over(w).cast("long")
    ).select(
        F.col("grp").alias(group_col),
        F.col("dur").alias("duration"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.col("c").alias("c_censored"),
        "cumhaz_scaled",
    )


def na_cumhaz_sql(
    rel: str,
    group_col: str,
    duration_expr: str,
    event_expr: str,
) -> str:
    """DuckDB twin of :func:`na_cumhaz`: same cells, same truncating
    integer term, same ordered window sum."""
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
    )
    SELECT grp AS {group_col}, dur AS duration, n_risk,
           d AS d_events, c AS c_censored,
           CAST(SUM(d * {_NA_SCALE} // n_risk)
                OVER (PARTITION BY grp ORDER BY dur) AS BIGINT)
             AS cumhaz_scaled
    FROM risk
    """


#: integer scales for the log-rank sums: expected-events terms carry
#: S_E = 10^6 (p₁ = n₁·S_E div n has 6 digits), variance terms carry
#: S_V = 10^4 PER FACTOR (the term multiplies p₁ᵥ·q₁ᵥ, so the summed
#: scale is S_V² = 10^8 — headroom Σd·10^8 ≤ 2^63 holds to ~9×10^10
#: events). Both are FLOOR-quantized integer arithmetic, so the sums
#: are exact BIGINTs and bit-identical cross-engine; the ~1e-4 relative
#: quantization is noise for a test statistic.
_LR_SE = 10**6
_LR_SV = 10**4

#: the final χ² as ONE fixed double expression of exact BIGINTs (the
#: Pearson discipline: same formula text on both engines, every integer
#: < 2^53 by the o·S_E guard, identical IEEE evaluation order) —
#: χ² = (O₁ − E₁)² / V with E₁ = e_scaled/S_E, V = v_scaled/S_V².
_LR_CHI2 = (
    "CASE WHEN v_scaled > 0 THEN"
    " (CAST(o_a AS DOUBLE) - CAST(e_a_scaled AS DOUBLE) / 1000000.0)"
    " * (CAST(o_a AS DOUBLE) - CAST(e_a_scaled AS DOUBLE) / 1000000.0)"
    " / (CAST(v_scaled AS DOUBLE) / 100000000.0)"
    " ELSE NULL END"
)


def km_logrank(
    df: DataFrame,
    group_col: str,
    duration_expr: str,
    event_expr: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966): are the survival curves
    of ``group_a`` and ``group_b`` the same? The natural follow-on to
    :func:`km_curve`, sharing its cell aggregate (`_km_cells`).

    The AUC/Mann-Whitney discipline applied to survival: per distinct
    EVENT duration t, the hypergeometric expectation and variance of
    group-a events given the margins —

      E₁ₜ = dₜ·n₁ₜ/nₜ        V₁ₜ = dₜ·(n₁ₜ/nₜ)·(n₂ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1)

    — are accumulated as FLOOR-QUANTIZED INTEGER sums (p₁ = n₁·S div n
    is exact BIGINT arithmetic, identical on both engines; float sums
    would be partition-order-dependent). The χ² statistic is one fixed
    double expression of the three exact integer sums at the end.

    Scale shape: the subject table collapses to (grp, dur) cells in one
    hash aggregate; the merge across groups is a |durations|-row pivot
    + one ordered window (dimension-sized — duration resolution, not
    corpus size, bounds it; see ``KM_MAX_DURATIONS``).

    Returns ONE row: ``(o_a, o_b, e_a_scaled, v_scaled, chi2_milli)``
    — observed events per group (exact), expected group-a events at
    scale 10^6, variance at scale 10^8, and the χ² statistic in milli
    units (NULL variance → NULL statistic: degenerate margins)."""
    cells = _km_cells(df, group_col, duration_expr, event_expr).where(
        F.col("grp").isin([group_a, group_b])
    )
    # pivot the two groups onto one row per duration; cumulative "ended
    # strictly before t" per group over the UNION of durations gives
    # n_g(t) even where g has no cell at t
    per_dur = cells.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == group_a, F.col("d")).otherwise(0))
        .cast("long").alias("d_a"),
        F.sum(F.when(F.col("grp") == group_b, F.col("d")).otherwise(0))
        .cast("long").alias("d_b"),
        F.sum(
            F.when(F.col("grp") == group_a, F.col("d") + F.col("c")).otherwise(0)
        ).cast("long").alias("end_a"),
        F.sum(
            F.when(F.col("grp") == group_b, F.col("d") + F.col("c")).otherwise(0)
        ).cast("long").alias("end_b"),
    )
    w = Window.orderBy("dur")
    wall = Window.partitionBy()
    risk = per_dur.select(
        "dur", "d_a", "d_b",
        (
            F.sum("end_a").over(wall)
            - (F.sum("end_a").over(w) - F.col("end_a"))
        ).cast("long").alias("n_a"),
        (
            F.sum("end_b").over(wall)
            - (F.sum("end_b").over(w) - F.col("end_b"))
        ).cast("long").alias("n_b"),
    ).where(F.col("d_a") + F.col("d_b") > 0)
    terms = risk.select(
        "d_a", "d_b",
        F.expr("n_a + n_b").alias("n"),
        F.expr("d_a + d_b").alias("d"),
        F.expr(f"n_a * {_LR_SE} div (n_a + n_b)").alias("p_se"),
        F.expr(f"n_a * {_LR_SV} div (n_a + n_b)").alias("p_sv"),
    )
    # overflow/2^53 guard: per-term e ≤ d·S_E, summed ≤ N·S_E — assert
    # the total stays a double-exact BIGINT (the MV guard discipline)
    out = terms.agg(
        F.coalesce(F.sum("d_a"), F.lit(0)).cast("long").alias("o_a"),
        F.coalesce(F.sum("d_b"), F.lit(0)).cast("long").alias("o_b"),
        F.coalesce(F.sum(F.expr("d * p_se")), F.lit(0))
        .cast("long").alias("e_a_scaled"),
        F.coalesce(
            F.sum(
                F.expr(
                    f"(d * (n - d) div greatest(n - 1, 1)) * p_sv"
                    f" * ({_LR_SV} - p_sv)"
                )
            ),
            F.lit(0),
        ).cast("long").alias("v_scaled"),
    )
    out = out.where(
        F.assert_true(
            (F.col("e_a_scaled") <= F.lit(2**53))
            & (F.col("v_scaled") <= F.lit(2**53)),
            F.lit(
                "km_logrank: a scaled log-rank sum exceeds 2^53 — "
                "double-exactness of the final statistic is lost; "
                "pre-aggregate or sample the cohort"
            ),
        ).isNull()
    )
    return out.withColumn(
        "chi2_milli",
        F.expr(f"CAST(floor(({_LR_CHI2}) * 1000.0 + 0.5) AS BIGINT)"),
    )


def km_logrank_sql(
    rel: str,
    group_col: str,
    duration_expr: str,
    event_expr: str,
    group_a: str,
    group_b: str,
) -> str:
    """DuckDB twin of :func:`km_logrank` — same cells, same pivot, same
    floor-quantized integer sums, same final χ² formula text (`_LR_CHI2`
    verbatim, so the one double expression is bit-identical)."""
    return f"""
    WITH subj AS (
      SELECT {group_col} AS grp,
             CAST({duration_expr} AS BIGINT) AS dur,
             CAST({event_expr} AS BOOLEAN) AS ev
      FROM {rel}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    cells AS (
      SELECT grp, dur,
             CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
      FROM subj GROUP BY grp, dur
    ),
    per_dur AS (
      SELECT dur,
             CAST(SUM(CASE WHEN grp = '{group_a}' THEN d ELSE 0 END) AS BIGINT) AS d_a,
             CAST(SUM(CASE WHEN grp = '{group_b}' THEN d ELSE 0 END) AS BIGINT) AS d_b,
             CAST(SUM(CASE WHEN grp = '{group_a}' THEN d + c ELSE 0 END) AS BIGINT) AS end_a,
             CAST(SUM(CASE WHEN grp = '{group_b}' THEN d + c ELSE 0 END) AS BIGINT) AS end_b
      FROM cells GROUP BY dur
    ),
    risk AS (
      SELECT dur, d_a, d_b,
             CAST(SUM(end_a) OVER ()
                  - (SUM(end_a) OVER (ORDER BY dur) - end_a) AS BIGINT) AS n_a,
             CAST(SUM(end_b) OVER ()
                  - (SUM(end_b) OVER (ORDER BY dur) - end_b) AS BIGINT) AS n_b
      FROM per_dur
    ),
    terms AS (
      SELECT d_a, d_b, n_a + n_b AS n, d_a + d_b AS d,
             n_a * {_LR_SE} // (n_a + n_b) AS p_se,
             n_a * {_LR_SV} // (n_a + n_b) AS p_sv
      FROM risk WHERE d_a + d_b > 0
    ),
    sums AS (
      SELECT CAST(COALESCE(SUM(d_a), 0) AS BIGINT) AS o_a,
             CAST(COALESCE(SUM(d_b), 0) AS BIGINT) AS o_b,
             CAST(COALESCE(SUM(d * p_se), 0) AS BIGINT) AS e_a_scaled,
             CAST(COALESCE(SUM((d * (n - d) // greatest(n - 1, 1)) * p_sv
                      * ({_LR_SV} - p_sv)), 0) AS BIGINT) AS v_scaled
      FROM terms
    )
    SELECT o_a, o_b, e_a_scaled, v_scaled,
           CAST(floor(({_LR_CHI2}) * 1000.0 + 0.5) AS BIGINT) AS chi2_milli
    FROM sums
    """
