"""Advanced time-series operators beyond the reference surface:
time-weighted average and gap-fill with last-observation-carried-forward.

Both are staples of production TSDBs (irregular sampling makes plain AVG
misleading; dashboards need dense bucket spines). Both are pure DataFrame
compositions — window + join, no Python — and both have exact SQL twins
for the oracle gate.

Scale: TWA is one window (partitioned by series, ordered by ts — the same
shuffle an aggregation needs) plus a hash aggregate. Gap-fill joins a
generated spine (buckets are few: range/width rows) against the bucketed
aggregate, then one ordered window for LOCF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def _series_parallel(df: DataFrame, series_col: str) -> DataFrame:
    """Pin the per-series exchange at the session's shuffle parallelism.

    AQE coalesces shuffle partitions by BYTES; per-series rolling windows
    are small in bytes but heavy in compute (a sorted window array per
    row), so AQE folds them into one task and serializes the operator
    (measured: rolling p90 at sf0.1 1.4 s coalesced vs 0.65 s pinned).
    A ``repartition(n, col)`` with an EXPLICIT partition count is exempt
    from AQE coalescing, and hash-by-series is exactly the distribution
    the window exchange needs, so Catalyst inserts no second shuffle —
    at any scale this costs nothing over the implicit exchange.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, series_col)


def time_weighted_avg(
    ticks: DataFrame,
    series: str,
    frm_ns: int,
    to_ns: int,
    width_ns: int,
    field: str = "value",
) -> DataFrame:
    """Per-bucket time-weighted average of a map field.

    Each point's value holds until the next point (step interpolation),
    clipped at its bucket's end; the last point in a bucket extends to the
    bucket end. TWA = Σ v·Δt / Σ Δt. Weights are BIGINT ns (exact); the
    weighted sum reduces through DECIMAL → identical across engines.
    """
    v = F.col("value").getItem(field)
    df = ticks.where(
        (F.col("series") == series) & (F.col("ts") >= frm_ns) & (F.col("ts") < to_ns)
    ).select("series", "ts", v.alias("v"))
    w = Window.partitionBy("series").orderBy("ts")
    bucket = (F.col("ts") - (F.col("ts") - F.lit(frm_ns)) % F.lit(width_ns)).alias("bucket")
    df = df.withColumn("next_ts", F.lead("ts").over(w)).select(
        bucket, "ts", "v", "next_ts"
    )
    bucket_end = F.col("bucket") + F.lit(width_ns)
    dt = F.least(F.coalesce(F.col("next_ts"), bucket_end), bucket_end) - F.col("ts")
    df = df.withColumn("dt", dt)
    return (
        df.groupBy("bucket")
        .agg(
            (
                F.sum((F.col("v") * F.col("dt")).cast(DEC)).cast("double")
                / F.sum("dt")
            ).alias(f"{field}_twa"),
            F.sum("dt").alias("covered_ns"),
        )
        .orderBy("bucket")
    )


def time_weighted_avg_sql(
    table_filter: str, frm_ns: int, to_ns: int, width_ns: int, field_alias: str = "value"
) -> str:
    """DuckDB twin over an events-style table; ``table_filter`` is the full
    FROM/WHERE for rows (ts TIMESTAMP, value DOUBLE)."""
    return f"""
    WITH pts AS (
      SELECT epoch_ns(ts) AS tns, value AS v FROM {table_filter}
    ), stepped AS (
      SELECT tns - ((tns - {frm_ns}) % {width_ns}) AS bucket, tns, v,
             lead(tns) OVER (ORDER BY tns) AS next_tns
      FROM pts
    ), weighted AS (
      SELECT bucket, v,
             least(coalesce(next_tns, bucket + {width_ns}), bucket + {width_ns}) - tns AS dt
      FROM stepped
    )
    SELECT bucket,
           CAST(SUM(CAST(v * dt AS DECIMAL(28,6))) AS DOUBLE) / SUM(dt)
             AS {field_alias}_twa,
           CAST(SUM(dt) AS BIGINT) AS covered_ns
    FROM weighted GROUP BY bucket ORDER BY bucket
    """


#: Buckets per fill chunk. The spine is processed in contiguous chunks so
#: every spine-sized window is partitioned by chunk id; only the chunk
#: DIRECTORY (|spine| / _CHUNK_BUCKETS rows — 481 rows for a year of 1 s
#: buckets) sees a global ordered window. Two-phase carry is exact for any
#: contiguous chunking, so the chunk size never affects values.
_CHUNK_BUCKETS = 65536


def _chunk_id(bucket_col: str, frm_ns: int, width_ns: int):
    # Integer `div` keeps the chunk id exact for ns-scale spines (a double
    # quotient is merely monotone, which would be correct but needlessly
    # imprecise).
    span = width_ns * _CHUNK_BUCKETS
    return F.expr(f"(({bucket_col} - {frm_ns}L) div {span}L)")


def _on_spine(bucketed: DataFrame, frm_ns: int, to_ns: int, width_ns: int, bucket_col: str) -> DataFrame:
    """Restrict observations to buckets the spine join would keep (aligned,
    in ``[frm, to)``) so the chunk-directory carry can't see rows the
    global-window formulation never saw."""
    b = F.col(bucket_col)
    return bucketed.where(
        (b >= frm_ns) & (b < to_ns) & ((b - frm_ns) % width_ns == 0)
    )


def gapfill_locf(
    bucketed: DataFrame,
    frm_ns: int,
    to_ns: int,
    width_ns: int,
    value_cols: list[str],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Densify a bucketed result onto the full bucket spine of
    ``[frm, to)`` and fill missing buckets by carrying the last observed
    value forward (LOCF). Buckets before the first observation stay NULL.

    ``n_obs`` marks real vs filled rows (count of source rows per bucket
    would be the caller's agg; here 1/0 presence flag).

    Scale: two-phase chunked carry. Phase 1 windows partition by chunk id
    (``_CHUNK_BUCKETS`` buckets each); phase 2 carries the per-chunk last
    observation across the chunk directory (a |spine|/65536-row frame —
    the only global window, bounded regardless of spine length). Values
    are identical to a single global LOCF window for any contiguous
    chunking.
    """
    spark = bucketed.sparkSession
    n = (to_ns - frm_ns) // width_ns
    n_chunks = (n + _CHUNK_BUCKETS - 1) // _CHUNK_BUCKETS
    spine = spark.range(n).select((F.lit(frm_ns) + F.col("id") * width_ns).alias(bucket_col))
    joined = spine.join(bucketed.withColumn("_present", F.lit(1)), bucket_col, "left")
    out = joined.withColumn("_chunk", _chunk_id(bucket_col, frm_ns, width_ns))

    # Phase 1: within-chunk LOCF (partitioned window, spine-sized frame).
    wp = (
        Window.partitionBy("_chunk")
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        out = out.withColumn(f"__in_{c}", F.last(c, ignorenulls=True).over(wp))

    if n_chunks == 1:
        # Single-chunk fast path: no preceding chunk exists, so the
        # cross-chunk carry is vacuously NULL — phase 1 IS the answer.
        # Skipping the directory join removes a scan of `bucketed`, an
        # aggregate, a window and a broadcast join from the plan
        # (measured 2x at sf0.1 where the gate spine is one chunk); the
        # chunked shape below is unchanged for large spines
        # (tests/test_plans.py pins both shapes).
        for c in value_cols:
            out = out.withColumn(c, F.col(f"__in_{c}")).drop(f"__in_{c}")
        return (
            out.withColumn("n_obs", F.coalesce(F.col("_present"), F.lit(0)))
            .drop("_present", "_chunk")
            .orderBy(bucket_col)
        )

    # Phase 2: per-chunk last observation, carried across the (tiny,
    # dense) chunk directory. Built from `bucketed` directly — observed
    # rows are the only non-null sources — so the spine isn't scanned
    # twice.
    chunk_dir = spark.range(n_chunks).select(F.col("id").alias("_chunk"))
    summary = (
        _on_spine(bucketed, frm_ns, to_ns, width_ns, bucket_col)
        .withColumn("_chunk", _chunk_id(bucket_col, frm_ns, width_ns))
        .groupBy("_chunk")
        .agg(
            *[
                F.max_by(
                    F.col(c), F.when(F.col(c).isNotNull(), F.col(bucket_col))
                ).alias(f"__cl_{c}")
                for c in value_cols
            ]
        )
    )
    wc = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    carry = chunk_dir.join(summary, "_chunk", "left")
    for c in value_cols:
        carry = carry.withColumn(
            f"__carry_{c}", F.last(f"__cl_{c}", ignorenulls=True).over(wc)
        )
    carry = carry.select("_chunk", *[f"__carry_{c}" for c in value_cols])

    out = out.join(F.broadcast(carry), "_chunk", "left")
    for c in value_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(f"__in_{c}"), F.col(f"__carry_{c}"))
        ).drop(f"__in_{c}", f"__carry_{c}")
    return (
        out.withColumn("n_obs", F.coalesce(F.col("_present"), F.lit(0)))
        .drop("_present", "_chunk")
        .orderBy(bucket_col)
    )


def gapfill_interp(
    bucketed: DataFrame,
    frm_ns: int,
    to_ns: int,
    width_ns: int,
    value_cols: list[str],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Densify a bucketed result onto the full bucket spine and fill
    missing buckets by LINEAR interpolation between the surrounding
    observed buckets: v = vp + (vn − vp)·(b − p)/(n − p). Buckets before
    the first / after the last observation stay NULL (interpolation has
    no anchor there — LOCF is the fill for trailing edges).

    The interpolation arithmetic is the same IEEE op sequence in the SQL
    twin (bigint gaps cast to double, one division, one fused order), so
    filled values hash identically cross-engine.

    Scale: same two-phase chunked shape as :func:`gapfill_locf` — spine
    windows partition by chunk id; prev/next anchors that cross a chunk
    boundary come from the chunk directory (|spine|/65536 rows, the only
    global window). Anchor VALUES and anchor BUCKETS are carried by the
    same per-chunk aggregates, so results are bit-identical to the single
    global-window formulation for any contiguous chunking.
    """
    spark = bucketed.sparkSession
    n = (to_ns - frm_ns) // width_ns
    n_chunks = (n + _CHUNK_BUCKETS - 1) // _CHUNK_BUCKETS
    spine = spark.range(n).select(
        (F.lit(frm_ns) + F.col("id") * width_ns).alias(bucket_col)
    )
    joined = spine.join(bucketed.withColumn("_present", F.lit(1)), bucket_col, "left")
    out = joined.withColumn("_chunk", _chunk_id(bucket_col, frm_ns, width_ns))

    # Phase 1: within-chunk anchors (partitioned windows).
    wp = (
        Window.partitionBy("_chunk")
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("_chunk")
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("_present") == 1, F.col(bucket_col))
    out = out.withColumn("__pb_in", F.last(obs_b, ignorenulls=True).over(wp))
    out = out.withColumn("__nb_in", F.first(obs_b, ignorenulls=True).over(wn))
    for c in value_cols:
        out = out.withColumn(f"__pv_in_{c}", F.last(c, ignorenulls=True).over(wp))
        out = out.withColumn(f"__nv_in_{c}", F.first(c, ignorenulls=True).over(wn))

    if n_chunks == 1:
        # Single-chunk fast path (see gapfill_locf): cross-chunk anchors
        # cannot exist, so the in-chunk anchors are the only anchors.
        prev_b = F.col("__pb_in")
        next_b = F.col("__nb_in")
        for c in value_cols:
            pv = F.col(f"__pv_in_{c}")
            nv = F.col(f"__nv_in_{c}")
            frac = (F.col(bucket_col) - prev_b).cast("double") / (
                next_b - prev_b
            ).cast("double")
            out = out.withColumn(
                c,
                F.when(F.col("_present") == 1, F.col(c)).otherwise(
                    F.when(
                        prev_b.isNotNull() & next_b.isNotNull(),
                        pv + (nv - pv) * frac,
                    )
                ),
            ).drop(f"__pv_in_{c}", f"__nv_in_{c}")
        return (
            out.withColumn("n_obs", F.coalesce(F.col("_present"), F.lit(0)))
            .drop("_present", "_chunk", "__pb_in", "__nb_in")
            .orderBy(bucket_col)
        )

    # Phase 2: per-chunk boundary anchors carried across the chunk
    # directory (every bucketed row is _present, so min/max(bucket) are
    # the chunk's first/last observed anchors).
    chunk_dir = spark.range(n_chunks).select(F.col("id").alias("_chunk"))
    summary = (
        _on_spine(bucketed, frm_ns, to_ns, width_ns, bucket_col)
        .withColumn("_chunk", _chunk_id(bucket_col, frm_ns, width_ns))
        .groupBy("_chunk")
        .agg(
            F.max(bucket_col).alias("__lob"),
            F.min(bucket_col).alias("__fob"),
            *[
                F.max_by(
                    F.col(c), F.when(F.col(c).isNotNull(), F.col(bucket_col))
                ).alias(f"__lv_{c}")
                for c in value_cols
            ],
            *[
                F.min_by(
                    F.col(c), F.when(F.col(c).isNotNull(), F.col(bucket_col))
                ).alias(f"__fv_{c}")
                for c in value_cols
            ],
        )
    )
    wcp = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    wcn = Window.orderBy("_chunk").rowsBetween(1, Window.unboundedFollowing)
    carry = chunk_dir.join(summary, "_chunk", "left")
    carry = carry.withColumn("__pb_c", F.last("__lob", ignorenulls=True).over(wcp))
    carry = carry.withColumn("__nb_c", F.first("__fob", ignorenulls=True).over(wcn))
    for c in value_cols:
        carry = carry.withColumn(
            f"__pv_c_{c}", F.last(f"__lv_{c}", ignorenulls=True).over(wcp)
        )
        carry = carry.withColumn(
            f"__nv_c_{c}", F.first(f"__fv_{c}", ignorenulls=True).over(wcn)
        )
    carry = carry.select(
        "_chunk",
        "__pb_c",
        "__nb_c",
        *[f"__pv_c_{c}" for c in value_cols],
        *[f"__nv_c_{c}" for c in value_cols],
    )

    out = out.join(F.broadcast(carry), "_chunk", "left")
    prev_b = F.coalesce(F.col("__pb_in"), F.col("__pb_c"))
    next_b = F.coalesce(F.col("__nb_in"), F.col("__nb_c"))
    for c in value_cols:
        pv = F.coalesce(F.col(f"__pv_in_{c}"), F.col(f"__pv_c_{c}"))
        nv = F.coalesce(F.col(f"__nv_in_{c}"), F.col(f"__nv_c_{c}"))
        frac = (F.col(bucket_col) - prev_b).cast("double") / (
            next_b - prev_b
        ).cast("double")
        out = out.withColumn(
            c,
            F.when(F.col("_present") == 1, F.col(c)).otherwise(
                F.when(
                    prev_b.isNotNull() & next_b.isNotNull(), pv + (nv - pv) * frac
                )
            ),
        ).drop(f"__pv_in_{c}", f"__nv_in_{c}", f"__pv_c_{c}", f"__nv_c_{c}")
    return (
        out.withColumn("n_obs", F.coalesce(F.col("_present"), F.lit(0)))
        .drop("_present", "_chunk", "__pb_in", "__nb_in", "__pb_c", "__nb_c")
        .orderBy(bucket_col)
    )


def gapfill_multi(
    bucketed: DataFrame,
    series_col: str,
    frm_ns: int,
    to_ns: int,
    width_ns: int,
    locf_cols: list[str] = (),
    interp_cols: list[str] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """Multi-series gap-fill: densify EVERY series onto the full bucket
    spine in one pass — the dashboard shape (10k series, one query), vs
    the single-series helpers above (one aggregate's spine).

    Spine = (distinct series in the input) × (bucket sequence): the
    cross join is |series| · |buckets| rows — spine-sized, never
    corpus-sized — and every window below is ``partitionBy(series)``,
    so no single-partition window exists at any scale (the plan test
    pins this). ``locf_cols`` fill by last-observation-carried-forward;
    ``interp_cols`` by linear interpolation between surrounding observed
    buckets (same IEEE op sequence as :func:`gapfill_interp`, so filled
    doubles hash-match the SQL twin). A series only appears if it has
    ≥1 observed bucket in range (the spine can't invent series).
    """
    spark = bucketed.sparkSession
    n = (to_ns - frm_ns) // width_ns
    buckets = spark.range(n).select(
        (F.lit(frm_ns) + F.col("id") * width_ns).alias(bucket_col)
    )
    spine = bucketed.select(series_col).distinct().crossJoin(buckets)
    joined = spine.join(
        bucketed.withColumn("_present", F.lit(1)), [series_col, bucket_col], "left"
    )
    wp = (
        Window.partitionBy(series_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(series_col)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = joined
    for c in locf_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(wp))
    obs_b = F.when(F.col("_present") == 1, F.col(bucket_col))
    prev_b = F.last(obs_b, ignorenulls=True).over(wp)
    next_b = F.first(obs_b, ignorenulls=True).over(wn)
    for c in interp_cols:
        pv = F.last(c, ignorenulls=True).over(wp)
        nv = F.first(c, ignorenulls=True).over(wn)
        frac = (F.col(bucket_col) - prev_b).cast("double") / (
            next_b - prev_b
        ).cast("double")
        out = out.withColumn(
            c,
            F.when(F.col("_present") == 1, F.col(c)).otherwise(
                F.when(
                    prev_b.isNotNull() & next_b.isNotNull(), pv + (nv - pv) * frac
                )
            ),
        )
    return (
        out.withColumn("n_obs", F.coalesce(F.col("_present"), F.lit(0)))
        .drop("_present")
        .orderBy(series_col, bucket_col)
    )


def gapfill_multi_sql(
    inner_sql: str,
    series_col: str,
    frm_ns: int,
    to_ns: int,
    width_ns: int,
    locf_cols: list[str] = (),
    interp_cols: list[str] = (),
) -> str:
    """DuckDB twin of :func:`gapfill_multi`; ``inner_sql`` must yield
    (``series_col``, bucket BIGINT, <value cols>)."""
    s = series_col
    wp = (
        f"OVER (PARTITION BY {s} ORDER BY bucket "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    wn = (
        f"OVER (PARTITION BY {s} ORDER BY bucket "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    prev_b = f"last_value(CASE WHEN present THEN bucket END IGNORE NULLS) {wp}"
    next_b = f"first_value(CASE WHEN present THEN bucket END IGNORE NULLS) {wn}"
    fills = []
    for c in locf_cols:
        fills.append(f"last_value({c} IGNORE NULLS) {wp} AS {c}")
    for c in interp_cols:
        pv = f"last_value({c} IGNORE NULLS) {wp}"
        nv = f"first_value({c} IGNORE NULLS) {wn}"
        fills.append(
            f"""CASE WHEN present THEN {c}
                WHEN {prev_b} IS NOT NULL AND {next_b} IS NOT NULL
                THEN {pv} + ({nv} - {pv})
                     * (CAST(bucket - {prev_b} AS DOUBLE)
                        / CAST({next_b} - {prev_b} AS DOUBLE))
                ELSE NULL END AS {c}"""
        )
    fill_sql = ",\n           ".join(fills)
    return f"""
    WITH agg AS ({inner_sql}),
    spine AS (
      SELECT sr.{s}, {frm_ns} + (g.x * {width_ns}) AS bucket
      FROM (SELECT DISTINCT {s} FROM agg) sr,
           (SELECT unnest(range(0, {(to_ns - frm_ns) // width_ns})) AS x) g
    ),
    j AS (
      SELECT spine.{s} AS {s}, spine.bucket AS bucket,
             agg.bucket IS NOT NULL AS present,
             {", ".join(f"agg.{c} AS {c}" for c in [*locf_cols, *interp_cols])}
      FROM spine LEFT JOIN agg
        ON spine.{s} = agg.{s} AND spine.bucket = agg.bucket
    )
    SELECT {s}, bucket,
           {fill_sql},
           CASE WHEN present THEN 1 ELSE 0 END AS n_obs
    FROM j ORDER BY {s}, bucket
    """


def gapfill_interp_sql(
    inner_sql: str, frm_ns: int, to_ns: int, width_ns: int, value_cols: list[str]
) -> str:
    """DuckDB twin of :func:`gapfill_interp`; ``inner_sql`` must yield
    (bucket BIGINT, <value_cols>)."""
    fills = ",\n           ".join(
        f"""CASE WHEN agg.bucket IS NOT NULL THEN agg.{c}
                WHEN last_value(agg.bucket IGNORE NULLS) OVER (ORDER BY spine.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL
                 AND first_value(agg.bucket IGNORE NULLS) OVER (ORDER BY spine.bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) IS NOT NULL
                THEN last_value(agg.{c} IGNORE NULLS) OVER (ORDER BY spine.bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     + (first_value(agg.{c} IGNORE NULLS) OVER (ORDER BY spine.bucket
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        - last_value(agg.{c} IGNORE NULLS) OVER (ORDER BY spine.bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                       * (CAST(spine.bucket
                               - last_value(agg.bucket IGNORE NULLS) OVER (ORDER BY spine.bucket
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                          / CAST(first_value(agg.bucket IGNORE NULLS) OVER (ORDER BY spine.bucket
                                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                                 - last_value(agg.bucket IGNORE NULLS) OVER (ORDER BY spine.bucket
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE))
                ELSE NULL END AS {c}"""
        for c in value_cols
    )
    return f"""
    WITH agg AS ({inner_sql}),
    spine AS (
      SELECT {frm_ns} + (g.x * {width_ns}) AS bucket
      FROM (SELECT unnest(range(0, {(to_ns - frm_ns) // width_ns})) AS x) g
    )
    SELECT spine.bucket,
           {fills},
           CASE WHEN agg.bucket IS NULL THEN 0 ELSE 1 END AS n_obs
    FROM spine LEFT JOIN agg ON spine.bucket = agg.bucket
    ORDER BY spine.bucket
    """


def gapfill_locf_sql(
    inner_sql: str, frm_ns: int, to_ns: int, width_ns: int, value_cols: list[str]
) -> str:
    """DuckDB twin; ``inner_sql`` must yield (bucket BIGINT, <value_cols>)."""
    fills = ",\n           ".join(
        f"last_value({c} IGNORE NULLS) OVER (ORDER BY spine.bucket "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"
        for c in value_cols
    )
    return f"""
    WITH agg AS ({inner_sql}),
    spine AS (
      SELECT {frm_ns} + (g.x * {width_ns}) AS bucket
      FROM (SELECT unnest(range(0, {(to_ns - frm_ns) // width_ns})) AS x) g
    )
    SELECT spine.bucket,
           {fills},
           CASE WHEN agg.bucket IS NULL THEN 0 ELSE 1 END AS n_obs
    FROM spine LEFT JOIN agg ON spine.bucket = agg.bucket
    ORDER BY spine.bucket
    """


def rolling_zscore_anomalies(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    lookback: int = 24,
    k: int = 3,
    min_n: int = 12,
    scale: int = 100,
) -> DataFrame:
    """Per-series anomaly detection: flag points more than ``k`` standard
    deviations from the trailing ``lookback``-point baseline (the
    monitoring primitive every TSDB grows: spike/step detection on
    metrics streams).

    Exact integer arithmetic end to end: values are quantized to
    ``floor(v * scale + 0.5)`` (exact when the data has <= log10(scale)
    decimals, deterministic IEEE either way), and the z-test is evaluated
    in cleared-denominator form over BIGINT window sums::

        |q - mean| > k * sigma
        <=> (c*q - s)^2 > k^2 * (c*ss - s^2)        [population variance]

    No floats, no sqrt, no division — the flag is bit-reproducible on any
    engine and any partitioning. Windows are ``partitionBy(series)``
    (never a global sort); the frame excludes the current row so a spike
    can't mask itself by inflating its own baseline.

    Returns only the flagged rows: ``(series, ts, id, value, baseline_n,
    dev_sq, thresh_sq)`` with ``dev_sq > thresh_sq`` guaranteed.

    Magnitude bound (ADVICE r6): the cleared-denominator test squares
    BIGINT sums, and Spark longs WRAP on overflow while DuckDB raises —
    silent divergence. Every quantized value must satisfy
    ``|q| <= sqrt(2^63-1) / (lookback * max(2, k))`` (conservative worst
    case for both ``dev_sq`` and ``thresh_sq``); a checked
    ``assert_true`` makes a violation an ERROR on the Spark side too,
    never a wrapped wrong answer. Defaults allow |value| up to ~4.2e5
    at scale=100.
    """
    qbound = int((2**63 - 1) ** 0.5) // (lookback * max(2, k))
    q = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    q = F.when(
        F.assert_true(
            F.abs(q) <= qbound,
            F.concat(
                F.lit(
                    f"rolling_zscore_anomalies: |value*{scale}| exceeds the "
                    f"overflow-safe bound {qbound} (Spark longs would wrap "
                    "silently); raise `scale` down or shrink lookback/k: "
                ),
                F.col(value_col).cast("string"),
            ),
        ).isNull(),
        q,
    )
    w = (
        Window.partitionBy(series_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-lookback, -1)
    )
    d = (
        _series_parallel(df, series_col).withColumn("_q", q)
        .withColumn("_c", F.count("_q").over(w).cast("long"))
        .withColumn("_s", F.sum("_q").over(w).cast("long"))
        .withColumn("_ss", F.sum(F.col("_q") * F.col("_q")).over(w).cast("long"))
    )
    dev_sq = (F.col("_c") * F.col("_q") - F.col("_s")) * (
        F.col("_c") * F.col("_q") - F.col("_s")
    )
    thresh_sq = F.lit(k * k) * (F.col("_c") * F.col("_ss") - F.col("_s") * F.col("_s"))
    return (
        d.withColumn("dev_sq", dev_sq)
        .withColumn("thresh_sq", thresh_sq)
        .where((F.col("_c") >= min_n) & (F.col("dev_sq") > F.col("thresh_sq")))
        .select(
            F.col(series_col).alias("series"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(value_col).alias("value"),
            F.col("_c").alias("baseline_n"),
            "dev_sq",
            "thresh_sq",
        )
    )


def rolling_zscore_anomalies_sql(
    table: str,
    series_col: str,
    ts_expr: str,
    id_col: str,
    value_col: str,
    lookback: int = 24,
    k: int = 3,
    min_n: int = 12,
    scale: int = 100,
) -> str:
    """DuckDB twin: identical quantization, window frame, and cleared-
    denominator test (window sums pass through HUGEINT, cast back)."""
    return f"""
    SELECT {series_col} AS series, ts, id, value,
           _c AS baseline_n, dev_sq, thresh_sq
    FROM (
      SELECT {series_col}, ts, id, value, _q, _c, _s, _ss,
             (_c * _q - _s) * (_c * _q - _s) AS dev_sq,
             {k * k} * (_c * _ss - _s * _s) AS thresh_sq
      FROM (
        SELECT {series_col}, {ts_expr} AS ts, {id_col} AS id,
               {value_col} AS value,
               CAST(floor({value_col} * {scale} + 0.5) AS BIGINT) AS _q,
               CAST(count(*) OVER w AS BIGINT) AS _c,
               CAST(COALESCE(sum(CAST(floor({value_col} * {scale} + 0.5) AS BIGINT))
                    OVER w, 0) AS BIGINT) AS _s,
               CAST(COALESCE(sum(CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)
                        * CAST(floor({value_col} * {scale} + 0.5) AS BIGINT))
                    OVER w, 0) AS BIGINT) AS _ss
        FROM {table}
        WINDOW w AS (
          PARTITION BY {series_col} ORDER BY {ts_expr}, {id_col}
          ROWS BETWEEN {lookback} PRECEDING AND 1 PRECEDING
        )
      )
    )
    WHERE _c >= {min_n} AND dev_sq > thresh_sq
    """


def rolling_quantile(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window: int = 25,
    q: float = 0.5,
    out_col: str | None = None,
) -> DataFrame:
    """Exact trailing rolling quantile per series as a SELECTED ELEMENT:
    the k-th smallest of the window where k = ceil(q * window) — the
    inverted-CDF (type-1) quantile, never an interpolation, so the
    result is an exact input value on any engine. q=0.5 with an odd
    window is the rolling median; q=0.9 is the p90 latency monitor.
    Windows are ``partitionBy(series)``; partial windows dropped."""
    import math

    k = min(max(math.ceil(q * window), 1), window)
    w = (
        Window.partitionBy(series_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(window - 1), 0)
    )
    name = out_col or f"q{int(q * 100)}_{window}"
    df = _series_parallel(df, series_col)
    d = df.withColumn("_n", F.count(value_col).over(w)).withColumn(
        "_qv", F.element_at(F.array_sort(F.collect_list(value_col).over(w)), k)
    )
    return (
        d.where(F.col("_n") == window)
        .select(
            F.col(series_col).alias("series"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(value_col).alias("value"),
            F.col("_qv").alias(name),
        )
    )


def rolling_quantile_sql(
    table: str,
    series_col: str,
    ts_expr: str,
    id_col: str,
    value_col: str,
    window: int = 25,
    q: float = 0.5,
    out_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`rolling_quantile`."""
    import math

    k = min(max(math.ceil(q * window), 1), window)
    name = out_col or f"q{int(q * 100)}_{window}"
    return f"""
    SELECT {series_col} AS series, ts, id, value,
           list_sort(vals)[{k}] AS {name}
    FROM (
      SELECT {series_col}, {ts_expr} AS ts, {id_col} AS id,
             {value_col} AS value,
             count({value_col}) OVER w AS _n,
             list({value_col}) OVER w AS vals
      FROM {table}
      WINDOW w AS (
        PARTITION BY {series_col} ORDER BY {ts_expr}, {id_col}
        ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
      )
    )
    WHERE _n = {window}
    """


def rolling_median(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window: int = 25,
) -> DataFrame:
    """Exact trailing rolling median per series — the robust smoother for
    noisy metric streams (median filters survive outliers that wreck
    moving averages).

    ``window`` must be ODD: the median of an odd-count window is a
    SELECTED ELEMENT, not an interpolation, so the result is an exact
    input value — deterministic on any engine regardless of how its
    percentile/quantile functions interpolate. Implementation: sorted
    window array + element_at((window+1)/2); rows without a full window
    are dropped (no partial-window edge semantics to disagree on).
    Windows are ``partitionBy(series)`` only.
    """
    if window % 2 == 0:
        raise ValueError("window must be odd (median = exact element)")
    w = (
        Window.partitionBy(series_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(window - 1), 0)
    )
    mid = (window + 1) // 2
    df = _series_parallel(df, series_col)
    d = df.withColumn("_n", F.count(value_col).over(w)).withColumn(
        "_med", F.element_at(F.array_sort(F.collect_list(value_col).over(w)), mid)
    )
    return (
        d.where(F.col("_n") == window)
        .select(
            F.col(series_col).alias("series"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(value_col).alias("value"),
            F.col("_med").alias(f"median{window}"),
        )
    )


def rolling_median_sql(
    table: str,
    series_col: str,
    ts_expr: str,
    id_col: str,
    value_col: str,
    window: int = 25,
) -> str:
    """DuckDB twin: list() window -> list_sort -> 1-based middle element."""
    mid = (window + 1) // 2
    return f"""
    SELECT {series_col} AS series, ts, id, value,
           list_sort(vals)[{mid}] AS median{window}
    FROM (
      SELECT {series_col}, {ts_expr} AS ts, {id_col} AS id,
             {value_col} AS value,
             count({value_col}) OVER w AS _n,
             list({value_col}) OVER w AS vals
      FROM {table}
      WINDOW w AS (
        PARTITION BY {series_col} ORDER BY {ts_expr}, {id_col}
        ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
      )
    )
    WHERE _n = {window}
    """


def downsample_m4(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    bucket_ns: int,
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, pixel
    bucket) keep min / max / first / last — the four points that make a
    line chart of the bucket pixel-identical to the full-resolution
    render, at millions-to-thousands reduction. THE query behind every
    zoomed-out dashboard panel.

    Tie rules are explicit so the result is engine-exact: ``first`` /
    ``last`` are the MIN value among rows sharing the earliest / latest
    timestamp; ``ts_at_min`` / ``ts_at_max`` are the EARLIEST timestamp
    achieving the extreme value. One window + one hash aggregate, both
    keyed (series, bucket) — no global sort, scales with series x
    buckets.
    """
    bucket = (F.col(ts_col) - (F.col(ts_col) % F.lit(bucket_ns))).alias("bucket")
    w = Window.partitionBy("series", "bucket")
    d = (
        df.select(F.col(series_col).alias("series"), bucket, F.col(ts_col).alias("ts"),
                  F.col(value_col).alias("v"))
        .withColumn("_vmin", F.min("v").over(w))
        .withColumn("_vmax", F.max("v").over(w))
        .withColumn("_tmin", F.min("ts").over(w))
        .withColumn("_tmax", F.max("ts").over(w))
    )
    return (
        d.groupBy("series", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.first("_vmin").alias("v_min"),
            F.first("_vmax").alias("v_max"),
            F.min(F.when(F.col("v") == F.col("_vmin"), F.col("ts"))).alias("ts_at_min"),
            F.min(F.when(F.col("v") == F.col("_vmax"), F.col("ts"))).alias("ts_at_max"),
            F.min(F.when(F.col("ts") == F.col("_tmin"), F.col("v"))).alias("v_first"),
            F.min(F.when(F.col("ts") == F.col("_tmax"), F.col("v"))).alias("v_last"),
        )
    )


def downsample_m4_sql(
    table: str, series_col: str, ts_expr: str, value_col: str, bucket_ns: int
) -> str:
    """DuckDB twin: same window + aggregate with the same tie rules."""
    return f"""
    SELECT series, bucket,
           count(*)::BIGINT AS n_points,
           min(v) AS v_min, max(v) AS v_max,
           min(CASE WHEN v = _vmin THEN ts END) AS ts_at_min,
           min(CASE WHEN v = _vmax THEN ts END) AS ts_at_max,
           min(CASE WHEN ts = _tmin THEN v END) AS v_first,
           min(CASE WHEN ts = _tmax THEN v END) AS v_last
    FROM (
      SELECT {series_col} AS series,
             ({ts_expr}) - (({ts_expr}) % {bucket_ns}) AS bucket,
             {ts_expr} AS ts, {value_col} AS v,
             min({value_col}) OVER w AS _vmin,
             max({value_col}) OVER w AS _vmax,
             min({ts_expr}) OVER w AS _tmin,
             max({ts_expr}) OVER w AS _tmax
      FROM {table}
      WINDOW w AS (
        PARTITION BY {series_col},
                     ({ts_expr}) - (({ts_expr}) % {bucket_ns})
      )
    )
    GROUP BY series, bucket
    """


def winsorize(
    df: DataFrame,
    series_col: str,
    id_col: str,
    value_col: str,
    q_lo: float = 0.01,
    q_hi: float = 0.99,
) -> DataFrame:
    """Per-series winsorization: clamp values to the series' [q_lo, q_hi]
    quantiles — the outlier-capping step of feature/metric preprocessing
    (a handful of corrupt points otherwise dominate sums, fits, and
    normalizations).

    Quantiles are inverted-CDF SELECTED elements (k-th smallest with
    k = ceil(q*n), clamped to [1, n]) — exact input values, engine-exact
    like :func:`rolling_quantile`. Shape: one (series)-partitioned
    value-ordered window computes each row's rank; the rows AT the two
    cut ranks carry the cut values, a per-series aggregate broadcasts
    them back (rows-per-series never materializes as an array anywhere),
    then a codegen clamp. Scales with the corpus, not group fan-in.
    """
    wv = Window.partitionBy(series_col).orderBy(value_col, id_col)
    ws = Window.partitionBy(series_col)
    d = (
        _series_parallel(df, series_col)
        .withColumn("_r", F.row_number().over(wv))
        .withColumn("_n", F.count(F.lit(1)).over(ws))
    )
    k_lo = F.greatest(F.ceil(F.lit(q_lo) * F.col("_n")), F.lit(1))
    k_hi = F.least(F.ceil(F.lit(q_hi) * F.col("_n")), F.col("_n"))
    cuts = (
        d.groupBy(series_col)
        .agg(
            F.min(F.when(F.col("_r") == k_lo, F.col(value_col))).alias("_lo"),
            F.min(F.when(F.col("_r") == k_hi, F.col(value_col))).alias("_hi"),
        )
    )
    return (
        d.join(cuts, series_col)
        .select(
            F.col(series_col).alias("series"),
            F.col(id_col).alias("id"),
            F.col(value_col).alias("value"),
            F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")).alias(
                "value_winsorized"
            ),
            F.col("_lo").alias("cut_lo"),
            F.col("_hi").alias("cut_hi"),
        )
    )


def winsorize_sql(
    table: str,
    series_col: str,
    id_col: str,
    value_col: str,
    q_lo: float = 0.01,
    q_hi: float = 0.99,
) -> str:
    """DuckDB twin: same rank window, same selected-element cuts."""
    return f"""
    WITH ranked AS (
      SELECT {series_col} AS series, {id_col} AS id, {value_col} AS value,
             row_number() OVER (PARTITION BY {series_col}
                                ORDER BY {value_col}, {id_col}) AS _r,
             count(*) OVER (PARTITION BY {series_col}) AS _n
      FROM {table}
    ),
    cuts AS (
      SELECT series,
             min(CASE WHEN _r = greatest(ceil({q_lo} * _n), 1)
                 THEN value END) AS _lo,
             min(CASE WHEN _r = least(ceil({q_hi} * _n), _n)
                 THEN value END) AS _hi
      FROM ranked GROUP BY series
    )
    SELECT r.series, r.id, r.value,
           least(greatest(r.value, c._lo), c._hi) AS value_winsorized,
           c._lo AS cut_lo, c._hi AS cut_hi
    FROM ranked r JOIN cuts c USING (series)
    """


def cusum_drift(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    warmup: int = 50,
    slack: float = 2.0,
    threshold: float = 50.0,
    scale: int = 100,
) -> DataFrame:
    """Per-series CUSUM changepoint detection (Page 1954): flag the
    points where the cumulative deviation from the series' warm-up mean
    exceeds ``threshold``, with ``slack`` absorbing ordinary noise — the
    drift monitor behind data-quality alerts (sensor drift, metric
    regressions, distribution shift in a feature pipeline).

    Exact integer arithmetic throughout: values quantize to
    ``floor(v*scale + 0.5)``; the reference mean over the first
    ``warmup`` points stays a RATIONAL (sum, n) and every comparison is
    multiplied through by n, so no division ever happens. The one-sided
    CUSUM recursions

        G_t = max(0, G_{t-1} + d_t)    d_t = n*q_t - sum_n -+ n*slack_q

    are evaluated CLOSED-FORM via the reflected-walk identity
    ``G_t = S_t - min(0, min_{j<=t} S_j)`` (S = running sum of d), so
    the whole operator is two window functions per side — cumsum +
    running min, both ``partitionBy(series)`` — with zero Python and no
    sequential state anywhere. Emits flagged rows only:
    ``(series, ts, id, value, side, g_scaled, limit_scaled)`` with
    ``g_scaled > limit_scaled`` guaranteed (side: 1 = upward drift,
    -1 = downward).
    """
    q = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    slack_q = int(round(slack * scale))
    thresh_q = int(round(threshold * scale))
    wv = Window.partitionBy(series_col).orderBy(ts_col, id_col)
    d = _series_parallel(df, series_col).withColumn("_q", q).withColumn(
        "_r", F.row_number().over(wv)
    )
    warm = d.groupBy(series_col).agg(
        F.sum(F.when(F.col("_r") <= warmup, F.col("_q"))).cast("long").alias("_wsum"),
        F.least(F.count(F.lit(1)), F.lit(warmup)).cast("long").alias("_wn"),
    )
    d = d.join(warm, series_col).where(F.col("_r") > warmup)
    outs = []
    wrun = (
        Window.partitionBy(series_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for side in (1, -1):
        step = F.lit(side) * (
            F.col("_wn") * F.col("_q") - F.col("_wsum")
        ) - F.col("_wn") * F.lit(slack_q)
        s = F.sum(step).over(wrun)
        g = s - F.least(F.lit(0).cast("long"), F.min(s).over(wrun))
        limit = F.col("_wn") * F.lit(thresh_q)
        outs.append(
            d.withColumn("_g", g)
            .withColumn("_lim", limit)
            .where(F.col("_g") > F.col("_lim"))
            .select(
                F.col(series_col).alias("series"),
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col(value_col).alias("value"),
                F.lit(side).cast("long").alias("side"),
                F.col("_g").alias("g_scaled"),
                F.col("_lim").alias("limit_scaled"),
            )
        )
    return outs[0].unionByName(outs[1])


def cusum_drift_sql(
    table: str,
    series_col: str,
    ts_expr: str,
    id_col: str,
    value_col: str,
    warmup: int = 50,
    slack: float = 2.0,
    threshold: float = 50.0,
    scale: int = 100,
) -> str:
    """DuckDB twin: identical quantization, warm-up rational, and
    reflected-walk windows."""
    slack_q = int(round(slack * scale))
    thresh_q = int(round(threshold * scale))
    sides = []
    for side in (1, -1):
        sides.append(
            f"""
      SELECT series, ts, id, value, CAST({side} AS BIGINT) AS side,
             _s - least(0, min(_s) OVER (PARTITION BY series ORDER BY ts, id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS g_scaled,
             _wn * {thresh_q} AS limit_scaled
      FROM (
        SELECT series, ts, id, value, _wn,
               CAST(sum(({side}) * (_wn * _q - _wsum) - _wn * {slack_q})
                    OVER (PARTITION BY series ORDER BY ts, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS _s
        FROM post
      )"""
        )
    union = "\n      UNION ALL\n".join(
        f"SELECT * FROM (\n{s}\n      ) s{i} WHERE g_scaled > limit_scaled"
        for i, s in enumerate(sides)
    )
    return f"""
    WITH ranked AS (
      SELECT {series_col} AS series, {ts_expr} AS ts, {id_col} AS id,
             {value_col} AS value,
             CAST(floor({value_col} * {scale} + 0.5) AS BIGINT) AS _q,
             row_number() OVER (PARTITION BY {series_col}
                                ORDER BY {ts_expr}, {id_col}) AS _r
      FROM {table}
    ),
    warm AS (
      SELECT series,
             CAST(sum(CASE WHEN _r <= {warmup} THEN _q END) AS BIGINT) AS _wsum,
             CAST(least(count(*), {warmup}) AS BIGINT) AS _wn
      FROM ranked GROUP BY series
    ),
    post AS (
      SELECT r.series, r.ts, r.id, r.value, r._q, w._wsum, w._wn
      FROM ranked r JOIN warm w USING (series)
      WHERE r._r > {warmup}
    )
    {union}
    """


# ---------------------------------------------------------------------------
# LTTB downsampling (Steinarsson 2013, "Downsampling Time Series for
# Visual Representation") — the standard perceptual downsampler: keep
# first and last points; split the interior into n_out−2 equal index
# buckets; in each bucket keep the point forming the LARGEST TRIANGLE
# with the previously selected point and the NEXT bucket's centroid.
# Complements M4 (which preserves min/max/first/last envelopes; LTTB
# preserves visual shape). The reference has no downsampler at all —
# its bucket reducers are the closest surface (/root/reference/
# query.go:12-18, reduce.go).
#
# Determinism contract (cross-engine bit-exactness): values quantize
# once to BIGINT (floor(v·1e6+0.5)); timestamps rebase per series to
# BIGINT offsets; bucket centroids are EXACT BIGINT sums cast to double
# with ONE IEEE division each; the triangle area is the pinned op
# sequence |(ax−cx)·(by−ay) − (ax−bx)·(cy−ay)| on those doubles —
# identical in the numpy kernel and the DuckDB replay, so the per-bucket
# argmax (ties → lowest ts) picks the same point on both engines.
#
# Scale shape: selection is inherently sequential in the PREVIOUS
# selected point, so the parallelism axis is the series (exactly how a
# dashboard downsamples: one pass per series). One hash shuffle on the
# series key, then a bounded per-series applyInPandas scan — no global
# window, no driver collect. The DuckDB twin replays the walk as a
# recursive CTE advancing every series one bucket per level (depth =
# n_out, not points).
# ---------------------------------------------------------------------------

#: value quantum for LTTB (1e-6 value units — far below any plotting
#: resolution; exact BIGINT both engines)
_LTTB_QUANT = 1e6


def lttb_downsample(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    val_col: str,
    n_out: int = 40,
) -> DataFrame:
    """Largest-triangle-three-buckets downsample to ``n_out`` points per
    series (series with ≤ n_out points pass through). Input must be
    unique on (series, ts) — pre-aggregate duplicates with an
    order-independent reducer (min/max) first. Returns
    ``(series, ts, value)``."""
    import numpy as np
    import pandas as pd

    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    src = df.select(
        F.col(series_col).alias("series"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(val_col).cast("double").alias("value"),
        F.floor(F.col(val_col).cast("double") * F.lit(_LTTB_QUANT) + F.lit(0.5))
        .cast("long")
        .alias("_yq"),
    )

    def _lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[["series", "ts", "value"]]
        ts = pdf["ts"].to_numpy()
        yq = pdf["_yq"].to_numpy()
        tr = ts - ts[0]  # per-series rebase keeps BIGINT sums in int64
        m = n_out - 2
        k = n - 2
        # bucket of interior idx (1-based interior rank r = idx):
        # b = ((idx-1)*m) // k — the same closed form the SQL twin
        # assigns per row; bucket b covers idx in [lo_b, hi_b) with
        # lo_b = ceil(b*k/m)+1 (nonempty whenever k >= m, which the
        # n > n_out early-out guarantees)
        bound = lambda b: (b * k + m - 1) // m + 1  # noqa: E731
        sel = [0]
        for i in range(m):
            lo, hi = bound(i), bound(i + 1)
            if i < m - 1:
                nlo, nhi = hi, bound(i + 2)
                sx = int(tr[nlo:nhi].sum())
                sy = int(yq[nlo:nhi].sum())
                nb = nhi - nlo
            else:  # last interior bucket: "next" is the final point
                sx, sy, nb = int(tr[n - 1]), int(yq[n - 1]), 1
            # exact ints -> double, ONE division each: the oracle's
            # CAST(sx AS DOUBLE)/CAST(nb AS DOUBLE) op-for-op
            cx = float(sx) / float(nb)
            cy = float(sy) / float(nb)
            ax = float(tr[sel[-1]])
            ay = float(yq[sel[-1]])
            bx = tr[lo:hi].astype("float64")
            by = yq[lo:hi].astype("float64")
            area = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
            # np.argmax takes the FIRST max = lowest ts (ts-sorted), the
            # oracle's ORDER BY area DESC, ts ASC
            sel.append(lo + int(np.argmax(area)))
        sel.append(n - 1)
        return pdf.iloc[sel][["series", "ts", "value"]]

    out_schema = "series string, ts long, value double"
    return (
        src.repartition("series")
        .groupBy("series")
        .applyInPandas(_lttb, out_schema)
    )


def lttb_downsample_sql(
    table_sql: str,
    series_col: str,
    ts_expr: str,
    val_col: str,
    n_out: int = 40,
) -> str:
    """DuckDB twin: the same walk as a recursive CTE, one bucket per
    level, per-level argmax via a window in the recursive term (ties →
    lowest ts). Every arithmetic step mirrors the kernel op-for-op."""
    m = n_out - 2
    q = f"{_LTTB_QUANT!r}"
    return f"""
    WITH RECURSIVE src AS MATERIALIZED (
      SELECT {series_col} AS series, {ts_expr} AS ts, {val_col} AS value,
             CAST(floor(CAST({val_col} AS DOUBLE) * {q} + 0.5) AS BIGINT) AS yq
      FROM ({table_sql})
    ),
    stats AS MATERIALIZED (
      SELECT series, count(*) AS n, min(ts) AS t0 FROM src GROUP BY series
    ),
    pts AS MATERIALIZED (
      SELECT s.series, s.ts, s.value, s.yq, s.ts - st.t0 AS tr, st.n,
             ROW_NUMBER() OVER (PARTITION BY s.series ORDER BY s.ts) - 1 AS idx
      FROM src s JOIN stats st USING (series)
    ),
    cand AS MATERIALIZED (
      SELECT series, ts, value, yq, tr, n,
             ((idx - 1) * {m}) // (n - 2) AS b
      FROM pts WHERE n > {n_out} AND idx >= 1 AND idx <= n - 2
    ),
    bstats AS MATERIALIZED (
      SELECT series, b, CAST(SUM(tr) AS BIGINT) AS sx,
             CAST(SUM(yq) AS BIGINT) AS sy, COUNT(*) AS nb
      FROM cand GROUP BY series, b
    ),
    lastpt AS MATERIALIZED (
      SELECT series, ts, value, tr, yq FROM pts WHERE idx = n - 1 AND n > {n_out}
    ),
    nstats AS MATERIALIZED (
      SELECT series, b - 1 AS b, sx, sy, nb FROM bstats WHERE b >= 1
      UNION ALL
      SELECT series, {m} - 1, tr, yq, 1 FROM lastpt
    ),
    walk(series, lvl, ts, value, tr, yq) AS (
      SELECT series, -1, ts, value, tr, yq FROM pts
      WHERE idx = 0 AND n > {n_out}
      UNION ALL
      SELECT series, lvl, ts, value, tr, yq FROM (
        SELECT w.series, w.lvl + 1 AS lvl, c.ts, c.value, c.tr, c.yq,
               ROW_NUMBER() OVER (
                 PARTITION BY w.series
                 ORDER BY abs(
                   (CAST(w.tr AS DOUBLE)
                      - CAST(ns.sx AS DOUBLE) / CAST(ns.nb AS DOUBLE))
                   * (CAST(c.yq AS DOUBLE) - CAST(w.yq AS DOUBLE))
                   - (CAST(w.tr AS DOUBLE) - CAST(c.tr AS DOUBLE))
                   * (CAST(ns.sy AS DOUBLE) / CAST(ns.nb AS DOUBLE)
                      - CAST(w.yq AS DOUBLE))
                 ) DESC, c.ts ASC
               ) AS rk
        FROM walk w
        JOIN cand c ON c.series = w.series AND c.b = w.lvl + 1
        JOIN nstats ns ON ns.series = w.series AND ns.b = w.lvl + 1
        WHERE w.lvl + 1 <= {m} - 1
      ) WHERE rk = 1
    )
    SELECT series, ts, value FROM walk
    UNION ALL
    SELECT series, ts, value FROM lastpt
    UNION ALL
    SELECT series, ts, value FROM pts WHERE n <= {n_out}
    """


def lag_autocorrelation(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
    scale: int = 100,
    max_n: int = 32768,
) -> DataFrame:
    """Per-series lag-k serial correlation (the ACF read as Pearson r of
    the ``(x_t, x_{t+k})`` pair set — Box–Jenkins diagnostics: is the
    series momentum-driven, mean-reverting, or white?).

    Cross-engine float discipline (CLAUDE.md): values quantize to
    ``floor(v*scale + 0.5)`` BIGINT; all five sufficient statistics
    (``n, Σx, Σy, Σxy, Σx², Σy²``) are exact integer sums, the Pearson
    numerator/denominators are exact BIGINT expressions, and the only
    float ops are two correctly-rounded sqrts, one multiply, one divide
    — bit-identical on any engine.

    Overflow contract (the zscore lesson — Spark longs WRAP, DuckDB
    raises): ``n·Σxy`` is bounded by ``(n·q_max)²``, so we require
    ``|q| <= floor(sqrt(2^63-1)) / max_n`` per row (checked via
    ``assert_true``, an ERROR never a wrapped answer) and ``n <= max_n``
    per (series, lag) (checked post-aggregate). Defaults allow |value|
    up to ~9.2e2 at scale=100 with 32k points per series; larger series
    need a coarser ``scale`` or finer series keys.

    Scale shape: ONE window exchange on the series key produces every
    lag column (same partitioning for all k), the long-form stack is a
    projection, and the (series, lag) aggregate is map-side combinable.
    State is six BIGINTs per (series, lag) — no data-wide sort, no
    second shuffle (the agg rides the window's hash distribution).

    Returns ``(series, lag, n, num, den_x, den_y, acf)``.
    """
    qbound = int((2**63 - 1) ** 0.5) // max_n
    q = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    q = F.when(
        F.assert_true(
            F.abs(q) <= qbound,
            F.concat(
                F.lit(
                    f"lag_autocorrelation: |value*{scale}| exceeds the "
                    f"overflow-safe bound {qbound} for max_n={max_n}: "
                ),
                F.col(value_col).cast("string"),
            ),
        ).isNull(),
        q,
    )
    w = Window.partitionBy(series_col).orderBy(ts_col, id_col)
    d = _series_parallel(df, series_col).withColumn("_q", q)
    for k in lags:
        d = d.withColumn(f"_y{k}", F.lead("_q", k).over(w))
    stacked = d.select(
        F.col(series_col).alias("series"),
        F.col("_q").alias("_x"),
        F.expr(
            "stack("
            + str(len(lags))
            + ", "
            + ", ".join(f"{k}L, _y{k}" for k in lags)
            + ") AS (lag, _y)"
        ),
    ).where(F.col("_y").isNotNull())
    agg = stacked.groupBy("series", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    agg = agg.where(
        F.assert_true(
            F.col("n") <= max_n,
            F.lit(f"lag_autocorrelation: series exceeds max_n={max_n} points"),
        ).isNull()
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den_x = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    den_y = F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    # A constant side (zero variance after quantization) makes the
    # correlation UNDEFINED: emit NULL explicitly — under ANSI mode the
    # bare division would ERROR the whole query (hypothesis-found), and
    # DuckDB's 0/0 NaN would hash-diverge; NULL is the one value both
    # engines state identically.
    acf = F.when(
        (den_x > 0) & (den_y > 0),
        num.cast("double")
        / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double"))),
    )
    return agg.select(
        "series",
        "lag",
        "n",
        num.alias("num"),
        den_x.alias("den_x"),
        den_y.alias("den_y"),
        acf.alias("acf"),
    )


def lag_autocorrelation_sql(
    rel: str,
    series_col: str,
    ts_expr: str,
    id_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
    scale: int = 100,
) -> str:
    """DuckDB twin: identical quantization, lead windows, integer
    sufficient statistics, and the same two-sqrt final expression.
    DuckDB SUM(BIGINT) returns HUGEINT — every sum is cast back to
    BIGINT (the house rule), keeping both engines on int64."""
    leads = ",\n             ".join(
        f"lead(_q, {k}) OVER w AS _y{k}" for k in lags
    )
    stacked = "\n      UNION ALL\n      ".join(
        f"SELECT series, CAST({k} AS BIGINT) AS lag, _x, _y{k} AS _y FROM lagged"
        for k in lags
    )
    return f"""
    WITH q AS (
      SELECT {series_col} AS series, {ts_expr} AS _ts, {id_col} AS _id,
             CAST(floor({value_col} * {scale} + 0.5) AS BIGINT) AS _q
      FROM {rel}
    ),
    lagged AS MATERIALIZED (
      SELECT series, _q AS _x,
             {leads}
      FROM q
      WINDOW w AS (PARTITION BY series ORDER BY _ts, _id)
    ),
    stacked AS (
      {stacked}
    ),
    agg AS (
      SELECT series, lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(_x) AS BIGINT) AS _sx,
             CAST(SUM(_y) AS BIGINT) AS _sy,
             CAST(SUM(_x * _y) AS BIGINT) AS _sxy,
             CAST(SUM(_x * _x) AS BIGINT) AS _sxx,
             CAST(SUM(_y * _y) AS BIGINT) AS _syy
      FROM stacked WHERE _y IS NOT NULL
      GROUP BY series, lag
    )
    SELECT series, lag, n,
           CAST(n * _sxy - _sx * _sy AS BIGINT) AS num,
           CAST(n * _sxx - _sx * _sx AS BIGINT) AS den_x,
           CAST(n * _syy - _sy * _sy AS BIGINT) AS den_y,
           CASE WHEN n * _sxx - _sx * _sx > 0 AND n * _syy - _sy * _sy > 0
                THEN CAST(n * _sxy - _sx * _sy AS DOUBLE)
                     / (sqrt(CAST(n * _sxx - _sx * _sx AS DOUBLE))
                        * sqrt(CAST(n * _syy - _sy * _sy AS DOUBLE)))
           END AS acf
    FROM agg
    """


def cross_correlation(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    bucket_ns: int = 60_000_000_000,
    scale: int = 10,
    max_n: int = 1 << 17,
) -> DataFrame:
    """All-pairs cross-series Pearson correlation over time-aligned
    buckets (the co-movement matrix: which metrics move together —
    pairs with :func:`lag_autocorrelation`, which answers the same
    question within one series).

    Alignment is division-free: each (series, bucket) is represented by
    its MIN quantized value — a SELECTED exact integer, not an average,
    so both engines agree bit-for-bit. Pairs align by an equi-join on
    the bucket id; the correlation uses the same exact-BIGINT sufficient
    statistics + two-sqrt finish as ``lag_autocorrelation`` (and the
    same overflow contract: ``|q| <= floor(sqrt(2^63-1)) / max_n``
    checked per row, aligned-bucket count checked post-aggregate).

    Scale shape: one hash aggregate to (series, bucket) — map-side
    combinable, output |series|·|buckets| rows regardless of corpus
    size — then a bucket-key equi-join confined to same-bucket rows and
    one (series_a, series_b) aggregate. Nothing downstream of the first
    aggregate ever sees raw points.

    Returns ``(series_a, series_b, n, num, den_x, den_y, corr)``.
    """
    qbound = int((2**63 - 1) ** 0.5) // max_n
    q = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    q = F.when(
        F.assert_true(
            F.abs(q) <= qbound,
            F.concat(
                F.lit(
                    f"cross_correlation: |value*{scale}| exceeds the "
                    f"overflow-safe bound {qbound} for max_n={max_n}: "
                ),
                F.col(value_col).cast("string"),
            ),
        ).isNull(),
        q,
    )
    per_bucket = (
        df.select(
            F.col(series_col).alias("series"),
            F.call_function("div", F.col(ts_col).cast("long"), F.lit(bucket_ns)).alias(
                "bucket"
            ),
            q.alias("_q"),
        )
        .groupBy("series", "bucket")
        .agg(F.min("_q").alias("_q"))
        # Referenced twice (both join sides) — truncate lineage so the
        # corpus scan + aggregate run ONCE (the multiply-referenced-
        # subtree rule; same fix as the pair-detector/triangle case).
        .localCheckpoint(eager=False)
    )
    a = per_bucket.select(
        F.col("series").alias("series_a"), "bucket", F.col("_q").alias("_x")
    )
    b = per_bucket.select(
        F.col("series").alias("series_b"), "bucket", F.col("_q").alias("_y")
    )
    joined = a.join(b, "bucket").where(F.col("series_a") < F.col("series_b"))
    agg = joined.groupBy("series_a", "series_b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    agg = agg.where(
        F.assert_true(
            F.col("n") <= max_n,
            F.lit(f"cross_correlation: aligned buckets exceed max_n={max_n}"),
        ).isNull()
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den_x = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    den_y = F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    # constant side → correlation undefined → NULL (same rationale and
    # cross-engine contract as lag_autocorrelation)
    corr = F.when(
        (den_x > 0) & (den_y > 0),
        num.cast("double")
        / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double"))),
    )
    return agg.select(
        "series_a",
        "series_b",
        "n",
        num.alias("num"),
        den_x.alias("den_x"),
        den_y.alias("den_y"),
        corr.alias("corr"),
    )


def cross_correlation_sql(
    rel: str,
    series_col: str,
    ts_ns_expr: str,
    value_col: str,
    bucket_ns: int = 60_000_000_000,
    scale: int = 10,
) -> str:
    """DuckDB twin: same quantization, min-representative buckets,
    bucket equi-join, BIGINT statistics, and two-sqrt finish."""
    return f"""
    WITH per_bucket AS MATERIALIZED (
      SELECT {series_col} AS series,
             ({ts_ns_expr}) // {bucket_ns} AS bucket,
             MIN(CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)) AS _q
      FROM {rel}
      GROUP BY series, bucket
    ),
    joined AS (
      SELECT a.series AS series_a, b.series AS series_b, a._q AS _x, b._q AS _y
      FROM per_bucket a JOIN per_bucket b USING (bucket)
      WHERE a.series < b.series
    ),
    agg AS (
      SELECT series_a, series_b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(_x) AS BIGINT) AS _sx,
             CAST(SUM(_y) AS BIGINT) AS _sy,
             CAST(SUM(_x * _y) AS BIGINT) AS _sxy,
             CAST(SUM(_x * _x) AS BIGINT) AS _sxx,
             CAST(SUM(_y * _y) AS BIGINT) AS _syy
      FROM joined GROUP BY series_a, series_b
    )
    SELECT series_a, series_b, n,
           CAST(n * _sxy - _sx * _sy AS BIGINT) AS num,
           CAST(n * _sxx - _sx * _sx AS BIGINT) AS den_x,
           CAST(n * _syy - _sy * _sy AS BIGINT) AS den_y,
           CASE WHEN n * _sxx - _sx * _sx > 0 AND n * _syy - _sy * _sy > 0
                THEN CAST(n * _sxy - _sx * _sy AS DOUBLE)
                     / (sqrt(CAST(n * _sxx - _sx * _sx AS DOUBLE))
                        * sqrt(CAST(n * _syy - _sy * _sy AS DOUBLE)))
           END AS corr
    FROM agg
    """


# ---------------------------------------------------------------------------
# Seasonal strength — one-way ANOVA η² over calendar bins (Hyndman's
# seasonal-strength diagnostic reduced to its variance decomposition;
# public art: Fisher 1925). η² = SS_between/SS_total of the quantized
# value across the bin groups. Cross-engine float discipline: every
# sufficient statistic (n_h, Σq, Σq²) is an EXACT BIGINT; the only
# order-sensitive float sum — Σ_h S_h²/n_h — folds over a BIN-SORTED
# ≤|bins|-term list, so both engines add in one fixed order (Spark's
# 0.0-seeded aggregate == DuckDB's seedless list_reduce for the
# non-negative terms). η² itself is one shared double expression tree
# with a zero-variance NULL guard (the hypothesis-found ANSI-vs-NaN red
# class).
# ---------------------------------------------------------------------------

#: η²_ppm from (n, s, ssq, fold) — ONE expression text both engines run.
ETA2_PPM_EXPR = (
    "CASE WHEN (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE)) > 0.0 THEN CAST(floor("
    "(fold - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    " / (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) ELSE NULL END"
)


def seasonal_strength_anova(
    df: DataFrame,
    group_cols: list[str],
    bin_expr: str,
    value_col: str,
    scale: int = 1_000,
    max_n: int = 1 << 20,
) -> DataFrame:
    """Per group: ``(group_cols..., n, eta2_ppm)`` — η² of the
    ``scale``-quantized value across the integer bins of ``bin_expr``
    (e.g. hour-of-day ``(ts div 3600000000000) % 24``). State per group
    is |bins| rows at any corpus size; one equi-shuffle.

    Overflow contract (VERDICT r14 ask #3, the lag_autocorrelation
    precedent): ``Σq²`` must fit BIGINT, so ``|q| ≤
    isqrt((2^63−1)/max_n)`` is asserted per row and ``n ≤ max_n`` per
    group post-aggregate — a mis-sized ``scale`` ERRORS loudly (Spark
    non-ANSI longs would otherwise wrap silently; DuckDB raises)."""
    qbound = math.isqrt((2**63 - 1) // int(max_n))
    q_raw = F.expr(f"CAST(floor({value_col} * {int(scale)} + 0.5) AS BIGINT)")
    q = F.when(
        F.assert_true(
            F.abs(q_raw) <= qbound,
            F.concat(
                F.lit(
                    f"seasonal_strength_anova: |value*{int(scale)}| exceeds "
                    f"the overflow-safe bound {qbound} for max_n={int(max_n)}"
                    " — coarsen scale: "
                ),
                F.col(value_col).cast("string"),
            ),
        ).isNull(),
        q_raw,
    )
    hourly = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.expr(bin_expr).alias("hr"), q.alias("q"))
        .groupBy(*group_cols, "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum("q").cast("long").alias("s_h"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("ssq_h"),
        )
    )
    perg = hourly.groupBy(*group_cols).agg(
        F.sum("n_h").cast("long").alias("n"),
        F.sum("s_h").cast("long").alias("s"),
        F.sum("ssq_h").cast("long").alias("ssq"),
        F.expr(
            "aggregate(array_sort(collect_list(named_struct("
            "'hr', hr, 't', CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)"
            " / CAST(n_h AS DOUBLE)))), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x.t)"
        ).alias("fold"),
    )
    perg = perg.where(
        F.assert_true(
            F.col("n") <= int(max_n),
            F.lit(
                f"seasonal_strength_anova: group exceeds max_n={int(max_n)}"
                " points — raise max_n (and re-check the scale bound)"
            ),
        ).isNull()
    )
    return perg.select(
        *group_cols, "n", F.expr(ETA2_PPM_EXPR).alias("eta2_ppm")
    )


def seasonal_strength_anova_sql(
    rel: str,
    group_cols: list[str],
    bin_expr: str,
    value_col: str,
    scale: int = 1_000,
) -> str:
    """DuckDB twin: same statistics, the bin-ordered ``list(… ORDER BY
    hr)`` + ``list_reduce`` fold, the same η² text."""
    gc = ", ".join(group_cols)
    return f"""
    WITH base AS (
      SELECT {gc}, {bin_expr} AS hr,
             CAST(floor({value_col} * {int(scale)} + 0.5) AS BIGINT) AS q
      FROM {rel} WHERE {value_col} IS NOT NULL
    ),
    hourly AS (
      SELECT {gc}, hr, CAST(count(*) AS BIGINT) AS n_h,
             CAST(SUM(q) AS BIGINT) AS s_h,
             CAST(SUM(q * q) AS BIGINT) AS ssq_h
      FROM base GROUP BY {gc}, hr
    ),
    perg AS (
      SELECT {gc},
             CAST(SUM(n_h) AS BIGINT) AS n,
             CAST(SUM(s_h) AS BIGINT) AS s,
             CAST(SUM(ssq_h) AS BIGINT) AS ssq,
             list_reduce(
               list(CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                    / CAST(n_h AS DOUBLE) ORDER BY hr),
               (x, y) -> x + y) AS fold
      FROM hourly GROUP BY {gc}
    )
    SELECT {gc}, n, {ETA2_PPM_EXPR} AS eta2_ppm FROM perg
    """
