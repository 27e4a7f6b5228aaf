"""Per-series OLS trend fitting — the batch grouped-map
(``applyInPandas``) member of the UDF surface, built to stay
oracle-checkable.

Why this exists: ``mapInPandas`` (multimodal kernels) and
``applyInPandasWithState`` (streaming spikes) are covered elsewhere;
batch grouped-map is the remaining Arrow UDF shape, and a per-group
least-squares fit is its canonical use (the whole group must be in one
pandas frame).

Cross-engine exactness, the hard part: a float OLS in pandas would never
hash-match a SQL oracle (different accumulation orders). So the fit is
computed in EXACT arithmetic on both sides —

* timestamps become µs offsets from a fixed anchor (BIGINT, exact);
* values are fixed-pointed to 6 decimals via ``floor(v·1e6 + 0.5)``
  (one double multiply-add + floor: bit-identical in any engine; NOT
  ``round``, whose half-way rule differs between Python/numpy banker's
  rounding and SQL half-away);
* the OLS sums Σx, Σy, Σxy, Σx² run in Python bigints (pandas side)
  and DECIMAL(38,0) / HUGEINT (DuckDB side) — both exact;
* slope = double(num)/double(den) — one conversion + one division on
  identical integers → identical doubles.

Scale: one shuffle on the group key; each group materializes in one
Arrow batch (fine for ≤ millions of points per series — beyond that,
the moment sums become a plain hash aggregate and no UDF is needed;
this operator exists to exercise the grouped-map path with real
semantics).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def series_trend(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    anchor_us: int,
) -> DataFrame:
    """Per-group OLS slope of value vs time.

    ``ts_col`` must be µs-precision epoch (BIGINT). Returns one row per
    group: ``(group, n_points, slope_per_hour)`` where slope is in
    value-units per hour, computed exactly (see module docstring).
    """
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) - anchor_us for v in pdf[ts_col]]
        ys = [math.floor(float(v) * 1e6 + 0.5) for v in pdf[value_col]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num = n * sxy - sx * sy  # slope numerator, in 1e-6 units per µs
        den = n * sxx - sx * sx
        slope_hr = (
            None if den == 0 else float(num) / float(den) * US_PER_HOUR / 1e6
        )
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_points": [n],
                "slope_per_hour": [slope_hr],
            }
        )

    return (
        events.select(group_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(fit, f"{group_col} string, n_points long, slope_per_hour double")
    )


def series_trend_sql(
    table_where: str, group_col: str, ts_us_expr: str, value_col: str, anchor_us: int
) -> str:
    """DuckDB twin: the same exact integer sums in HUGEINT (int128 —
    decimal-typed products would overflow DuckDB's width-38 cap)."""
    x = f"CAST({ts_us_expr} - {anchor_us} AS HUGEINT)"
    y = f"CAST(floor({value_col} * 1000000 + 0.5) AS HUGEINT)"
    return f"""
    WITH m AS (
      SELECT {group_col},
             count(*) AS n,
             SUM({x}) AS sx,
             SUM({y}) AS sy,
             SUM({x} * {y}) AS sxy,
             SUM({x} * {x}) AS sxx
      FROM {table_where}
      GROUP BY {group_col}
    )
    SELECT {group_col}, n AS n_points,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * {US_PER_HOUR} / 1000000.0
           END AS slope_per_hour
    FROM m
    """


def holt_linear(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Per-series Holt linear (double) exponential smoothing — level +
    trend state folded over the series in time order, the classic
    short-horizon forecaster for metric streams.

    A genuinely SEQUENTIAL two-variable recurrence (unlike CUSUM, it has
    no closed form), so it runs as a grouped-map fold:

        l_t = alpha*x_t + (1-alpha)*(l + b)
        b_t = beta*(l_t - l) + (1-beta)*b          (l_1 = x_1, b_1 = 0)

    Cross-engine exactness WITHOUT quantization: the recurrence is pure
    IEEE multiply/add on doubles, and the DuckDB oracle's recursive CTE
    evaluates the IDENTICAL expression tree in the identical order per
    row — the same bit-exactness argument as the EMA spike detector
    (``streaming/stateful.py``); ``alpha``/``beta`` must be exactly-
    representable doubles (dyadics like 0.5/0.25 keep that obvious).
    ``ts_col`` must be tie-free per group (µs event times are, at the
    gate SFs) or the fold order is ambiguous.

    Returns one row per group:
    ``(group, n_points, level, trend, forecast_1)`` with
    ``forecast_1 = level + trend`` (one-step-ahead).
    """
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        xs = [float(v) for v in pdf[value_col]]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            l_new = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (l_new - l) + (1.0 - beta) * b
            l = l_new
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_points": [len(xs)],
                "level": [l],
                "trend": [b],
                "forecast_1": [l + b],
            }
        )

    return (
        events.select(group_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(
            fit,
            f"{group_col} string, n_points long, level double, "
            "trend double, forecast_1 double",
        )
    )


def holt_linear_sql(
    table_filter: str,
    group_col: str,
    ts_expr: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> str:
    """DuckDB twin: the recurrence as a recursive CTE, one step per row
    in the same order with the same expression tree."""
    a, b_ = repr(alpha), repr(beta)
    return f"""
    WITH RECURSIVE ord AS (
      SELECT {group_col} AS grp, {ts_expr} AS tord, {value_col} AS x,
             ROW_NUMBER() OVER (PARTITION BY {group_col}
                                ORDER BY {ts_expr}) AS rn
      FROM {table_filter}
    ),
    holt AS (
      SELECT grp, rn, x, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.grp, o.rn, o.x,
             {a} * o.x + (1.0 - {a}) * (h.l + h.b),
             {b_} * (({a} * o.x + (1.0 - {a}) * (h.l + h.b)) - h.l)
               + (1.0 - {b_}) * h.b
      FROM holt h JOIN ord o ON o.grp = h.grp AND o.rn = h.rn + 1
    ),
    last AS (
      SELECT grp, max(rn) AS n FROM ord GROUP BY grp
    )
    SELECT h.grp AS {group_col}, CAST(l2.n AS BIGINT) AS n_points,
           h.l AS level, h.b AS trend, h.l + h.b AS forecast_1
    FROM holt h JOIN last l2 ON h.grp = l2.grp AND h.rn = l2.n
    """


def holt_winters_seasonal(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    season: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """Per-series Holt-Winters ADDITIVE seasonal (triple) exponential
    smoothing — level + trend + a ``season``-slot seasonal vector folded
    over the series in time order; the classic forecaster for daily
    metric streams with weekly shape.

        l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ) s_{t−m}

    Initialization is the DEFINED zero-seasonal start (l₁ = x₁, b₁ = 0,
    s_j = 0): the γ-recurrence learns the seasonal shape from the data
    instead of a mean-based warmup (a mean is a float sum — order-
    dependent, so not bit-replayable; the zero start keeps every carried
    double the result of the same IEEE expression tree per row, the
    ``holt_linear`` argument). α/β/γ should be dyadic.

    ``ts_col`` must be tie-free per group. Returns one row per group:
    ``(group, n_points, level, trend, f1..f{season})`` — the 1..season
    step-ahead forecasts ``l + h·b + s_{(n+h−1) mod season}``, one per
    seasonal slot, so the whole learned seasonal vector is exercised
    (and hash-checked).
    """
    import pandas as pd

    m = season

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        xs = [float(v) for v in pdf[value_col]]
        l, b = xs[0], 0.0
        s = [0.0] * m
        for i, x in enumerate(xs[1:], start=2):
            idx = (i - 1) % m
            l_new = alpha * (x - s[idx]) + (1.0 - alpha) * (l + b)
            b = beta * (l_new - l) + (1.0 - beta) * b
            s[idx] = gamma * (x - l_new) + (1.0 - gamma) * s[idx]
            l = l_new
        n = len(xs)
        out = {
            group_col: [pdf[group_col].iloc[0]],
            "n_points": [n],
            "level": [l],
            "trend": [b],
        }
        for h in range(1, m + 1):
            out[f"f{h}"] = [l + float(h) * b + s[(n + h - 1) % m]]
        return pd.DataFrame(out)

    fcols = ", ".join(f"f{h} double" for h in range(1, m + 1))
    return (
        events.select(group_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(
            fit,
            f"{group_col} string, n_points long, level double, "
            f"trend double, {fcols}",
        )
    )


def holt_winters_seasonal_sql(
    table_filter: str,
    group_col: str,
    ts_expr: str,
    value_col: str,
    season: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> str:
    """DuckDB twin: the triple recurrence as a recursive CTE carrying
    the seasonal vector as ``season`` explicit columns, one step per
    row, identical expression tree (the slot CASE selects which column
    updates)."""
    a, be, g = repr(alpha), repr(beta), repr(gamma)
    m = season
    scols = ", ".join(f"CAST(0.0 AS DOUBLE) AS s{j}" for j in range(m))
    s_cur = (
        "CASE "
        + " ".join(f"WHEN (o.rn - 1) % {m} = {j} THEN h.s{j}" for j in range(m))
        + " END"
    )
    l_new = f"{a} * (o.x - {s_cur}) + (1.0 - {a}) * (h.l + h.b)"
    s_upds = ", ".join(
        f"CASE WHEN (o.rn - 1) % {m} = {j} "
        f"THEN {g} * (o.x - ({l_new})) + (1.0 - {g}) * h.s{j} "
        f"ELSE h.s{j} END"
        for j in range(m)
    )
    fsel = ", ".join(
        f"h.l + {float(h_)!r} * h.b + ("
        + "CASE "
        + " ".join(
            f"WHEN (l2.n + {h_} - 1) % {m} = {j} THEN h.s{j}" for j in range(m)
        )
        + " END) AS f{h}".replace("{h}", str(h_))
        for h_ in range(1, m + 1)
    )
    return f"""
    WITH RECURSIVE ord AS MATERIALIZED (
      SELECT {group_col} AS grp, {ts_expr} AS tord, {value_col} AS x,
             ROW_NUMBER() OVER (PARTITION BY {group_col}
                                ORDER BY {ts_expr}) AS rn
      FROM {table_filter}
    ),
    hw AS (
      SELECT grp, rn, x, x AS l, CAST(0.0 AS DOUBLE) AS b, {scols}
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.grp, o.rn, o.x,
             {l_new},
             {be} * (({l_new}) - h.l) + (1.0 - {be}) * h.b,
             {s_upds}
      FROM hw h JOIN ord o ON o.grp = h.grp AND o.rn = h.rn + 1
    ),
    last AS (SELECT grp, max(rn) AS n FROM ord GROUP BY grp)
    SELECT h.grp AS {group_col}, CAST(l2.n AS BIGINT) AS n_points,
           h.l AS level, h.b AS trend, {fsel}
    FROM hw h JOIN last l2 ON h.grp = l2.grp AND h.rn = l2.n
    """
