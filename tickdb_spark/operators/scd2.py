"""Slowly-changing-dimension type-2 history build (Kimball SCD2,
public art): turn an append-only change/event log into interval rows
``(key, attr, valid_from, valid_to, is_current)`` — one row per run of
consecutive equal attribute values per key.

Why it's an engine operator: the reference's warehouse resolves
upserts last-writer-wins (the SCD *type-1* policy — see
``ingest.read_ticks``); SCD2 is the other half every dimension table
needs — "what was this customer's segment WHEN the order shipped"
joins against the history intervals, not the current row. The build is
the canonical gaps-and-islands computation: detect value changes with
``lag``, number runs with a running sum of change flags, aggregate each
run to its interval, close it with ``lead`` of the next run's start.

Scale shape at 100 TB: every window is ``PARTITION BY key`` — state is
one key's rows, never a data-wide window; the plan is one shuffle on
the key reused by all three steps (lag, run-sum, lead — same
partitioning, Spark plans ONE Exchange) plus one partial-aggregable
groupBy. Change logs are naturally key-partitioned on ingest, making
the shuffle a no-op under bucketing.

Determinism contract: ``order_col`` ties are broken by ``tiebreak``
(a unique row id) on BOTH engines — an un-tiebroken lag over equal
timestamps is partition-order-dependent and will hash-mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    order_col: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse the change log to SCD2 intervals.

    Returns ``(key, attr, valid_from, valid_to, is_current)`` where
    ``valid_from`` is the first ``order_col`` of the run, ``valid_to``
    the next run's ``valid_from`` (NULL on the current run), and
    ``is_current`` a BIGINT 0/1 flag.
    """
    w = Window.partitionBy(key).orderBy(order_col, tiebreak)
    flagged = df.select(
        key,
        attr,
        order_col,
        tiebreak,
        F.when(F.lag(attr).over(w).eqNullSafe(F.col(attr)), F.lit(0))
        .otherwise(F.lit(1))
        .alias("_chg"),
    )
    runs = flagged.withColumn(
        "_run", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # attr is constant within a run by construction (runs are maximal
    # spans of IS-NOT-DISTINCT-FROM-equal values), so min() is both
    # deterministic and the value itself.
    collapsed = runs.groupBy(key, "_run").agg(
        F.min(attr).alias(attr),
        F.min(order_col).alias("valid_from"),
    )
    w_runs = Window.partitionBy(key).orderBy("_run")
    return collapsed.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        F.when(F.lead("valid_from").over(w_runs).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
    )


def scd2_history_sql(
    rel: str, key: str, attr: str, order_col: str, tiebreak: str
) -> str:
    """DuckDB twin: identical lag-flag → run-sum → collapse → lead."""
    return f"""
    WITH flagged AS (
      SELECT {key}, {attr}, {order_col}, {tiebreak},
             CASE WHEN lag({attr}) OVER w IS NOT DISTINCT FROM {attr}
                  THEN 0 ELSE 1 END AS _chg
      FROM {rel}
      WINDOW w AS (PARTITION BY {key} ORDER BY {order_col}, {tiebreak})
    ),
    runs AS (
      SELECT *, SUM(_chg) OVER (PARTITION BY {key} ORDER BY {order_col}, {tiebreak}
                                ROWS UNBOUNDED PRECEDING) AS _run
      FROM flagged
    ),
    collapsed AS (
      SELECT {key}, _run,
             min({attr}) AS {attr},
             min({order_col}) AS valid_from
      FROM runs GROUP BY {key}, _run
    )
    SELECT {key}, {attr}, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER w2 IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM collapsed
    WINDOW w2 AS (PARTITION BY {key} ORDER BY _run)
    """


def scd2_asof_lookup(
    history: DataFrame, facts: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """Join facts to the attribute value in force at the fact's
    timestamp: ``valid_from <= ts AND (ts < valid_to OR valid_to IS
    NULL)``. Interval containment on an equi-key — Spark plans the key
    as the join key with the interval as a post-join filter; the
    history side is dimension-sized (broadcastable)."""
    h = history.select(
        F.col(key).alias("_h_key"),
        *[c for c in history.columns if c != key],
    )
    return facts.join(
        h,
        (F.col(key) == F.col("_h_key"))
        & (F.col("valid_from") <= F.col(ts_col))
        & (F.col("valid_to").isNull() | (F.col(ts_col) < F.col("valid_to"))),
        "left",
    ).drop("_h_key")
