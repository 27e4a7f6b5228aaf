"""Join-strategy planner: the consumer that closes the loop between the
planner-side diagnostics (``sketch.cms_join_size_estimate``, the
key-skew concentration stats behind ``diag_key_skew_gini``) and an
actual physical join choice. Reference has no planner (single-table
time-tree scans); this is extension surface for the Spark engine.

Decision rules — ALL-INTEGER comparisons, so the decision table is
oracle-checkable and deterministic across engines:

1. ``est_rows == 0``            → **prune**. The CMS inner-product
   estimate is one-sided (colliding keys only ADD cross products, so
   est ≥ true); an estimate of 0 therefore *certifies* the join is
   empty — skip it entirely.
2. ``min(n_a, n_b) ≤ broadcast_rows`` → **broadcast_a / broadcast_b**
   (the smaller side; ties go to a). A row-count ceiling rather than
   bytes keeps the rule exact; callers map their row-size budget onto
   it (e.g. 10 MB / 100 B rows → 100k rows).
3. hot key on the BIGGER side: ``max_key_rows · n_keys ≥ skew_factor ·
   n_rows`` (i.e. the hottest key holds ≥ skew_factor × the mean key's
   rows) → **salted** (``skew.salted_join``: the big side salts, the
   mid-size side replicates). Only the big side matters — the small
   side is replicated anyway, so its hot keys never concentrate a
   reducer.
4. otherwise → **shuffle** (plain hash join; AQE may still re-plan).

At 100 TB the stats pass costs two one-scan sketch builds plus two
per-key aggregates — hours cheaper than discovering mid-join that a
straggler reducer owns a hot key, and the same sketches are reusable
ingest-time state (``stream_cms_maintenance``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.operators.sketch import (
    cms_join_size_estimate,
    cms_join_size_estimate_sql,
)
from tickdb_spark.operators.skew import salted_join

#: Default decision thresholds — documented in the module docstring.
BROADCAST_ROWS = 100_000
SKEW_FACTOR = 16


def _decision_case(broadcast_rows: int, skew_factor: int) -> str:
    """The decision as ONE fixed expression text, shared verbatim by the
    Spark plan and the DuckDB oracle (integer comparisons only)."""
    return f"""CASE
      WHEN est_rows = 0 THEN 'prune'
      WHEN n_a <= {int(broadcast_rows)} AND n_a <= n_b THEN 'broadcast_a'
      WHEN n_b <= {int(broadcast_rows)} THEN 'broadcast_b'
      WHEN (CASE WHEN n_a >= n_b
            THEN a_max_key_rows * a_keys >= {int(skew_factor)} * n_a
            ELSE b_max_key_rows * b_keys >= {int(skew_factor)} * n_b END)
        THEN 'salted'
      ELSE 'shuffle' END"""


def _side_stats(df: DataFrame, col: str, prefix: str) -> DataFrame:
    per_key = df.groupBy(F.col(col).alias("k")).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias(f"n_{prefix}"),
        F.count(F.lit(1)).cast("long").alias(f"{prefix}_keys"),
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias(f"{prefix}_max_key_rows"),
    )


def choose_join(
    a: DataFrame,
    a_col: str,
    b: DataFrame,
    b_col: str,
    broadcast_rows: int = BROADCAST_ROWS,
    skew_factor: int = SKEW_FACTOR,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """One row: ``(n_a, a_keys, a_max_key_rows, n_b, b_keys,
    b_max_key_rows, est_rows, exact_rows, decision)``. All inputs to
    ``decision`` are exact integers; ``est_rows`` comes from the CMS
    inner product (never the materialized join). Each single-row stat
    frame broadcasts into the combine."""
    stats = (
        _side_stats(a, a_col, "a")
        .crossJoin(F.broadcast(_side_stats(b, b_col, "b")))
        .crossJoin(
            F.broadcast(cms_join_size_estimate(a, a_col, b, b_col, depth, width))
        )
    )
    return stats.withColumn(
        "decision", F.expr(_decision_case(broadcast_rows, skew_factor))
    )


def choose_join_sql(
    a_sql: str,
    a_expr: str,
    b_sql: str,
    b_expr: str,
    broadcast_rows: int = BROADCAST_ROWS,
    skew_factor: int = SKEW_FACTOR,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB twin: same per-side stats, same CMS estimate subquery,
    the SAME decision CASE text."""
    est = cms_join_size_estimate_sql(a_sql, a_expr, b_sql, b_expr, depth, width)
    return f"""
    WITH est AS MATERIALIZED ({est}),
    a_stats AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_a,
             CAST(count(*) AS BIGINT) AS a_keys,
             CAST(COALESCE(MAX(c), 0) AS BIGINT) AS a_max_key_rows
      FROM (SELECT {a_expr} AS k, count(*) AS c FROM ({a_sql}) GROUP BY 1)
    ),
    b_stats AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_b,
             CAST(count(*) AS BIGINT) AS b_keys,
             CAST(COALESCE(MAX(c), 0) AS BIGINT) AS b_max_key_rows
      FROM (SELECT {b_expr} AS k, count(*) AS c FROM ({b_sql}) GROUP BY 1)
    )
    SELECT n_a, a_keys, a_max_key_rows, n_b, b_keys, b_max_key_rows,
           est_rows, exact_rows,
           {_decision_case(broadcast_rows, skew_factor)} AS decision
    FROM a_stats, b_stats, est
    """


def apply_join_decision(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    decision: str,
    a_is_big: bool = True,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Execute the chosen strategy. ``decision`` is a ``choose_join``
    output value; ``a_is_big`` says which side salts when 'salted'
    (``n_a >= n_b`` from the same row). Column order: a's columns then
    b's for every strategy except the mirrored salted case (salted_join
    puts the salted big side first)."""
    if decision == "prune":
        # certified-empty join: keep the joined schema, scan nothing
        return a.join(b, on, how).where(F.lit(False))
    if decision == "broadcast_a":
        return a.hint("broadcast").join(b, on, how)
    if decision == "broadcast_b":
        return a.join(F.broadcast(b), on, how)
    if decision == "salted":
        return (
            salted_join(a, b, on, salts, how)
            if a_is_big
            else salted_join(b, a, on, salts, how)
        )
    if decision == "shuffle":
        return a.join(b, on, how)
    raise ValueError(f"unknown join decision: {decision!r}")


def planned_join(
    a: DataFrame,
    a_col: str,
    b: DataFrame,
    b_col: str,
    broadcast_rows: int = BROADCAST_ROWS,
    skew_factor: int = SKEW_FACTOR,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Plan-then-join on a shared key name: collects the ONE stats row
    (a deliberate driver action — the planner decides before the join
    runs), then applies the decision. Requires ``a_col == b_col`` so the
    equi-join needs no renaming."""
    if a_col != b_col:
        raise ValueError("planned_join joins on a shared column name")
    row = choose_join(a, a_col, b, b_col, broadcast_rows, skew_factor).first()
    return apply_join_decision(
        a, b, [a_col], row["decision"], row["n_a"] >= row["n_b"], salts, how
    )
