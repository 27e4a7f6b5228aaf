"""Generalized consecutive-sequence pattern matching (the
MATCH_RECOGNIZE / Flink-CEP shape, public art): find, per key, the
positions where N consecutive events satisfy N step predicates with a
bounded gap between consecutive steps.

Why it's an engine operator: the naive expression of "A then B then C"
is an N-way self-join on (key, adjacency), which both explodes and
loses the CONSECUTIVE requirement (no intervening events). The right
Spark shape: evaluate each step predicate ONCE per row (a codegen
boolean column), then ``lead`` the booleans and the timestamps over a
single ``(key, order)`` window — pattern matching collapses to one
window pass plus a codegen row filter. N predicates cost N lead
columns, not N joins.

Scale shape: ONE hash exchange on the key (all leads share the same
window spec); the match filter is whole-stage codegen; output is
match-starts only. State per task is the window frame (N rows), never
the partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sequence_match(
    df: DataFrame,
    key: str,
    order_col: str,
    tiebreak: str,
    steps: list[Column],
    max_gap: int | None = None,
) -> DataFrame:
    """Rows where ``len(steps)`` CONSECUTIVE events (per ``key``,
    ordered by ``(order_col, tiebreak)``) satisfy the step predicates
    in order, each step at most ``max_gap`` (same unit as
    ``order_col``) after the previous. ``steps`` are boolean Columns
    over the event row (arbitrary predicates — event types, value
    thresholds, combinations).

    Returns one row per match START: ``(key, step_ts: array<long> —
    the order_col of every matched step)``. Callers aggregate (counts
    per key, first match) or explode for per-step detail.
    """
    if not steps:
        raise ValueError("sequence_match needs at least one step predicate")
    w = Window.partitionBy(key).orderBy(order_col, tiebreak)
    d = df.withColumn("_sq_t", F.col(order_col).cast("long"))
    for i, pred in enumerate(steps):
        d = d.withColumn(f"_sq_m{i}", pred)
    cond = F.col("_sq_m0")
    ts_cols = [F.col("_sq_t")]
    for i in range(1, len(steps)):
        step_ok = F.coalesce(F.lead(f"_sq_m{i}", i).over(w), F.lit(False))
        cond = cond & step_ok
        t_i = F.lead("_sq_t", i).over(w)
        ts_cols.append(t_i)
        if max_gap is not None:
            t_prev = ts_cols[i - 1]
            cond = cond & ((t_i - t_prev) <= max_gap)
    return d.select(
        key,
        F.array(*ts_cols).alias("step_ts"),
        cond.alias("_sq_ok"),
    ).where(F.col("_sq_ok")).drop("_sq_ok")
