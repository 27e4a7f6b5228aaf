"""As-of join: for each left row, the most recent right row at-or-before
(backward) / earliest at-or-after (forward) its timestamp, per key.

The reference has no joins at all (every query touches exactly one index,
``query.go:12-18``); this is the canonical cross-series alignment operator
a time-series engine needs (SURVEY.md §2.3).

Spark-first design — NOT a Pandas ``merge_asof`` per group: we union the
two sides and take a running ``last(..., ignorenulls=True)`` over a
(key, ts)-ordered window. That costs exactly ONE shuffle on the join key
(same as any equi-join) and streams within each partition — no Python, no
per-group materialization, skew handled by AQE. At 100 TB this is the plan
you want: shuffle both sides once, sort-merge within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
    strict: bool = False,
    tolerance: int | None = None,
) -> DataFrame:
    """Return ``left`` with, for each row, the latest (backward) or earliest
    (forward) ``right`` row's ``right_cols`` per ``on`` key.

    ``strict=True`` excludes right rows at exactly the left timestamp
    (``<`` instead of ``<=``). ``tiebreak`` names a right column ordering
    ties among equal right timestamps (highest wins for backward, lowest
    for forward) — required for deterministic output when right timestamps
    can collide. ``tolerance`` (same units as the ts columns) bounds the
    match distance — pandas ``merge_asof(tolerance=...)`` semantics: a
    nearest match farther than the bound yields NULLs, it does NOT fall
    back to an older one (the nearest match IS the as-of answer; beyond
    the staleness bound there is no answer). Implemented by carrying the
    matched right timestamp through the same window — no extra shuffle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    marked = "_v_"

    lhs = left.withColumn("_ts", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    # The matched row travels as ONE struct (its ts + every right col):
    # carrying columns independently would let a NULL right col pull its
    # value from an OLDER row than the matched timestamp — the staleness
    # gate would then validate a stale value against a newer row's ts
    # (ADVICE r6). A struct is non-null for every right row even when its
    # fields are null, so last(ignorenulls) always picks whole rows.
    rhs_cols = [
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias(marked),
    ]
    if tiebreak is not None:
        rhs_cols.append(F.col(tiebreak).alias("_tb"))
    rhs = right.select(*rhs_cols)
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # Ordering encodes inclusivity: backward non-strict sorts right rows
    # before left at equal ts (so an equal-ts right row is visible),
    # strict sorts them after. The running last() picks the nearest
    # preceding non-null, so the *winning* right row must sort closest to
    # the left row: for backward that's the highest tiebreak (asc order),
    # for forward the lowest (desc order, since ts is desc).
    right_first = not strict
    order = [F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()]
    order.append(F.col("_is_left").asc() if right_first else F.col("_is_left").desc())
    if tiebreak is not None:
        order.append(F.col("_tb").asc() if direction == "backward" else F.col("_tb").desc())
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    carried = unioned.withColumn(marked, F.last(marked, ignorenulls=True).over(w))
    match = F.col(marked)
    if tolerance is not None:
        rts = match.getField("__rts")
        diff = (
            F.col("_ts") - rts if direction == "backward" else rts - F.col("_ts")
        )
        match = F.when(rts.isNotNull() & (diff <= F.lit(tolerance)), match)
    out = carried.where(F.col("_is_left") == 1)
    for c in right_cols:
        out = out.withColumn(
            c if c not in left.columns else f"right_{c}", match.getField(c)
        )
    return out.drop(marked, "_ts", "_is_left", "_tb")
