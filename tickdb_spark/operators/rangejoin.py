"""Point-in-interval (range) join via bucket expansion.

Spark has no native range join; the naive ``l.ts BETWEEN r.start AND
r.end`` theta-join plans as a nested-loop join — quadratic and
broadcast-bound. The scalable shape: quantize time into fixed buckets,
explode each interval into the buckets it covers, equi-join points to
interval-buckets on (key, bucket), then filter exact containment. The
equi-join shuffles on (key, bucket) like any hash join; expansion factor
is ceil(interval/bucket)+1, so pick ``bucket_ns`` near the typical
interval length.

(Databricks' range-join "bin" optimization and Flink's interval join use
the same construction.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    start: str,
    end: str,
    bucket_ns: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same ``keys``) with
    ``start <= point_ts < end``. Columns of both inputs are preserved
    (qualify ambiguous names before calling)."""
    # integer `div`, not `/`: epoch-ns values exceed 2^53, double division
    # would mis-bucket boundary rows
    first_b = F.expr(f"`{start}` div {bucket_ns}")
    last_b = F.expr(f"(`{end}` - 1) div {bucket_ns}")
    expanded = intervals.withColumn("_bucket", F.explode(F.sequence(first_b, last_b)))
    pts = points.withColumn("_bucket", F.expr(f"`{point_ts}` div {bucket_ns}"))
    joined = pts.join(expanded, [*keys, "_bucket"], how).where(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_ns: int,
) -> DataFrame:
    """Interval x interval overlap join: every (left, right) pair with
    the same ``keys`` whose half-open spans intersect
    (``l_start < r_end AND r_start < l_end``) — meeting overlaps,
    concurrent-session detection, downtime attribution.

    Same bucket-expansion construction as the point form, applied to
    BOTH sides: two intervals overlap only if they share a covered
    bucket, so the candidate set is an equi-join on (keys, bucket).
    Multi-bucket duplicates are collapsed WITHOUT a distinct: a pair is
    kept only in the bucket containing ``greatest(l_start, r_start)`` —
    for an overlapping pair that instant lies inside both spans, so
    exactly one shared bucket survives, and genuinely duplicate input
    rows still produce their duplicate pairs (a full-row distinct would
    silently merge them — ADVICE r6). Expansion stays
    ceil(len/bucket)+1 per row — never quadratic, shuffles like any
    hash join. Adds ``overlap_ns`` = ``least(ends) - greatest(starts)``
    (exact BIGINT).
    """
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{l_start}` div {bucket_ns}"),
                F.expr(f"(`{l_end}` - 1) div {bucket_ns}"),
            )
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"`{r_start}` div {bucket_ns}"),
                F.expr(f"(`{r_end}` - 1) div {bucket_ns}"),
            )
        ),
    )
    cand = (
        lb.join(rb, [*keys, "_bucket"])
        .where(
            F.col("_bucket")
            == F.expr(f"greatest(`{l_start}`, `{r_start}`) div {bucket_ns}")
        )
        .drop("_bucket")
    )
    return cand.where(
        (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    ).withColumn(
        "overlap_ns",
        F.least(F.col(l_end), F.col(r_end)) - F.greatest(F.col(l_start), F.col(r_start)),
    )
