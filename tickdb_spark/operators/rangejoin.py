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
