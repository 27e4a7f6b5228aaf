"""Skew-handling primitives for hot keys at scale.

AQE's skew-join splitting covers joins; heavy *aggregations* on skewed
keys still funnel one key's rows into one reducer. The classic fix is
two-phase salted aggregation: shard each key into ``salts`` sub-keys,
partially aggregate per shard (map-side + first shuffle spreads the hot
key over ``salts`` reducers), then merge shards. Works for any algebraic
aggregate — the same state-merge algebra the rollup cascade uses.

At 100 TB this is the difference between a 10-minute stage and one
straggler task running for hours.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shard_agg, merge_agg) pairs per supported aggregate. shard_agg runs on
#: raw rows within (key, salt); merge_agg combines shard states per key.
_ALGEBRA: dict[str, tuple[Callable[[Column], Column], Callable[[Column], Column]]] = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "max": (F.max, F.max),
    "min": (F.min, F.min),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salted keys.

    ``aggs`` maps output column → (agg_name, input_column); ``avg`` is
    expressed by requesting sum+count and dividing afterwards (exact
    algebraic decomposition).

    Example::

        salted_agg(events, ["user_id"],
                   {"total": ("sum", "value"), "n": ("count", "value")})
    """
    salt = (F.spark_partition_id() % salts).alias("_salt")
    shard_exprs, merge_exprs = [], []
    for out, (name, col) in aggs.items():
        if name not in _ALGEBRA:
            raise ValueError(f"unsupported salted aggregate: {name}")
        shard_fn, merge_fn = _ALGEBRA[name]
        shard_exprs.append(shard_fn(F.col(col)).alias(f"_s_{out}"))
        merge_exprs.append(merge_fn(F.col(f"_s_{out}")).alias(out))
    sharded = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*shard_exprs)
    return sharded.groupBy(*keys).agg(*merge_exprs)
