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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join with explicit salting: every ``big`` row gets a
    salt (partition id — no hash of the hot key, which would land every
    hot row on the same salt again); the ``small`` side is replicated
    across all ``salts`` values; the join runs on ``on + [_salt]``. A key
    whose rows fill one reducer under a plain shuffle join now spreads
    over ``salts`` reducers.

    Result == the plain join: each big row meets the full small row-set
    for its key exactly once (its own salt's replica). ``how`` is limited
    to inner/left/left_semi/left_anti — replicating the small side would
    duplicate its unmatched rows under right/full outer.

    When the small side fits in memory, ``broadcast(small)`` is strictly
    better (no shuffle at all) — this operator is for the mid-size dim
    that is too big to broadcast while the fact side has hot keys AQE's
    skew thresholds miss (or when AQE is unavailable, e.g. inside
    foreachBatch micro-batches).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports inner/left variants, got {how!r}")
    spark = big.sparkSession
    b = big.withColumn("_salt", (F.spark_partition_id() % salts).cast("int"))
    replicas = spark.range(salts).select(F.col("id").cast("int").alias("_salt"))
    s = small.crossJoin(replicas)
    out = b.join(s, on + ["_salt"], how)
    return out.drop("_salt")
