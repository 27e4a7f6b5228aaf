"""Z-order (Morton) data layout keys + the min/max pruning statistics
they buy — the primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` and
every multi-dimensional clustering story (Bayer 1997; public art).

Why it's an engine operator: at 100 TB the scan cost of a two-predicate
query (``user_id BETWEEN ... AND ts BETWEEN ...``) is decided by the
FILE LAYOUT, not the plan — a ts-sorted layout prunes nothing on
user_id, a user-sorted layout nothing on ts. Interleaving the bits of
both dimensions into one sort key gives every file a tight min/max
envelope on BOTH columns. This module computes the key (pure integer
bit ops — exact on any engine) and the per-range envelope statistics a
layout optimizer/pruner consumes.

Scale shape: the key is a codegen'd integer expression (no shuffle); the
range stats are ONE hash aggregate on ``zkey >> shift`` (map-side
combinable). Writing ``df.repartitionByRange(F.col('zkey'))`` +
``sortWithinPartitions('zkey')`` is then the standard clustering write —
the stats here are the evidence it worked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(q1: Column, q2: Column, bits: int = 16) -> Column:
    """Interleave two already-quantized non-negative ints (< 2^bits)
    into a Morton key: q1's bit j lands at position 2j+1, q2's at 2j.
    Pure shifts/masks/adds — bit-identical on any engine."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = (
            z
            + (F.shiftright(q1.cast("long"), j) % 2) * F.lit(1 << (2 * j + 1))
            + (F.shiftright(q2.cast("long"), j) % 2) * F.lit(1 << (2 * j))
        )
    return z


def zorder_key_sql(q1: str, q2: str, bits: int = 16) -> str:
    """DuckDB twin: identical shift/mod/multiply terms."""
    terms = []
    for j in range(bits):
        terms.append(f"((({q1}) >> {j}) % 2) * {1 << (2 * j + 1)}")
        terms.append(f"((({q2}) >> {j}) % 2) * {1 << (2 * j)}")
    return "(" + " + ".join(terms) + ")"


def quantize_to_grid(col: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Scale a value into [0, 2^bits) with exact integer arithmetic:
    ``((v - lo) * 2^bits) div (hi - lo + 1)``. Spark's ``div`` truncates
    and DuckDB's ``//`` floors, but both operands are non-negative here so
    the results coincide — and unlike ``floor(a / b)`` (double division)
    they stay exact past 2^53, which µs timestamps over multi-day spans
    already reach once scaled by 2^bits. Caller contract: the scaled
    numerator ``(hi - lo) * 2^bits`` must fit int64 (bits=16 leaves
    ~2^47 of span headroom; ns-scale epochs must be quantized to µs/ms
    first)."""
    span = (hi - lo + F.lit(1)).cast("long")
    num = (col.cast("long") - lo.cast("long")) * F.lit(1 << bits)
    return F.call_function("div", num, span)


def quantize_to_grid_sql(v: str, lo: str, hi: str, bits: int = 16) -> str:
    return f"((({v}) - ({lo})) * {1 << bits}) // (({hi}) - ({lo}) + 1)"


def zorder_range_stats(
    df: DataFrame,
    c1: Column,
    c2: Column,
    bits: int = 16,
    n_ranges_log2: int = 6,
) -> DataFrame:
    """Per z-range envelope statistics for a two-column clustering of
    ``df``: quantize both columns onto a 2^bits grid using their global
    min/max, interleave, split the keyspace into 2^n_ranges_log2
    contiguous z-ranges (the \"files\" of a clustered write), and emit
    each range's row count and min/max of BOTH source columns — the
    exact metadata a min/max pruner reads. Returns
    ``(zrange, n_rows, min_c1, max_c1, min_c2, max_c2)``."""
    bounds = df.agg(
        F.min(c1).cast("long").alias("_lo1"),
        F.max(c1).cast("long").alias("_hi1"),
        F.min(c2).cast("long").alias("_lo2"),
        F.max(c2).cast("long").alias("_hi2"),
    )
    with_b = df.select(
        c1.cast("long").alias("_v1"), c2.cast("long").alias("_v2")
    ).crossJoin(F.broadcast(bounds))
    q1 = quantize_to_grid(F.col("_v1"), F.col("_lo1"), F.col("_hi1"), bits)
    q2 = quantize_to_grid(F.col("_v2"), F.col("_lo2"), F.col("_hi2"), bits)
    shift = 2 * bits - n_ranges_log2
    z = zorder_key(q1, q2, bits)
    return (
        with_b.select(
            F.shiftright(z, shift).alias("zrange"), "_v1", "_v2"
        )
        .groupBy("zrange")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_v1").alias("min_c1"),
            F.max("_v1").alias("max_c1"),
            F.min("_v2").alias("min_c2"),
            F.max("_v2").alias("max_c2"),
        )
    )


def zorder_range_stats_sql(
    table_sql: str,
    c1: str,
    c2: str,
    bits: int = 16,
    n_ranges_log2: int = 6,
) -> str:
    """DuckDB twin of :func:`zorder_range_stats`."""
    shift = 2 * bits - n_ranges_log2
    q1 = quantize_to_grid_sql("_v1", "_lo1", "_hi1", bits)
    q2 = quantize_to_grid_sql("_v2", "_lo2", "_hi2", bits)
    z = zorder_key_sql(f"({q1})", f"({q2})", bits)
    return f"""
    WITH src AS MATERIALIZED (
      SELECT CAST({c1} AS BIGINT) AS _v1, CAST({c2} AS BIGINT) AS _v2
      FROM ({table_sql})
    ),
    bounds AS (
      SELECT CAST(min(_v1) AS BIGINT) AS _lo1, CAST(max(_v1) AS BIGINT) AS _hi1,
             CAST(min(_v2) AS BIGINT) AS _lo2, CAST(max(_v2) AS BIGINT) AS _hi2
      FROM src
    )
    SELECT ({z}) >> {shift} AS zrange,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(_v1) AS BIGINT) AS min_c1, CAST(max(_v1) AS BIGINT) AS max_c1,
           CAST(min(_v2) AS BIGINT) AS min_c2, CAST(max(_v2) AS BIGINT) AS max_c2
    FROM src, bounds
    GROUP BY 1
    """
