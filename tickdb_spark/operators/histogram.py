"""Equi-depth (quantile) histograms at scale.

The exact form (``querybank.agg_equidepth_histogram``) is ``ntile`` over
one global ``ORDER BY value`` window — the correct semantic pin, but a
single-partition window: Spark logs "Moving all data to a single
partition" and at 100 TB the corpus serializes through one task.

The production form here is the shape every warehouse engine (and
Spark's own ``RangePartitioner``) uses for range bounds:

1. **deterministic sample** — :func:`operators.sampling.hash_sample`'s
   multiplicative id-hash filter (stateless, codegen, no shuffle; the
   sample is reproducible on any engine/partitioning, which is what
   makes this oracle-checkable where ``approx_percentile`` sketches are
   not). Pick ``sample_fraction`` so the sample stays bounded — at
   100 TB a 1e-5 fraction gives a ~1M-value sample, plenty for 8 cuts.
2. **exact cuts of the sample** — the sorted sample's order statistics
   at integer-exact positions ``ceil(m·j/k) = (m·j + k - 1) div k``
   (pure int arithmetic: identical in any engine; no float quantile
   interpolation to disagree over). One bounded
   ``sort_array(collect_list(value))`` aggregate — no window, no global
   sort; only the k-1 cut doubles reach the driver (the same k-row
   collect shape as ``kmeans.py``'s centroids).
3. **range assignment as literals** — the cuts become a codegen CASE
   chain; the corpus pass is scan → CASE → hash aggregate. Filters and
   pruning push to the parquet scan; the only shuffle is the k-group
   aggregate.

Bucket semantics: bucket j = values in ``(cut_{j-1}, cut_j]`` (first
matching ``value <= cut_j`` in ascending j; values above the last cut
take bucket k). Ties on a cut value land in one bucket together — the
honest semantic of value-range bucketing, unlike ``ntile``'s arbitrary
within-tie row splitting. Duplicate cut values leave their buckets
empty on both engines.

Reference parity note: the reference engine has no histogram operator
at all (SURVEY.md §2.3 extension); the exact-``ntile`` entry pins the
semantics this approximates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.operators.sampling import KNUTH, MOD, id_hash


def equidepth_cuts(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int,
    sample_fraction: float,
) -> list[float]:
    """The ``n_buckets - 1`` cut values from the deterministic sample
    (step 1 + 2 above). Driver-side result is k-1 doubles."""
    cut = int(sample_fraction * MOD)
    row = (
        df.where(F.col(value_col).isNotNull())
        .where(id_hash(F.col(id_col)) < F.lit(cut))
        .agg(
            F.sort_array(F.collect_list(value_col)).alias("vs"),
            F.count(F.lit(1)).alias("m"),
        )
        .first()
    )
    vs, m = row["vs"], int(row["m"])
    if m == 0:
        return []
    # position of cut j (1-based): ceil(m*j/k), exact in integers
    return [float(vs[(m * j + n_buckets - 1) // n_buckets - 1]) for j in range(1, n_buckets)]


def bucket_expr(value_col: str, cuts: list[float]) -> F.Column:
    """CASE chain assigning 1-based range buckets from literal cuts."""
    col = F.col(value_col)
    chain = reduce(
        lambda acc, jc: acc.when(col <= F.lit(jc[1]), F.lit(jc[0] + 1)),
        enumerate(cuts),
        F.when(F.lit(False), F.lit(0)),
    )
    return chain.otherwise(F.lit(len(cuts) + 1))


def equidepth_histogram_scale(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int = 8,
    sample_fraction: float = 1.0 / 16,
    sum_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Equi-depth histogram without a global sort: sampled cuts + codegen
    range assignment + one hash aggregate. Returns one row per non-empty
    bucket: (bucket, n, lo, hi, value_sum)."""
    cuts = equidepth_cuts(df, value_col, id_col, n_buckets, sample_fraction)
    rows = df.where(F.col(value_col).isNotNull())
    return (
        rows.select(bucket_expr(value_col, cuts).alias("bucket"), F.col(value_col))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.sum(F.col(value_col).cast(sum_decimal)).cast("double").alias("value_sum"),
        )
        .orderBy("bucket")
    )


def equidepth_scale_sql(
    table: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 8,
    sample_fraction: float = 1.0 / 16,
    sum_decimal: str = "DECIMAL(18,6)",
) -> str:
    """DuckDB twin: same hash sample, same integer cut positions, same
    CASE assignment order."""
    cut = int(sample_fraction * MOD)
    k = n_buckets
    cuts_cols = ", ".join(
        f"vs[(m * {j} + {k - 1}) // {k}] AS c{j}" for j in range(1, k)
    )
    case = "CASE " + " ".join(
        f"WHEN {value_col} <= c{j} THEN {j}" for j in range(1, k)
    ) + f" ELSE {k} END"
    return f"""
    WITH eq_sample AS (
      SELECT {value_col} FROM {table}
      WHERE {value_col} IS NOT NULL
        AND (({id_col}::BIGINT * {KNUTH}) % {MOD}) < {cut}
    ),
    eq_arr AS (
      SELECT list_sort(list({value_col})) AS vs, count(*) AS m FROM eq_sample
    ),
    eq_cuts AS (SELECT {cuts_cols} FROM eq_arr),
    eq_assign AS (
      SELECT {case} AS bucket, {value_col}
      FROM {table}, eq_cuts WHERE {value_col} IS NOT NULL
    )
    SELECT bucket, COUNT(*) AS n,
           MIN({value_col}) AS lo, MAX({value_col}) AS hi,
           CAST(SUM(CAST({value_col} AS {sum_decimal})) AS DOUBLE) AS value_sum
    FROM eq_assign GROUP BY bucket ORDER BY bucket
    """
