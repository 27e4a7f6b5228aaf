"""Table profiling: per-column null counts, exact distinct counts, and
min/max — the data-quality summary every ingestion pipeline runs before
training (schema drift, null explosions, and range shifts all surface
here first).

Shape (measured, sf0.1 lineitem x 7 columns): one aggregate row with
every column's stats forces an Expand of ~(columns+1)x the input for
the distinct counts — 11-17 s. A UNION of per-column aggregates is
1.1-1.8 s: each branch scans ONLY its column (parquet column pruning),
so total bytes read ≈ one wide scan while every distinct-aggregate is a
plain two-phase hash agg with no Expand. That is also the 100-TB
answer: narrow scans parallelize per column and nothing multiplies the
row count. Numeric extremes land in ``min_num``/``max_num`` (DOUBLE),
string extremes in ``min_str``/``max_str`` (binary/ASCII ordering —
identical across engines for the ASCII data profiled here); the other
pair stays NULL, keeping every output column single-typed and the
result oracle-hash-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType, T.ShortType)


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    parts = []
    for c in columns:
        numeric = isinstance(df.schema[c].dataType, _NUMERIC)
        one = df.select(c).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("_nn"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).alias("_mn"),
            F.max(c).alias("_mx"),
        )
        parts.append(
            one.select(
                F.lit(c).alias("column"),
                F.col("n_rows"),
                (F.col("n_rows") - F.col("_nn")).alias("n_nulls"),
                "n_distinct",
                (F.col("_mn").cast("double") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col("_mx").cast("double") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if numeric else F.col("_mn").cast("string")).alias("min_str"),
                (F.lit(None).cast("string") if numeric else F.col("_mx").cast("string")).alias("max_str"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def profile_table_sql(table: str, columns: list[str], numeric: set[str]) -> str:
    branches = []
    for c in columns:
        is_num = c in numeric
        branches.append(
            f"""
      SELECT '{c}' AS "column", count(*)::BIGINT AS n_rows,
             (count(*) - count({c}))::BIGINT AS n_nulls,
             count(DISTINCT {c})::BIGINT AS n_distinct,
             {f'min({c})::DOUBLE' if is_num else 'NULL::DOUBLE'} AS min_num,
             {f'max({c})::DOUBLE' if is_num else 'NULL::DOUBLE'} AS max_num,
             {'NULL::VARCHAR' if is_num else f'min({c})::VARCHAR'} AS min_str,
             {'NULL::VARCHAR' if is_num else f'max({c})::VARCHAR'} AS max_str
      FROM {table}"""
        )
    return "\n      UNION ALL".join(branches)
