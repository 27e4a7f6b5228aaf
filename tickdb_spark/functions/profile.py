"""Table profiling: per-column null counts, exact distinct counts, and
min/max — the data-quality summary every ingestion pipeline runs before
training (schema drift, null explosions, and range shifts all surface
here first).

One scan: every column's statistics are computed in a single aggregate
row (Spark plans one pass with an Expand for the distinct counts), then
unpivoted to one row per column. Numeric extremes land in
``min_num``/``max_num`` (DOUBLE), string extremes in ``min_str``/
``max_str`` (binary/ASCII ordering — identical across engines for the
ASCII data profiled here); the other pair stays NULL, which keeps every
output column single-typed and the result oracle-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType, T.ShortType)


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(c).alias(f"_mn_{c}"),
            F.max(c).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in columns:
        numeric = isinstance(df.schema[c].dataType, _NUMERIC)
        mn, mx = f"_mn_{c}", f"_mx_{c}"
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.col(mn).cast("double") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(mx).cast("double") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if numeric else F.col(mn).cast("string")).alias("min_str"),
                (F.lit(None).cast("string") if numeric else F.col(mx).cast("string")).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")


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
