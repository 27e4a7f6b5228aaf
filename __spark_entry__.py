"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship tick query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full query bank
(tickdb_spark/querybank.py) for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tickdb_spark.querybank import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: calendar-bucket aggregation through the tick engine
    (the reference's core operator, Q3) on sf0.001."""
    return REGISTRY["tick_bucket_hour_sum"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops omitted
    (driver records a rows-only check for those)."""
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
