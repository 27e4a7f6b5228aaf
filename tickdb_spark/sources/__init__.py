"""Source/sink adapters: load tick docs or canonical ticks from the
formats Spark ships (parquet, json, csv, orc), with schema enforcement."""

from tickdb_spark.sources.io import read_any, read_tick_docs, write_any

__all__ = ["read_any", "read_tick_docs", "write_any"]
