"""Bucketed tables for shuffle-free co-located joins — the cluster-scale
strategy for repeated joins on the same key (SURVEY.md §4.2 scale notes).

Writing both sides bucketed by the join key lets the sort-merge join read
pre-partitioned data: zero Exchange operators in the join plan. At 100 TB
this converts the dominant shuffle of a fact-fact join into plain scans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tickdb_spark.plans import count_op


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li_b"))
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "ord_b"))
        .mode("overwrite")
        .saveAsTable("ord_b")
    )
    yield spark.table("li_b"), spark.table("ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, orders = bucketed_tables
    # disable broadcast so the join strategy must be sort-merge — the case
    # bucketing exists for (both sides too big to broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert count_op(joined, "SortMergeJoin") == 1
        # the join itself needs no exchange: only the final aggregate does
        plan_exchanges = count_op(joined, "Exchange")
        assert plan_exchanges <= 1, f"bucketed join should not shuffle, saw {plan_exchanges}"
        # and it computes the right thing
        total = sum(r["n"] for r in joined.collect())
        assert total == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join on raw parquet shuffles both sides
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert count_op(joined, "Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
