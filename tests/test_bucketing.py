"""Bucketed co-located join — the pre-partitioning strategy for
repeated fact⋈fact joins at 100 TB: write both sides bucketed on the
join key, and the join plans with NO shuffle on either side.

This is the Spark equivalent of the reference fork's ambition to
control data placement (its io_uring store + pinned workers): here
placement is declared once at write time and Catalyst proves it."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    if not spark.catalog.tableExists("bucketdemo.orders_b"):
        # the in-memory catalog forgets tables between sessions but the
        # warehouse directory persists — clear stale locations first
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{warehouse}/bucketdemo.db", ignore_errors=True)
        load_table(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).mode("overwrite").saveAsTable("bucketdemo.orders_b")
        load_table(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable("bucketdemo.lineitem_b")
    return "bucketdemo.orders_b", "bucketdemo.lineitem_b"


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # pin the sort-merge path: with broadcast allowed, AQE broadcasts
    # the small side and the bucketing never gets to prove itself
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(orders_b)
        li = spark.table(lineitem_b)
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        # co-located: no exchange may exist on either JOIN key — the
        # aggregation's exchange (on o_orderstatus) is the only one
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    bucketed = (
        spark.table(orders_b)
        .join(spark.table(lineitem_b), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .count()
    )
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
