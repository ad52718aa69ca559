"""Round-trip tests for the source/sink matrix and equivalence tests
for the skew utilities (salted forms must equal unsalted forms)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.skew import salted_aggregate, salted_join
from datafusion_tpc_spark.sources.connectors import (
    ConnectorUnavailable,
    read_any,
    write_partitioned,
)
from tests.conftest import SF_DIR

os.makedirs("/root/repo/.cache", exist_ok=True)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_write_read_roundtrip(spark, fmt):
    src = load_table(spark, SF_DIR, "nation")
    with tempfile.TemporaryDirectory(dir="/root/repo/.cache") as d:
        path = os.path.join(d, f"nation_{fmt}")
        write_partitioned(src, path, fmt=fmt)
        back = read_any(spark, fmt, path, schema="n_nationkey int, n_name string, n_regionkey int")
        assert _sorted_rows(back.select(*src.columns)) == _sorted_rows(src)


def test_partitioned_write_prunes(spark):
    src = load_table(spark, SF_DIR, "customer")
    with tempfile.TemporaryDirectory(dir="/root/repo/.cache") as d:
        path = os.path.join(d, "cust_part")
        write_partitioned(src, path, partition_by=["c_mktsegment"])
        back = read_any(spark, "parquet", path)
        one = back.filter(F.col("c_mktsegment") == "BUILDING")
        # partition pruning: the physical plan's scan must carry the
        # partition filter, and counts must match
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert one.count() == src.filter("c_mktsegment = 'BUILDING'").count()


def test_lakehouse_unavailable_is_clear(spark):
    with pytest.raises(ConnectorUnavailable):
        read_any(spark, "delta", "/tmp/nonexistent")


def test_salted_aggregate_matches_plain(spark):
    o = load_table(spark, SF_DIR, "orders")
    plain = _sorted_rows(
        o.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
    )
    salted = salted_aggregate(
        o.select("o_orderstatus", "o_totalprice", "o_orderkey"),
        ["o_orderstatus"],
        {"n": "count", "total": "sum:o_totalprice", "mn": "min:o_orderkey", "mx": "max:o_orderkey"},
        n_salts=8,
    ).select(
        "o_orderstatus", "n", F.round("total", 4).alias("total"), "mn", "mx"
    )
    assert _sorted_rows(salted) == plain


def test_salted_join_matches_plain(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = _sorted_rows(
        o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_mktsegment")
    )
    salted = _sorted_rows(
        salted_join(o, c, "o_custkey", "c_custkey", n_salts=8).select(
            "o_orderkey", "c_mktsegment"
        )
    )
    assert salted == plain
