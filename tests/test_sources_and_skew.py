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


def test_avro_gated_or_roundtrips(spark):
    """Avro (SURVEY §2.1 Tier B): when the spark-avro jar is present
    the round-trip must match the parquet source; when absent the
    gated path must raise ConnectorUnavailable, not a classpath
    stack trace. Green either way."""
    from datafusion_tpc_spark.sources.connectors import avro_available, read_any

    region = load_table(spark, SF_DIR, "region")
    if avro_available():
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "region_avro")
            region.write.format("avro").save(path)
            back = read_any(spark, "avro", path)
            assert sorted(map(tuple, back.collect())) == sorted(
                map(tuple, region.collect())
            )
    else:
        with pytest.raises(ConnectorUnavailable, match="spark-avro"):
            read_any(spark, "avro", "/nonexistent")


def test_blake2b_matches_hashlib(spark):
    """blake2b pandas_udf (SURVEY §2.8 digest family) must equal
    stdlib hashlib exactly, and preserve NULLs."""
    import hashlib

    from datafusion_tpc_spark.functions.digests import blake2b_hex

    df = spark.createDataFrame(
        [("hello world",), ("",), (None,)], "s string"
    ).select("s", blake2b_hex("s").alias("h"))
    got = {r["s"]: r["h"] for r in df.collect()}
    expect = lambda v: hashlib.blake2b(v.encode(), digest_size=32).hexdigest()
    assert got["hello world"] == expect("hello world")
    assert got[""] == expect("")
    assert got[None] is None


def test_blake3_gated(spark):
    """blake3 has no stdlib implementation — either the wheel imports
    and the UDF works, or the factory raises a clear RuntimeError."""
    from datafusion_tpc_spark.functions.digests import blake3_hex

    try:
        udf = blake3_hex()
    except RuntimeError as exc:
        assert "blake3" in str(exc)
        return
    df = spark.createDataFrame([("x",)], "s string").select(udf("s").alias("h"))
    assert len(df.collect()[0]["h"]) == 64
