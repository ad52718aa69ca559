"""Table registration — the Spark analog of the reference's
``ctx.register_parquet("logs", path, ParquetReadOptions::default()
.parquet_pruning(true))`` (reference benches/query.rs:35-40) and
``ctx.read_parquet`` (reference src/main.rs:45).

Schema comes from Parquet footers, exactly like the reference; the one
normalization we apply is the ``events.ts`` column, which has shipped
as BOTH timestamp[ns] and timestamp[us] across driver testdata drops
(FIXTURES.md §9). We probe the loaded dtype: ns files surface as long
(``spark.sql.legacy.parquet.nanosAsLong``) and are truncated to
microseconds — the same truncation DuckDB applies when casting
TIMESTAMP_NS → TIMESTAMP — while µs files read natively. The
streaming twin of this probe is
``streaming/stream_queries._events_streaming`` (footer-level, since
streaming sources need the schema up front).

Scale note: at 100 TB these reads hit a distributed store via the
Hadoop FS layer; nothing here is local-mode-specific. Registration is
metadata-only (footer reads), no data motion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from datafusion_tpc_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes events.ts ns→µs timestamp.

    With SPARK_GRAFT_OPT_CACHE=1 (bench path) the read goes through
    the layout-optimized copy (fixtures/optimize.py): identical rows,
    row groups sized so scans parallelize across cores."""
    configure_runtime(spark)
    path = f"{sf_dir}/{name}.parquet"
    if os.environ.get("SPARK_GRAFT_OPT_CACHE") == "1":
        from fixtures.optimize import ensure_optimized

        path = ensure_optimized(sf_dir, name)
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns epoch → µs timestamp. Integer DIV, not floor(x/1000):
        # double division loses precision at 1e18 ns. Truncation
        # matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (in-memory session
    catalog — reference benches/query.rs:35 registers its one table the
    same way). Returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
