"""Source/sink surface — SURVEY.md §2.1.

The reference registers Parquet directories against a URL-scheme-keyed
object-store registry (reference src/main.rs:90-92) and stubs its S3
store entirely (src/object_store/s3/mod.rs:22-84 — every method
todo!()); it has NO write path (src/object_store/file.rs:303-309 is
todo!()).

Spark's equivalents: the Hadoop FileSystem registry covers file:// and
s3a:// natively; reads are in catalog.py. This module adds:

- the format matrix helpers (parquet/csv/json/orc/avro read+write),
- a partitioned parquet writer (the write path the reference never
  finished — here it's one line of Spark),
- Avro (reference ships AvroExec via DataFusion 19, Cargo.toml:15 —
  SURVEY §2.1 Tier B): read_any prefers the spark-avro jar when one is
  on the classpath, otherwise falls back to the jar-less pure-Python
  OCF datasource in sources/avro_py.py (Spark 4 Python DataSource API,
  block-split partitions) — so q_scan_avro (queries/scans.py) always
  registers with an exact oracle,
- lakehouse connectors (Delta/Iceberg/Hudi) gated behind import/
  classpath probes — their jars are not in this container, so they
  degrade to a clear ConnectorUnavailable instead of a classpath
  stack trace.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """Raised when a lakehouse format's jars are not on the classpath."""


def avro_available() -> bool:
    """True when the spark-avro datasource jar is on the classpath.
    Probed from the pyspark jars directory (no session needed — this
    runs at registry-import time to decide whether q_scan_avro
    registers)."""
    import pyspark

    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    return any(_glob.glob(os.path.join(d, "spark-avro*.jar")) for d in jar_dirs)


def read_any(spark: SparkSession, fmt: str, path: str, schema: str | None = None) -> DataFrame:
    """Uniform reader over the built-in format matrix. Explicit schema
    recommended everywhere (schema inference = an extra full scan for
    csv/json at 100 TB)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt in ("json", "ndjson"):
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "avro":
        if avro_available():
            return reader.format("avro").load(path)
        # jar-less fallback: pure-Python OCF reader via the Spark 4
        # Python DataSource API (sources/avro_py.py) — block-split
        # partitions, null/deflate codecs, primitive + nullable types
        from datafusion_tpc_spark.sources import avro_py

        avro_py.register(spark)
        r = spark.read.schema(schema) if schema else spark.read
        return r.format("pyavro").load(path)
    return _lakehouse_read(spark, fmt, path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Partitioned write — hive-style directory partitioning so later
    reads get partition pruning for free. At 100 TB: partition on a
    low-cardinality time/tenant column, never a high-cardinality key
    (small-files explosion); pair with AQE coalesce so each partition
    writes few, large files."""
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt if fmt in ("parquet", "orc", "csv", "json") else "parquet")(path)


def _lakehouse_read(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    if fmt not in ("delta", "iceberg", "hudi"):
        raise ValueError(f"unknown format {fmt!r}")
    try:
        return spark.read.format(fmt).load(path)
    except Exception as exc:  # jars absent in this container
        raise ConnectorUnavailable(
            f"{fmt} connector requires its runtime jars on the Spark classpath "
            f"(not present in this environment): {exc}"
        ) from exc
