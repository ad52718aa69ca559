"""Deterministic Python streaming data source — Spark 4
DataSourceStreamReader (the streaming twin of sources/avro_py.py's
batch Python DataSource).

The reference has no streaming at all (SURVEY §2.10 — its "streams"
are Volcano pull-streams, reference src/main.rs:69,106); this module
extends the engine with a custom micro-batch SOURCE, completing the
streaming story: custom source (here) → stateful/windowed transforms
(stream_queries.py) → checkpointed sink (stream_sink.py).

Everything the source emits derives from md5 (the repo's h60 digest
family — functions/digest.py), so a bounded run is bit-reproducible
ACROSS ENGINES: q_stream_pysource drains the full bounded stream with
an availableNow trigger and carries an EXACT DuckDB oracle that
regenerates the identical rows from generate_series + md5 — the only
custom-source streaming query with a hash-exact correctness row
(stream_sink proves the sink path; this proves the source path).

Scale shape: offsets are micro-batch indices; partitions(start, end)
emits one InputPartition per (batch, shard) so each micro-batch fans
out across executors (shards = SHARDS_PER_BATCH); read() runs
executor-side and generates its shard's rows arithmetically — no
driver data path, state is just the integer offset. A real deployment
points the same reader shape at a partitioned log (Kafka-like):
latestOffset() polls the log head, read() fetches one shard's range.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

ROWS_PER_BATCH = 1000
NUM_BATCHES = 10
SHARDS_PER_BATCH = 4
_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

_SCHEMA = "event_id long, user_id long, value double, ts timestamp"


def _h60_py(s: str) -> int:
    """Python twin of functions/digest.h60 (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _row(i: int):
    # user_id ∈ [0, 100), value = 2dp double in [0, 100) — both
    # md5-derived so DuckDB regenerates them bit-for-bit.
    return (
        i,
        _h60_py(f"u|{i}") % 100,
        (_h60_py(f"v|{i}") % 10000) / 100.0,
        _BASE_TS + timedelta(seconds=i),
    )


class _Shard(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _PyRateStreamReader(DataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        # Bounded source: the head never advances past NUM_BATCHES, so
        # an availableNow trigger drains exactly NUM_BATCHES batches
        # and the result is deterministic. An unbounded deployment
        # would poll its log head here.
        return {"batch": NUM_BATCHES}

    def partitions(self, start: dict, end: dict):
        shards = []
        for b in range(start["batch"], end["batch"]):
            base = b * ROWS_PER_BATCH
            step = ROWS_PER_BATCH // SHARDS_PER_BATCH
            for s in range(SHARDS_PER_BATCH):
                shards.append(_Shard(base + s * step, base + (s + 1) * step))
        return shards

    def read(self, partition: _Shard):
        for i in range(partition.lo, partition.hi):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass  # stateless generator — nothing to clean up


class PyRateDataSource(DataSource):
    """spark.readStream.format("pyrate") — deterministic micro-batch
    generator, registered via spark.dataSource.register."""

    @classmethod
    def name(cls) -> str:
        return "pyrate"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema):
        return _PyRateStreamReader()


def _register(spark) -> None:
    # Idempotent: Spark 4 allows re-registering a Python data source
    # under the same short name (latest registration wins).
    spark.dataSource.register(PyRateDataSource)


from pyspark.sql import functions as F  # noqa: E402

from datafusion_tpc_spark.registry import query  # noqa: E402
from datafusion_tpc_spark.streaming.events_source import drain as _drain  # noqa: E402


@query(
    "q_stream_pysource",
    oracle=f"""
    WITH ids AS (
      SELECT i FROM generate_series(0, {NUM_BATCHES * ROWS_PER_BATCH - 1}) t(i)
    ),
    rows AS (
      SELECT CAST(concat('0x', substr(md5('u|' || i), 1, 15)) AS BIGINT) % 100
               AS user_id,
             (CAST(concat('0x', substr(md5('v|' || i), 1, 15)) AS BIGINT) % 10000)
               / 100.0 AS value
      FROM ids
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS total_value
    FROM rows
    GROUP BY user_id
    """,
)
def q_stream_pysource(spark, sf_dir):
    """Custom Python streaming SOURCE, drained and aggregated: read
    the bounded deterministic pyrate stream (10 micro-batches × 1000
    rows, 4 executor-side shards per batch) under an availableNow
    trigger, then aggregate per user. Because every emitted value is
    md5-derived, the drained result is bit-reproducible and the
    oracle regenerates the SAME rows in DuckDB from generate_series —
    the only custom-source streaming query with a hash-exact
    correctness row (sf_dir is unused: the source is synthetic).

    Scale: the source shards each micro-batch across executors;
    the aggregation is an ordinary two-phase hash agg over the
    micro-batch union."""
    _register(spark)
    ev = spark.readStream.format("pyrate").load()
    out = _drain(ev, spark, "pysource")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
