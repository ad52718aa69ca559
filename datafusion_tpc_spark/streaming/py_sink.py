"""Custom Python streaming SINK — Spark 4 DataSourceStreamWriter,
completing the Python DataSource API surface (batch reader:
sources/avro_py.py; stream reader: streaming/py_source.py; stream
writer: here). The reference's entire write path is todo!()
(reference src/object_store/file.rs:215-228,303-309) — both sink
queries in this repo are capability beyond it.

Exactly-once protocol (the part a custom sink must supply itself —
Spark's parquet sink gets it from _spark_metadata, a Python sink
builds its own): executor tasks write speculative part files and
return their paths in WriterCommitMessages; ONLY the driver-side
commit(messages, batchId) makes them visible, by writing a
`_commit_<batchId>` manifest listing the batch's files. Readers trust
manifests, never directory listings — a task retried after failure
leaves an orphan part file that no manifest references, and abort()
deletes what it can. Re-running a batch overwrites the same manifest
idempotently.

Scale shape: write() runs per partition on executors (no driver data
path); commit is O(files) metadata. A real deployment swaps the local
dir for object storage and the manifest for a transaction log
(Delta/Iceberg commit protocol — same shape).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

_SINK_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache", "py_sink"
)

# run dirs created by this process — excluded from pruning
_LIVE_RUNS: set[str] = set()


@dataclasses.dataclass
class _PartFile(WriterCommitMessage):
    path: str = ""
    rows: int = 0


class _CsvStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.csv")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(",".join(str(row[c]) for c in self.columns) + "\n")
                n += 1
        return _PartFile(path=part, rows=n)

    def commit(self, messages, batchId: int) -> None:
        manifest = os.path.join(self.path, f"_commit_{batchId}.json")
        files = [
            {"path": m.path, "rows": m.rows} for m in messages if m and m.rows
        ]
        with open(manifest, "w") as f:
            json.dump(files, f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m and os.path.exists(m.path):
                os.remove(m.path)


class PyCsvSinkDataSource(DataSource):
    """spark.writeStream.format("pycsvsink").option("path", dir) —
    manifest-committed CSV part files."""

    @classmethod
    def name(cls) -> str:
        return "pycsvsink"

    def streamWriter(self, schema, overwrite: bool):
        return _CsvStreamWriter(self.options["path"], schema.fieldNames())


def committed_files(path: str) -> list[str]:
    """Manifest-trusting reader side: the committed part files, in
    manifest order — orphans from failed/speculative tasks are
    invisible by construction."""
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith("_commit_") and name.endswith(".json"):
            with open(os.path.join(path, name)) as f:
                out.extend(e["path"] for e in json.load(f))
    return out


from pyspark.sql import functions as F  # noqa: E402

from datafusion_tpc_spark.registry import query  # noqa: E402
from datafusion_tpc_spark.streaming.py_source import (  # noqa: E402
    NUM_BATCHES,
    ROWS_PER_BATCH,
    _register,
)


@query(
    "q_stream_pysink",
    oracle=f"""
    WITH ids AS (
      SELECT i FROM generate_series(0, {NUM_BATCHES * ROWS_PER_BATCH - 1}) t(i)
    )
    SELECT CAST(i AS BIGINT) AS event_id,
           CAST(concat('0x', substr(md5('u|' || i), 1, 15)) AS BIGINT) % 100
             AS user_id,
           (CAST(concat('0x', substr(md5('v|' || i), 1, 15)) AS BIGINT) % 10000)
             / 100.0 AS value
    FROM ids
    """,
)
def q_stream_pysink(spark, sf_dir):
    """End-to-end custom-Python streaming pipeline: pyrate source →
    pycsvsink writer → manifest-trusting read-back. Deterministic
    source + exactly-once manifest commit ⇒ the read-back is
    bit-reproducible and carries an EXACT row-level oracle (the same
    md5 regeneration as q_stream_pysource). value survives the CSV
    round-trip exactly because it is a 2-decimal double (str() of
    12.34 parses back to the identical double).

    Scale: source shards and sink part-writes are both executor-side;
    the driver touches only offsets and manifests."""
    _register(spark)
    spark.dataSource.register(PyCsvSinkDataSource)
    run_name = uuid.uuid4().hex[:12]
    out_dir = os.path.join(_SINK_ROOT, run_name)
    # prune prior runs (ADVICE r4 pattern) — but never a dir created
    # by this process (a prior call's lazily-read result lives there)
    _LIVE_RUNS.add(run_name)
    if os.path.isdir(_SINK_ROOT):
        for stale in os.listdir(_SINK_ROOT):
            if stale not in _LIVE_RUNS:
                shutil.rmtree(os.path.join(_SINK_ROOT, stale), ignore_errors=True)
    ev = (
        spark.readStream.format("pyrate")
        .load()
        .select("event_id", "user_id", "value")
    )
    q = (
        ev.writeStream.format("pycsvsink")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    files = committed_files(out_dir)
    return spark.read.schema("event_id long, user_id long, value double").csv(files)
