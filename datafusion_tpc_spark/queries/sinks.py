"""Batch write-path surface (r5) — the reference has NO write path:
its object-store put/multipart are `todo!()` (reference
src/object_store/file.rs:215-228,303-309). This module exercises ours
end-to-end where it is most demanding: a DISTRIBUTED writer for a
format Spark itself cannot write in this container (Avro, no
spark-avro jar) through the Spark 4 Python DataSource writer API —
the batch twin of the streaming sinks (stream_sink.py, py_sink.py).

Registered after the round-5 driver window; birth rounds pinned in
tests/test_registry_order.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query

_SINK_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache", "avro_sink"
)

# run dirs created by this process — excluded from pruning (a prior
# call's lazily-read result may still point at its dir)
_LIVE_RUNS: set[str] = set()


@query(
    "q_sink_avro",
    oracle="""
    SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q_sink_avro(spark, sf_dir):
    """Avro round trip through the distributed Python writer: write
    `documents` as a directory of part-*.avro files (one per task —
    executor-side OCF block encoding, driver-side _SUCCESS commit,
    sources/avro_py.py PyAvroWriter) and read it back through the
    jar-less block-split reader. Exact oracle = the source table: the
    round trip must be lossless, which pins the whole encode path
    (zigzag varints, deflate blocks, nullable unions) against the
    decode path AND against DuckDB's view of the original parquet.

    Scale: write is one task per input partition, no driver data
    path; read re-splits per block. Commit protocol is the py_sink
    manifest shape: parts become visible only at driver commit."""
    from datafusion_tpc_spark.sources.avro_py import register

    register(spark)
    # prune prior runs, but never a dir created by this process — a
    # lazily-returned DataFrame from an earlier call still reads it
    if os.path.isdir(_SINK_CACHE):
        for stale in os.listdir(_SINK_CACHE):
            if stale not in _LIVE_RUNS:
                shutil.rmtree(os.path.join(_SINK_CACHE, stale), ignore_errors=True)
    run_name = uuid.uuid4().hex[:12]
    _LIVE_RUNS.add(run_name)
    out = os.path.join(_SINK_CACHE, run_name)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    docs.write.format("pyavro").mode("overwrite").option("path", out).save()
    return spark.read.format("pyavro").load(out)
