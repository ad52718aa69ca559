"""Streaming ↔ batch equivalence (SURVEY §5.4-style property checks).

The streaming queries are rows-only for the driver; here we pin their
semantics harder: every window a streaming run emits must exist with
identical aggregates in the exact-oracled batch twin, and the stateful
running totals must converge to the batch aggregates.
"""

from __future__ import annotations

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _by_key(rows, keys):
    return {tuple(r[k] for k in keys): r for r in (row.asDict() for row in rows)}


def test_stream_ts_unit_matches_batch(spark):
    """Ts-unit regression guard (round-3 verdict item 2): the
    streaming reader's explicit schema must land on the SAME instant
    values the batch reader produces, whatever unit (int64-ns or
    timestamp[us]) the testdata files carry. A unit mismatch shows up
    here as a min(ts) off by ~1000× instead of as silently-empty
    windows downstream."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.streaming.stream_queries import _events_streaming

    batch_min = load_table(spark, SF_DIR, "events").agg(F.min("ts")).collect()[0][0]
    sink = registry.QUERIES["q_stream_dedup"](spark, SF_DIR)
    stream_min = sink.agg(F.min("ts")).collect()[0][0]
    assert stream_min == batch_min, (stream_min, batch_min)
    # and the streaming schema itself resolves ts to a timestamp
    assert dict(_events_streaming(spark, SF_DIR).dtypes)["ts"] == "timestamp"


def test_stream_tumble_matches_batch(spark):
    batch = _by_key(
        registry.QUERIES["q_evt_tumble"](spark, SF_DIR).collect(),
        ("window_start", "event_type"),
    )
    stream = _by_key(
        registry.QUERIES["q_stream_tumble"](spark, SF_DIR).collect(),
        ("window_start", "event_type"),
    )
    assert stream, "streaming run emitted nothing"
    # append mode: stream emits only watermark-closed windows — subset
    for key, srow in stream.items():
        brow = batch[key]
        assert srow["n"] == brow["n"], key
        assert abs(srow["avg_value"] - brow["avg_value"]) < 1e-9, key


def test_stream_session_matches_batch(spark):
    batch = _by_key(
        registry.QUERIES["q_evt_session"](spark, SF_DIR).collect(),
        ("user_id", "session_start"),
    )
    stream = _by_key(
        registry.QUERIES["q_stream_session"](spark, SF_DIR).collect(),
        ("user_id", "session_start"),
    )
    assert stream, "streaming run emitted nothing"
    matched = 0
    for key, srow in stream.items():
        # late-data merging can differ at the stream tail; closed
        # sessions must match exactly when present in batch
        if key in batch:
            brow = batch[key]
            if srow["n_events"] == brow["n_events"]:
                matched += 1
    assert matched >= len(stream) * 0.9, f"only {matched}/{len(stream)} sessions match batch"


def test_stream_dedup_is_exact(spark):
    from datafusion_tpc_spark.catalog import load_table

    n_distinct = (
        load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    )
    n_stream = registry.QUERIES["q_stream_dedup"](spark, SF_DIR).count()
    assert n_stream == n_distinct


def test_stream_stateful_converges_to_batch(spark):
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    batch = _by_key(
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect(),
        ("user_id",),
    )
    stream = _by_key(
        registry.QUERIES["q_stream_stateful"](spark, SF_DIR).collect(), ("user_id",)
    )
    assert stream
    for key, srow in stream.items():
        assert srow["n_events"] == batch[key]["n_events"], key


def test_stream_join_matches_batch_interval_join(spark):
    """Every (click, purchase) pair the stream-stream join emits must
    exist in the batch interval join of the same fixture, and the
    stream must emit a meaningful fraction of it (append mode may
    withhold pairs still inside the final watermark)."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = set(
        (r.user_id, r.click_ts, r.purchase_ts)
        for r in clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .select(
            F.col("c_user").alias("user_id"), "click_ts", "purchase_ts"
        )
        .collect()
    )
    stream = [
        (r.user_id, r.click_ts, r.purchase_ts)
        for r in registry.QUERIES["q_stream_join"](spark, SF_DIR).collect()
    ]
    assert stream, "stream-stream join emitted nothing"
    assert len(stream) == len(set(stream)), "duplicate pairs emitted"
    for t in stream:
        assert t in batch, t
    assert len(stream) >= len(batch) * 0.5  # bounded watermark holdback


def test_stream_enrich_matches_batch_join(spark):
    """Stream-static enrichment is stateless — the streaming result
    must equal the batch join exactly (no watermark holdback)."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    batch = {
        (r["event_id"], r["c_name"], r["c_nationkey"])
        for r in ev.join(cust, ev.user_id == cust.c_custkey).collect()
    }
    stream = [
        (r["event_id"], r["c_name"], r["c_nationkey"])
        for r in registry.QUERIES["q_stream_enrich"](spark, SF_DIR).collect()
    ]
    assert len(stream) == len(batch)
    assert set(stream) == batch


def test_stream_sink_checkpoint_idempotent(spark):
    """Re-running the checkpointed parquet sink against the same
    checkpoint must be a no-op: the offsets are committed, so the
    second run adds zero rows — the exactly-once story of
    streaming/stream_sink.py."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from datafusion_tpc_spark.streaming.stream_queries import _events_streaming

    root = tempfile.mkdtemp(prefix="sink_idem_")
    data_dir = os.path.join(root, "data")

    def run_once():
        ev = (
            _events_streaming(spark, SF_DIR)
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "value")
        )
        q = (
            ev.writeStream.outputMode("append")
            .format("parquet")
            .option("path", data_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(data_dir).count()

    first = run_once()
    assert first > 0
    second = run_once()
    assert second == first, "second run against the same checkpoint re-emitted rows"


def test_stream_hop_matches_batch(spark):
    batch = _by_key(
        registry.QUERIES["q_evt_hop"](spark, SF_DIR).collect(),
        ("window_start", "event_type"),
    )
    stream = _by_key(
        registry.QUERIES["q_stream_hop"](spark, SF_DIR).collect(),
        ("window_start", "event_type"),
    )
    assert stream, "streaming hop emitted nothing"
    # append mode: only watermark-closed windows — subset of batch
    for key, srow in stream.items():
        brow = batch[key]
        assert srow["n"] == brow["n"], key
        assert abs(srow["total_value"] - brow["total_value"]) < 1e-6, key
