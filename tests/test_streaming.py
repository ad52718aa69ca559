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


def _split_events_files(n=4, in_order=True):
    """Split the events fixture into n ts-sorted parquet files with
    controlled modification times, so the file streaming source
    (maxFilesPerTrigger=1) processes them as n distinct micro-batches.
    in_order=False puts the OLDEST time slice in the newest file —
    its rows arrive after the watermark has advanced past them."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    d = tempfile.mkdtemp(prefix="events_split_")
    chunk = len(t) // n
    slices = [
        t.slice(i * chunk, chunk if i < n - 1 else len(t) - (n - 1) * chunk)
        for i in range(n)
    ]
    arrival = list(range(n)) if in_order else list(range(1, n)) + [0]
    base = 1_700_000_000
    for arrive_pos, slice_idx in enumerate(arrival):
        path = os.path.join(d, f"part{arrive_pos}.parquet")
        pq.write_table(slices[slice_idx], path)
        os.utime(path, (base + arrive_pos * 60, base + arrive_pos * 60))
    return d


def _run_tumble_stream(spark, src_dir):
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.streaming.stream_queries import (
        _EVENT_SCHEMA_TS,
        _drain,
    )

    ev = (
        spark.readStream.schema(_EVENT_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )
    return _drain(agg, spark, "stream_multibatch")


def test_stream_multibatch_watermark_matches_batch(spark):
    """Four ts-ordered files → four micro-batches; the watermark
    advances batch-over-batch and closes windows incrementally. Every
    closed window the stream emits must carry the exact batch count,
    and in-order arrival must close (nearly) all windows."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    src = _split_events_files(n=4, in_order=True)
    batch = _by_key(
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect(),
        ("window_start", "event_type"),
    )
    stream = _by_key(
        _run_tumble_stream(spark, src).collect(), ("window_start", "event_type")
    )
    assert stream, "multi-batch stream emitted nothing"
    for key, srow in stream.items():
        assert srow["n"] == batch[key]["n"], key
    # in-order arrival: the watermark sweeps the whole range, so only
    # tail windows inside the final watermark horizon may be withheld
    # — bound: ≤ 2 trailing 1h windows × event-type cardinality (5)
    assert len(stream) >= len(batch) - 10


def test_stream_multibatch_late_data_is_dropped(spark):
    """Out-of-order arrival: the oldest time slice arrives LAST, after
    the watermark has passed it. Append mode must drop those late rows
    — emitted windows carry counts ≤ the batch count, and nothing is
    double-emitted."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    src = _split_events_files(n=4, in_order=False)
    batch = _by_key(
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect(),
        ("window_start", "event_type"),
    )
    rows = _run_tumble_stream(spark, src).collect()
    keys = [(r["window_start"], r["event_type"]) for r in rows]
    assert rows, "out-of-order stream emitted nothing"
    assert len(keys) == len(set(keys)), "a window was emitted twice"
    late_dropped = 0
    for r in rows:
        brow = batch[(r["window_start"], r["event_type"])]
        assert r["n"] <= brow["n"], "stream emitted MORE rows than exist"
        if r["n"] < brow["n"]:
            late_dropped += 1
    assert late_dropped > 0, (
        "expected at least one window to lose late rows — fixture did not "
        "actually deliver data behind the watermark"
    )


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


def test_pysink_orphan_files_invisible(spark):
    """Exactly-once pin for the custom Python sink
    (streaming/py_sink.py): only manifest-committed part files are
    readable — an orphan part file (the residue of a failed or
    speculative task that never reached commit()) must not appear in
    the read-back set."""
    import os

    from datafusion_tpc_spark.registry import QUERIES
    from datafusion_tpc_spark.streaming.py_sink import _SINK_ROOT, committed_files

    df = QUERIES["q_stream_pysink"](spark, SF_DIR)
    n = df.count()
    assert n == 10000
    out_dir = os.path.join(_SINK_ROOT, os.listdir(_SINK_ROOT)[0])
    committed_before = set(committed_files(out_dir))
    orphan = os.path.join(out_dir, "part-orphan-from-failed-task.csv")
    with open(orphan, "w") as f:
        f.write("999999,1,1.0\n")
    assert set(committed_files(out_dir)) == committed_before, (
        "orphan part file leaked into the committed set"
    )
    assert (
        spark.read.schema("event_id long, user_id long, value double")
        .csv(committed_files(out_dir))
        .count()
        == n
    )


def test_stream_merge_multibatch_converges(spark):
    """foreachBatch CDC merge (streaming/merge.py): four micro-batches
    — in ts order AND with the oldest slice arriving last — must both
    converge to the exact batch-computed view. Upserts are order-free
    by construction (unique (ts, event_id) last-writer key + additive
    counts), so unlike the windowed streams there is no late-data
    loss to tolerate: equality is exact."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.streaming.merge import run_merge_stream
    from datafusion_tpc_spark.streaming.stream_queries import _EVENT_SCHEMA_TS

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expected = _by_key(
        load_table(spark, SF_DIR, "events")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("last_ts"), "n")
        .collect(),
        ("user_id",),
    )
    for in_order in (True, False):
        src_dir = _split_events_files(n=4, in_order=in_order)
        src = (
            spark.readStream.schema(_EVENT_SCHEMA_TS)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        final = _by_key(
            run_merge_stream(spark, src, f"test_{in_order}").collect(),
            ("user_id",),
        )
        assert len(final) == len(expected), in_order
        for key, row in final.items():
            assert row["last_ts"] == expected[key]["last_ts"], (in_order, key)
            assert row["n"] == expected[key]["n"], (in_order, key)


def test_stream_join_outer_emits_unmatched(spark):
    """q_stream_join_outer: under availableNow the final watermark
    sweep must emit every unmatched click with nulls, so outer rows =
    inner rows + clicks lacking any purchase in their 1-hour interval
    (computed batch-side)."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.registry import QUERIES

    outer = QUERIES["q_stream_join_outer"](spark, SF_DIR)
    n_outer = outer.count()
    n_null = outer.filter(F.col("purchase_ts").isNull()).count()
    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    n_inner_batch = clicks.join(purchases, cond).count()
    unmatched = clicks.join(purchases, cond, "left_anti")
    n_unmatched_batch = unmatched.count()
    # The final availableNow watermark is max(ts) - 1h delay; an
    # unmatched click emits only once its 1-hour interval END is
    # below it, so clicks in the last ~2h of the fixture stay in
    # state at shutdown — sandwich the null count between the
    # definitely-eligible set and the full batch anti-join.
    max_ts = ev.agg(F.max("ts")).first()[0]
    n_eligible = unmatched.filter(
        F.col("click_ts") + F.expr("INTERVAL 2 HOURS") < F.lit(max_ts)
    ).count()
    # small tolerance: the engine's eviction boundary (state-key
    # watermark) can exclude a handful of exactly-on-boundary clicks
    assert n_eligible - 5 <= n_null <= n_unmatched_batch
    assert n_unmatched_batch - n_null < 50  # only the tail is withheld
    assert n_outer == n_inner_batch + n_null


def test_stream_quantile_rank_error(spark):
    """q_stream_quantile (rows-only): the final streaming centroid
    estimates per event type must sit within ±3% rank of the exact
    per-type percentiles of `value` — slightly looser than the batch
    t-digest's 2% because the streaming state also absorbs per-batch
    compression."""
    from datafusion_tpc_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_stream_quantile"](spark, SF_DIR).collect()
    assert rows
    import collections

    vals = collections.defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        if r.value is not None:
            vals[r.event_type].append(r.value)
    for r in rows:
        v = sorted(vals[r.event_type])
        n = len(v)
        assert r.n_rows == n, (r.event_type, r.n_rows, n)
        for q, est in ((0.5, r.p50), (0.9, r.p90)):
            lo = v[max(0, int((q - 0.03) * n) - 1)]
            hi = v[min(n - 1, int((q + 0.03) * n))]
            assert lo <= est <= hi, (r.event_type, q, est, lo, hi)
