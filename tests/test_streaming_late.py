"""q_stream_late invariants beyond the oracle hash: the drop
accounting must balance, and the engine must REPORT the drops
(numRowsDroppedByWatermark) — the observability half of late-data
handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.functions.digest import h60
from datafusion_tpc_spark.streaming.late_data import q_stream_late, run_late_stream
from tests.conftest import SF_DIR


def test_late_drop_accounting_balances(spark):
    """kept + analytically-late == total input; the late subset is
    non-empty (a zero-drop run would prove nothing)."""
    kept = sum(r.n for r in q_stream_late(spark, SF_DIR).collect())
    from datafusion_tpc_spark.catalog import load_table

    e = load_table(spark, SF_DIR, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    lo, hi = e.agg(
        F.min(F.expr("unix_micros(ts) DIV 1000000")),
        F.max(F.expr("unix_micros(ts) DIV 1000000")),
    ).first()
    ws = (hi - lo + 5) // 5
    tagged = e.select(
        F.least(
            F.expr(f"(unix_micros(ts) DIV 1000000 - {lo}) DIV {ws}"),
            F.lit(4).cast("bigint"),
        ).alias("slice"),
        (h60(F.concat(F.lit("late:"), F.col("event_id").cast("string"))) % 10 == 0).alias(
            "late"
        ),
    )
    total = tagged.count()
    n_late = tagged.filter(F.col("late") & (F.col("slice") <= 1)).count()
    assert n_late > 0
    assert kept == total - n_late


def test_late_drops_are_reported(spark):
    """numRowsDroppedByWatermark must be non-zero across the run —
    the engine-side evidence that rows were dropped BY THE WATERMARK,
    not lost."""
    _, prog = run_late_stream(spark, SF_DIR)
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in prog
        for so in p["stateOperators"]
    )
    assert dropped > 0
    # and the watermark must actually advance across batches
    wms = [p["eventTime"].get("watermark") for p in prog if p["eventTime"].get("watermark")]
    assert len(set(wms)) >= 3
