"""Query-metrics observation — the Spark-native form of the
reference's only in-repo correctness signal: per-iteration row counts
printed from the consumption loop (reference src/main.rs:79,116 —
`rows += batch.num_rows()`).

Spark's `df.observe(name, exprs...)` attaches named aggregate metrics
to a plan node; they are computed DURING execution (no second scan)
and read back from the observation after an action — the idiomatic
way to get the reference's "rows consumed" (plus richer invariants)
for free on every production run. At 100 TB this replaces audit
re-scans: the metrics ride the existing pass.
"""

from __future__ import annotations

from pyspark.sql import Observation, functions as F

from datafusion_tpc_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_observe_matches_consumed_rows(spark):
    """Observed row count == the count the consumption loop sees —
    the reference's pull-loop check (src/main.rs:73-79), without a
    second execution."""
    obs = Observation("scan_metrics")
    li = load_table(spark, SF_DIR, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_consumed"),
        F.sum("l_quantity").alias("qty_sum"),
    )
    consumed = li.count()
    got = obs.get
    assert got["rows_consumed"] == consumed
    # cross-check the second metric against a direct aggregation
    direct = li.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(got["qty_sum"] - direct) < 1e-6


def test_observe_on_aggregated_plan(spark):
    """Metrics observed below an aggregation see pre-agg rows — the
    mode-equivalence property (same plan, repeated actions, stable
    metrics; reference re-executes one prepared plan 30× at
    src/main.rs:65-80)."""
    obs = Observation("pre_agg")
    ev = load_table(spark, SF_DIR, "events").observe(
        obs, F.count(F.lit(1)).alias("n_in")
    )
    out = ev.groupBy("event_type").agg(F.avg("value").alias("avg_value"))
    n_groups = out.count()
    assert n_groups > 0
    assert obs.get["n_in"] >= n_groups  # agg only reduces cardinality
