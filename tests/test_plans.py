"""Physical-plan quality gates — the SURVEY §4 optimizer claims,
asserted against actual `.explain` output so a regression in plan
shape fails CI, not just a benchmark.

Checked per claim:
- projection + predicate pushdown reach the Parquet scan,
- dimension joins broadcast (no shuffle of the fact side),
- grouped aggregation is two-phase (partial before the exchange),
- top-k compiles to TakeOrderedAndProject (never a global sort),
- no accidental CartesianProduct outside the declared cross join,
- scalar-function pipelines stay inside WholeStageCodegen (no
  Python/BatchEvalPython in the hot path).
"""

from __future__ import annotations

import io
import contextlib

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_push_into_scan(spark):
    plan = _plan(spark, "q_filter_proj")
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan
    # projection pruning: only the 3 referenced columns reach the reader
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_quantity" not in read_schema


def test_dimension_joins_broadcast(spark):
    for name in ("q_join_broadcast", "q_join_inner"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
    # q_join_broadcast must not shuffle before the aggregation's own
    # exchange: exactly one Exchange (the groupBy), rest broadcast
    plan = _plan(spark, "q_join_broadcast")
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.strip().startswith("(") and ") Exchange" in l
    )
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"


def test_aggregation_is_two_phase(spark):
    plan = _plan(spark, "q_agg_avg")
    # partial + final HashAggregate around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalSort" not in plan


def test_no_accidental_cartesian(spark):
    for name in sorted(registry.QUERIES):
        if name in ("q_join_cross",) or name.startswith(("q_stream", "q_mm_decode")):
            continue
        if name in ("q_dedup_ngram", "q_dedup_embed"):  # heavyweight; shapes tested elsewhere
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_scalar_pipeline_stays_in_codegen(spark):
    for name in ("q_fn_math", "q_fn_string", "q_pred_algebra"):
        df = registry.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()  # simple mode: '*(n)' prefixes = codegen stages
        plan = buf.getvalue()
        assert "*(" in plan, f"{name} has no whole-stage-codegen stage:\n{plan}"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} fell off the JVM fast path"
        )
