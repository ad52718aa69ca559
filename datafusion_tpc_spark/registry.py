"""Declared-query registry.

Every operator from SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible and deterministic) an ANSI-SQL oracle
string for DuckDB. The driver contract (__spark_entry__.py) simply
re-exports these dicts.

Conventions (SURVEY.md §5, FIXTURES.md):
- alias every computed column identically on both sides,
- explicit NULLS FIRST/LAST on every ORDER BY,
- ROUND(x, 6) on floating aggregates,
- array_sort around collect_list/array_agg,
- explicit casts at type-coercion edges (SUM(bigint) → DuckDB HUGEINT
  needs CAST AS BIGINT; counts are BIGINT on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query. ``oracle=None`` marks a rows-only
    check (approx / nondeterministic / non-SQL-expressible — the `†`
    ids in SURVEY.md §2)."""

    def deco(fn):
        # Silent overwrite would run the EARLIER-registered query under
        # the later one's oracle expectations (or vice versa) — the
        # r7 q_pipe_split near-miss: a new module reused an existing
        # name and every check "passed" by exercising the old query.
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already registered by {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        fn.query_name = name
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run.

    ORDER MATTERS: the external driver verifies queries in dict
    insertion order with a bounded window (exactly 50 rows in rounds
    1-10), so the window is re-pointed each round at (a) every query
    NEVER driver-verified, (b) modules changed this round, (c) the
    stalest green rows.

    ROUND-11 FORCING COMPUTATION (VERDICT r10 items 1-2 — recomputed
    from the committed CORRECTNESS_r01-r10 artifacts, not from the
    stale end-of-r9 plan): the post-r10 anchor distribution is
    r6:50, r7:76, r8:56, r9:50, r10:55 — i.e. **zero queries have
    anchor <= r5**, so NOTHING is EDF-forced into the r11 window
    (staleness cap 5 at inventory 287; a query is forced only at
    anchor <= current_round - 6 = r5). The pre-staged "46 anchor-r5
    greens" block was based on their r5 anchors, but every one of
    them was re-verified in r6 (deadline r12, not r11). The r11
    window therefore takes the judge's priority order: ALL 40
    never-verified queries + the three rows-only -> EXACT oracle
    graduations (q_sim_ann / q_sim_ivf in similarity; q_sim_ivfeval
    in raneval) + the anchor-r6 audit trio to shave r12's load:
    events_ext(3) prefix_join(1) splits(4) pq(1) diagnostics(9)
    sketches_ext(2) forecast(4) semdedup(1) batching(1) cdc(1)
    mmr(1) similarity(5) raneval(7) readability(1) quantization(2)
    retrieval(4) audit(3) = exactly 50.

    FORWARD EDF FEASIBILITY (checked by simulation): r12 = the 44
    remaining anchor-r6 greens (tpch_full 6, tpch_more 6, sql_shapes
    8, typefns 4, sinks 4, sketches 8, sampling 4, layout 2, bloom 1,
    bucketing 1) + 6 anchor-r7 one-query modules (scalar_ext,
    udfs_ext, geo, skyline, kmeans, sinks_ext) = 50. r13 = remaining
    anchor-r7 (76 - 26 NV-verified-r11 - 7 similarity/retrieval
    greens - 6 fillers = 37) + 13 anchor-r8 pulls. r14/r15/r16 =
    the anchor-r8/r9/r10 blocks (50/50/50 after the r13 pulls).
    Every deadline met; r11 births (deadline r17) absorb the slack.

    Import-cascade discipline: window modules must not transitively
    import query-registering modules (that drags the imported
    module's registrations ahead of the window plan) — shared
    helpers live in functions/digest.py (h60, cosine) and streaming/
    events_source.py (drain, _events_streaming) for exactly this
    reason.

    tests/test_registry_order.py pins the window contents so silent
    shifts fail loudly.
    """
    # Round-11 window (the r10-VERDICT priority order — see the
    # forcing computation in the docstring): ALL 40 never-verified
    # ids + the q_sim_ann/q_sim_ivf/q_sim_ivfeval oracle graduations
    # + the audit trio = exactly 50.
    from datafusion_tpc_spark.queries import events_ext  # noqa: F401
    from datafusion_tpc_spark.operators import (  # noqa: F401
        prefix_join,
        splits,
        pq,
    )
    from datafusion_tpc_spark.queries import diagnostics  # noqa: F401
    from datafusion_tpc_spark.operators import sketches_ext  # noqa: F401
    from datafusion_tpc_spark.queries import forecast  # noqa: F401
    from datafusion_tpc_spark.operators import semdedup, batching, cdc, mmr  # noqa: F401
    from datafusion_tpc_spark.operators import similarity  # noqa: F401
    from datafusion_tpc_spark.operators import raneval  # noqa: F401
    from datafusion_tpc_spark.queries import readability  # noqa: F401
    from datafusion_tpc_spark.operators import quantization, retrieval  # noqa: F401
    from datafusion_tpc_spark.operators import audit  # noqa: F401

    # --- window boundary (50) — everything below queues behind ---
    # r12 pre-staged block (exactly 50): the 44 remaining anchor-r6
    # greens (deadline r12) + 6 anchor-r7 one-query modules:
    from datafusion_tpc_spark.queries import (  # noqa: F401
        tpch_full,
        tpch_more,
        sql_shapes,
        typefns,
        sinks,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        sketches,
        sampling,
        layout,
        bloom,
        bucketing,
    )
    from datafusion_tpc_spark.queries import scalar_ext, udfs_ext, geo  # noqa: F401
    from datafusion_tpc_spark.operators import skyline, kmeans  # noqa: F401
    from datafusion_tpc_spark.queries import sinks_ext  # noqa: F401
    # r13-bound: remaining anchor-r7 modules (deadline r13):
    from datafusion_tpc_spark.queries import (  # noqa: F401
        events_behavior,
        aggregates_more,
        windows_ext,
    )
    from datafusion_tpc_spark.operators import pipeline_ext  # noqa: F401
    from datafusion_tpc_spark.streaming import (  # noqa: F401
        stream_enrich,
        py_source,
        py_sink,
        merge,
        stream_quantile,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        multimodal,
        graph,
    )
    # r11 birth (deadline r17): the IVF materialized-assignment
    # serving twin (VERDICT r10 item 3):
    from datafusion_tpc_spark.operators import ivf_served  # noqa: F401
    # r11 birth (deadline r17): PSI distribution-drift audit (lives
    # outside queries/diagnostics.py because that module is in the
    # r11 window and window modules must not grow mid-round):
    from datafusion_tpc_spark.queries import diagnostics_ext  # noqa: F401
    # r8-window modules, re-verified green in round 8 (deadline r14):
    from datafusion_tpc_spark.queries import (  # noqa: F401
        aggregates,
        logs_queries,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        dedup,  # NOTE: pipeline imports dedup — dedup must precede it
        pipeline,
    )
    from datafusion_tpc_spark.queries import stats_ext  # noqa: F401
    from datafusion_tpc_spark.operators import (  # noqa: F401
        curation,
        audit_ext,
        dedup_ext,
    )
    from datafusion_tpc_spark.queries import sinks_dpo  # noqa: F401
    # r9-window modules, re-verified green in round 9 (deadline r15):
    from datafusion_tpc_spark.queries import (  # noqa: F401
        events,
        joins,
        scalar_functions,
    )
    from datafusion_tpc_spark.streaming import stream_queries  # noqa: F401
    from datafusion_tpc_spark.queries import (  # noqa: F401
        tpch,
        udfs,
        windows,
    )
    from datafusion_tpc_spark.streaming import late_data  # noqa: F401
    # r10-window modules, re-verified green in round 10 (freshest —
    # deadline r16 under cap 5):
    from datafusion_tpc_spark.queries import (  # noqa: F401
        sorts,
        setops,
        arrays,
        tpch_extra,
        scans,
        predicates,
        subqueries,
    )
    from datafusion_tpc_spark.streaming import stream_sink  # noqa: F401
    from datafusion_tpc_spark.operators import (  # noqa: F401
        asof,
        chunking,
        text,
    )
    from datafusion_tpc_spark.queries import aggregates_ext  # noqa: F401
