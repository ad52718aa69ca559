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
    1-7), so the window is re-pointed each round at (a) every query
    NEVER driver-verified, (b) modules changed this round, (c) the
    stalest green rows. Round 8 order (VERDICT r7 item 1, the plan
    computed end-of-r7): the r3-anchored stale greens FIRST —
    aggregates (14), logs_queries (3), dedup (10: the 8 r3/r4 greens
    + birth-r7 q_pipe_near_split + q_dedup_eval riding along),
    pipeline (10) = 37 — then the never-verified birth-r6 block —
    stats_ext (6), curation (4), audit_ext (1), dedup_ext (1) = 12 —
    and birth-r7 q_sink_dpo (1) = exactly 50.

    ROUND-9 PLAN (computed this round by EDF simulation over the
    post-r8 anchors; NOTE VERDICT r7 item 5's diagnostics+splits+
    forecast-in-r9 suggestion is infeasible — 49 anchor-r4 greens
    are forced into r10's window and 96 anchor-r5 greens into r11's,
    so r9..r11 have only 150-145 = 5 spare slots): r9 = the 49
    anchor-r4 greens — events (6), joins (13), scalar_functions
    (10), stream_queries (6), tpch (5), udfs (4), windows (5) — + 1
    never-verified (q_stream_late, streaming/late_data.py). r10 = 50
    of the 96 anchor-r5 greens; r11 = the remaining 46 + events_ext
    (3, birth-r6 deadline r12) + 1; r12 = the birth-r7/birth-r8
    never-verified backlog (diagnostics, splits, forecast,
    prefix_join, pq, sketches_ext, semdedup, batching, cdc, mmr,
    raneval, readability + this round's births, deadline r13/r14).

    Import-cascade discipline: window modules must not transitively
    import query-registering modules (that drags the imported
    module's registrations ahead of the window plan) — shared
    helpers live in functions/digest.py (h60, cosine) and streaming/
    events_source.py (drain, _events_streaming) for exactly this
    reason.

    tests/test_registry_order.py pins the window contents so silent
    shifts fail loudly.
    """
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

    # --- window boundary (50) — everything below queues behind ---
    # Round-9 block first (see the r9 plan in the docstring): the 49
    # anchor-r4 greens + q_stream_late.
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
    # Round-10/11 anchor-r5 greens, then the r12-bound never-verified
    # backlog (birth-r6 events_ext deadline r12; birth-r7 deadline
    # r13 under cap 5):
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
    from datafusion_tpc_spark.queries import (  # noqa: F401
        aggregates_ext,
        tpch_full,
        tpch_more,
        sql_shapes,
        typefns,
        sinks,
        events_ext,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        sketches,
        audit,
        sampling,
        layout,
        bloom,
        bucketing,
        prefix_join,
        splits,
        pq,
    )
    from datafusion_tpc_spark.queries import diagnostics  # noqa: F401
    from datafusion_tpc_spark.operators import sketches_ext  # noqa: F401
    from datafusion_tpc_spark.queries import forecast  # noqa: F401
    from datafusion_tpc_spark.operators import semdedup, batching, cdc, mmr  # noqa: F401
    from datafusion_tpc_spark.operators import raneval  # noqa: F401
    from datafusion_tpc_spark.queries import readability  # noqa: F401
    # Green inventory last verified r5-r7, freshest last:
    from datafusion_tpc_spark.queries import (  # noqa: F401
        events_behavior,
        aggregates_more,
        windows_ext,
        scalar_ext,
        udfs_ext,
    )
    from datafusion_tpc_spark.operators import pipeline_ext  # noqa: F401
    from datafusion_tpc_spark.streaming import (  # noqa: F401
        stream_enrich,
        py_source,
        py_sink,
        merge,
        stream_quantile,
    )
    from datafusion_tpc_spark.queries import geo  # noqa: F401
    from datafusion_tpc_spark.operators import (  # noqa: F401
        similarity,
        multimodal,
        graph,
        skyline,
        kmeans,
        retrieval,
    )
    from datafusion_tpc_spark.queries import sinks_ext  # noqa: F401
    from datafusion_tpc_spark.operators import quantization  # noqa: F401
