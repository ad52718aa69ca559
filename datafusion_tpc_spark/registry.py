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
    1-9), so the window is re-pointed each round at (a) every query
    NEVER driver-verified, (b) modules changed this round, (c) the
    stalest green rows. Round 10 order (the EDF-forced plan staged
    end-of-r8, shipped verbatim): 50 of the 96 anchor-r5 greens —
    sorts (4), setops (7), arrays (2), tpch_extra (3), scans (10),
    predicates (3), subqueries (6), stream_sink (1), asof (2),
    chunking (4), text (5), aggregates_ext (3) = exactly 50.

    FORWARD PLAN (EDF simulation over the post-r9 anchors): r11 = the
    remaining 46 anchor-r5 greens (tpch_full, tpch_more, sql_shapes,
    typefns, sinks, sketches, audit, sampling, layout, bloom) +
    events_ext (3, birth-r6 deadline r12) + bucketing (1) = 50,
    ALREADY STAGED as the first block behind the boundary — the r11
    rotation is a one-line boundary move; r12 = the birth-r7/birth-r8
    never-verified backlog (prefix_join, splits, pq, diagnostics,
    sketches_ext, forecast, semdedup, batching, cdc, mmr, raneval,
    readability + the r8 births, deadline r13/r14), staged second.

    Import-cascade discipline: window modules must not transitively
    import query-registering modules (that drags the imported
    module's registrations ahead of the window plan) — shared
    helpers live in functions/digest.py (h60, cosine) and streaming/
    events_source.py (drain, _events_streaming) for exactly this
    reason.

    tests/test_registry_order.py pins the window contents so silent
    shifts fail loudly.
    """
    # Round-10 window (the plan staged end-of-r8): 50 of the 96
    # anchor-r5 greens — sorts (4), setops (7), arrays (2),
    # tpch_extra (3), scans (10), predicates (3), subqueries (6),
    # stream_sink (1), asof (2), chunking (4), text (5),
    # aggregates_ext (3) = exactly 50.
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

    # --- window boundary (50) — everything below queues behind ---
    # r11 pre-staged block (exactly 50 — the rotation is a one-line
    # boundary move): the remaining 46 anchor-r5 greens + events_ext
    # (3, birth-r6 deadline r12) + bucketing (1):
    from datafusion_tpc_spark.queries import (  # noqa: F401
        tpch_full,
        tpch_more,
        sql_shapes,
        typefns,
        sinks,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        sketches,
        audit,
        sampling,
        layout,
        bloom,
    )
    from datafusion_tpc_spark.queries import events_ext  # noqa: F401
    from datafusion_tpc_spark.operators import bucketing  # noqa: F401
    # r12-bound never-verified backlog (birth-r7 deadline r13 under
    # cap 5; birth-r8 deadline r14):
    from datafusion_tpc_spark.operators import (  # noqa: F401
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
    # r8-window modules, re-verified green in round 8:
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
    # r9-window modules, re-verified green in round 9 (freshest —
    # deadline r14 under cap 5):
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
