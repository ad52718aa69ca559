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
    1-6), so the window is re-pointed each round at (a) every query
    NEVER driver-verified, (b) modules changed this round, (c) the
    stalest green rows. Round 7 order (VERDICT r5 item 5 + ADVICE r6
    item 1): the remaining pre-r6 never-verified backlog, the four
    r2-stale q_mm_* greens (staleness budget exhausted this round),
    and the q_stream_enrich exact-oracle re-verify — events_behavior
    (10), aggregates_more (6), windows_ext (4), scalar_ext (1: url),
    udfs_ext (1: arrow), pipeline_ext (3: lm/index/diff),
    stream_enrich (2: the exact re-verify + join_outer†), py_source /
    py_sink / merge / stream_quantile† (4), geo (1), similarity (4:
    centroid + 3 r3-green refreshes), multimodal (5: mm_dedup + the 4
    r2-stale greens), graph (3: pagerank/triangles/bfs), skyline (1),
    kmeans (1), retrieval (3: rrf/hardneg/pca), sinks_ext (1: json)
    = exactly 50. Deferred to the round-8 rotation (all birth-r6,
    staleness budget runs to round 11 under the inventory-derived
    cap of 5): stats_ext (7), curation (4),
    events_ext (3), audit_ext (1), dedup_ext (1) = 16 — they import
    FIRST in the queue below so r8 is again a pure reorder.

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

    # --- window boundary (50) — everything below queues behind ---
    # Round-8 rotation candidates first: the 16 deferred birth-r6 ids
    # (stats_ext, curation, events_ext, audit_ext, dedup_ext), then
    # the birth-r7 additions — prefix_join, splits, pq, diagnostics
    # (skew/drift/prcurve/kanon/ldiv + late tclose/chi2/calibration),
    # late_data, sketches_ext, forecast (holt + late autocorr/
    # backtest), sinks_dpo, semdedup, batching, cdc, mmr, raneval,
    # readability. Deadlines: birth-r6 by round 11, birth-r7 by round
    # 12 (cap 5 — see tests/test_registry_order._MAX_STALE_ROUNDS and
    # the window-plan memory).
    from datafusion_tpc_spark.queries import (  # noqa: F401
        stats_ext,
        events_ext,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        curation,
        audit_ext,
        dedup_ext,
        prefix_join,
        splits,
        pq,
    )
    from datafusion_tpc_spark.queries import diagnostics  # noqa: F401
    from datafusion_tpc_spark.streaming import late_data  # noqa: F401
    from datafusion_tpc_spark.operators import sketches_ext  # noqa: F401
    from datafusion_tpc_spark.queries import forecast, sinks_dpo  # noqa: F401
    from datafusion_tpc_spark.operators import semdedup, batching, cdc, mmr  # noqa: F401
    from datafusion_tpc_spark.operators import raneval  # noqa: F401
    from datafusion_tpc_spark.queries import readability  # noqa: F401
    # Green inventory (r1-r6 driver-verified), freshest last:
    from datafusion_tpc_spark.queries import (  # noqa: F401
        tpch,
        udfs,
        scalar_functions,
        events,
        joins,
        windows,
        aggregates,
        logs_queries,
        sorts,
        setops,
        arrays,
        tpch_extra,
        scans,
        predicates,
        subqueries,
    )
    from datafusion_tpc_spark.streaming import (  # noqa: F401
        stream_queries,
        stream_sink,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        asof,
        chunking,
        text,
        dedup,
        pipeline,
    )
    from datafusion_tpc_spark.queries import (  # noqa: F401
        aggregates_ext,
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
        bucketing,
    )
