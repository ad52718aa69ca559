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
    1-4), so the window is re-pointed each round at (a) every query
    NEVER driver-verified, (b) modules changed this round, (c) the
    stalest green rows. Round 5 order (VERDICT r4 item 1): every one
    of the 17 never-verified r4 additions plus the 2 new r5 queries,
    via their modules — sorts (4: q_topk_group never + 3 r1-only
    greens), setops (7: q_except_all/q_intersect_all never + 5
    r1-only), arrays (2: both never), tpch_extra (3: q7/q14 never +
    NEW q_tpch_q21), stream_sink (1: never — the only EXACT-oracled
    streaming query, its first driver row proves the write path the
    reference left as todo!()), chunking (4: all never), text (5:
    q_text_vocab never + 4 r2/r3 greens), scans (10: q_scan_xml/
    q_scan_dpp never + 8 r1/r3 greens), aggregates_ext (3:
    q_agg_mode/q_agg_hist never + NEW q_agg_decimal) = 39; then the
    stalest greens fill to 50: predicates (3, r1-only), subqueries
    (6, r2), asof (2, r2) = exactly 50. After this round every
    registered query has ≥1 driver CORRECTNESS row and the window
    settles into pure staleness rotation
    (tests/test_registry_order.py::test_window_staleness).

    Import-cascade discipline: window modules must not transitively
    import query-registering modules (that drags the imported
    module's registrations ahead of the window plan) — shared
    helpers live in functions/digest.py and streaming/
    events_source.py for exactly this reason.

    tests/test_registry_order.py pins the window contents so silent
    shifts fail loudly.
    """
    from datafusion_tpc_spark.queries import (  # noqa: F401
        sorts,
        setops,
        arrays,
        tpch_extra,
    )
    from datafusion_tpc_spark.streaming import stream_sink  # noqa: F401
    from datafusion_tpc_spark.operators import chunking, text  # noqa: F401
    from datafusion_tpc_spark.queries import (  # noqa: F401
        scans,
        aggregates_ext,
        predicates,
        subqueries,
    )
    from datafusion_tpc_spark.operators import asof  # noqa: F401

    # --- window boundary (50) — everything below queues behind ---
    from datafusion_tpc_spark.queries import (  # noqa: F401
        tpch,
        udfs,
        scalar_functions,
        events,
    )
    from datafusion_tpc_spark.streaming import (  # noqa: F401
        stream_queries,
        py_source,
        py_sink,
        merge,
    )
    from datafusion_tpc_spark.queries import (  # noqa: F401
        joins,
        windows,
        aggregates,
        logs_queries,
        tpch_more,
        tpch_full,
        typefns,
        sql_shapes,
        sinks,
        geo,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        dedup,
        pipeline,
        similarity,
        multimodal,
        bucketing,
        sketches,
        graph,
        layout,
        audit,
        sampling,
        bloom,
        skyline,
        kmeans,
    )
