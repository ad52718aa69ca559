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
    1-5), so the window is re-pointed each round at (a) every query
    NEVER driver-verified, (b) modules changed this round, (c) the
    stalest green rows. Round 6 order (VERDICT r5 item 1 — burn down
    the 81-query never-verified backlog, 50 at a time): every module
    whose queries are ALL never-verified, exactly filling 50 —
    aggregates_ext (3: the r6-FIXED q_agg_decimal, VERDICT r5 item 2,
    plus its 2 r5 greens ride along — module granularity), tpch_full
    (6: q2/q9/q11/q12/q16/q20) + tpch_more (6: q8/q13/q15/q17/q19/
    q22) completing TPC-H driver evidence for all 22 shapes,
    sql_shapes (8: recursive CTE, lateral, null-safe/fuzzy/overlap
    joins, unpivot, schema-evo union), typefns (4: interval/binary/
    variant/profile), sinks (4: avro sink, corrupt/meta/evolve
    scans), sketches (8: Misra-Gries freq, BPE, classifier, Zipf,
    KMV, KL, compress†, TTR), audit (3: DQ checks, SCD2, PIT join),
    sampling (4: weighted/mixture/IPF/DP), layout (2: z-order,
    compact), bloom (1), bucketing (1) = 50. Remaining ~31
    never-verified (events batch, windows trio, aggregates sextet,
    streaming quartet incl. the q_stream_enrich exact-oracle
    re-verify, graph/kmeans/skyline/geo/pipeline singles) rotate in
    round 7 — test_window_staleness enforces that promise.

    Import-cascade discipline: window modules must not transitively
    import query-registering modules (that drags the imported
    module's registrations ahead of the window plan) — shared
    helpers live in functions/digest.py and streaming/
    events_source.py for exactly this reason.

    tests/test_registry_order.py pins the window contents so silent
    shifts fail loudly.
    """
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

    # --- window boundary (50) — everything below queues behind ---
    # r6 pre-splits for the round-7 rotation (see the round6-window
    # plan memory): every module whose never-verified ids were locked
    # behind big already-green modules now registers them separately —
    # events_behavior (10), aggregates_more (6), pipeline_ext (3),
    # windows_ext (3), scalar_ext (1), udfs_ext (1), stream_enrich (2
    # incl. the q_stream_enrich exact-oracle re-verify).
    from datafusion_tpc_spark.queries import (  # noqa: F401
        tpch,
        udfs,
        udfs_ext,
        scalar_functions,
        scalar_ext,
        events,
        events_behavior,
        aggregates_more,
        windows_ext,
    )
    from datafusion_tpc_spark.streaming import (  # noqa: F401
        stream_queries,
        stream_enrich,
        stream_quantile,
        py_source,
        py_sink,
        merge,
        stream_sink,
    )
    from datafusion_tpc_spark.queries import (  # noqa: F401
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
        geo,
    )
    from datafusion_tpc_spark.operators import (  # noqa: F401
        asof,
        chunking,
        text,
        dedup,
        pipeline,
        pipeline_ext,
        similarity,
        multimodal,
        graph,
        skyline,
        kmeans,
        retrieval,
        curation,
        audit_ext,
        dedup_ext,
    )
    from datafusion_tpc_spark.queries import (  # noqa: F401
        events_ext,
        stats_ext,
        sinks_ext,
    )
