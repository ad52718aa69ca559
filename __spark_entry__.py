"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the datafusion_tpc_spark registry: every operator
from SURVEY.md §2 (plus the LLM-pipeline extensions) registers a
PySpark callable and, where deterministic SQL semantics exist, a
DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_tpc_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 — the reference's
    `aggregation` bench (benches/query.rs:26) rebased onto `events`:
    multi-key grouped AVG."""
    return registry.QUERIES["q_agg_avg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return dict(registry.ORACLE)
