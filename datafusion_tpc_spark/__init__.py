"""datafusion_tpc_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of thinkharderdev/datafusion-tpc.

The reference (/root/reference) is a thread-per-core embedding harness
around DataFusion 19: its *query surface* is anything DataFusion SQL
accepts (reference benches/query.rs:43 `ctx.sql(sql)`), its *own* code
is scheduling/IO plumbing that Spark replaces wholesale (SURVEY.md §2.12).

This package therefore exposes:
- session/catalog helpers (engine bootstrap, mirrors reference
  benches/query.rs:35-40 table registration),
- a declared-query registry covering the full SURVEY.md §2 operator
  inventory, each query paired with an ANSI-SQL DuckDB oracle,
- LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale,
- structured-streaming variants of the event-window operators.
"""

from datafusion_tpc_spark.session import get_spark, configure_runtime
from datafusion_tpc_spark.catalog import register_tables, load_table
from datafusion_tpc_spark.registry import QUERIES, ORACLE, query

__all__ = [
    "get_spark",
    "configure_runtime",
    "register_tables",
    "load_table",
    "QUERIES",
    "ORACLE",
    "query",
]
