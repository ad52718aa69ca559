"""The reference's three benchmark queries, VERBATIM, on the
reconstructed `logs` table (reference benches/query.rs:23-27;
fixture spec FIXTURES.md §1):

    SELECT * FROM logs
    SELECT service, pod FROM logs WHERE request_method = 'DELETE'
    SELECT container, pod, AVG(response_bytes) AS avg_response_size
    FROM logs GROUP BY container, pod

The fixture is generated deterministically at import (numpy seed 42,
fixtures/gen_logs.py) so the DuckDB oracle can read the same parquet
by absolute path. The AVG query rounds on both sides per the oracle
conventions; the SQL text the engine executes is otherwise identical
to the reference's strings.
"""

from __future__ import annotations

from fixtures.gen_logs import ensure_all, logs_path, sf_of

from datafusion_tpc_spark.registry import query
from datafusion_tpc_spark.session import configure_runtime

ensure_all()


def _logs(spark, sf_dir):
    configure_runtime(spark)
    df = spark.read.parquet(logs_path(sf_of(sf_dir)))
    df.createOrReplaceTempView("logs")
    return df


@query(
    "q_logs_scan",
    oracle=f"SELECT * FROM read_parquet('{logs_path('0.01')}')",
)
def q_logs_scan(spark, sf_dir):
    """reference benches/query.rs:24 — `SELECT * FROM logs`."""
    _logs(spark, sf_dir)
    return spark.sql("SELECT * FROM logs")


@query(
    "q_logs_filter",
    oracle=f"""
    SELECT service, pod FROM read_parquet('{logs_path('0.01')}')
    WHERE request_method = 'DELETE'
    """,
)
def q_logs_filter(spark, sf_dir):
    """reference benches/query.rs:25 — filter + projection."""
    _logs(spark, sf_dir)
    return spark.sql("SELECT service, pod FROM logs WHERE request_method = 'DELETE'")


@query(
    "q_logs_agg",
    oracle=f"""
    SELECT container, pod, ROUND(AVG(response_bytes), 6) AS avg_response_size
    FROM read_parquet('{logs_path('0.01')}')
    GROUP BY container, pod
    """,
)
def q_logs_agg(spark, sf_dir):
    """reference benches/query.rs:26 — the `aggregation` bench."""
    _logs(spark, sf_dir)
    return spark.sql(
        """
        SELECT container, pod, ROUND(AVG(response_bytes), 6) AS avg_response_size
        FROM logs GROUP BY container, pod
        """
    )
