"""Oracle parity for every declared query (driver t2 mirror).

Parametrized over the registry: each query with an oracle is executed
in Spark at SF_DIR and compared to DuckDB on the same parquet; queries
without an oracle get a rows-run smoke check (the driver's weaker
rows-only path)."""

from __future__ import annotations

import pytest

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle

registry.load_all()

ORACLED = sorted(n for n in registry.QUERIES if n in registry.ORACLE)
ROWS_ONLY = sorted(n for n in registry.QUERIES if n not in registry.ORACLE)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, ddb, name):
    # q_logs_* needs no sf skip: both sides read the canonical sf0.01
    # logs fixture regardless of SF_DIR (logs_queries._logs).
    df = registry.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, registry.ORACLE[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    _ = df.schema  # stable schema required by the driver
