"""Degenerate-document regressions (r11 sweep findings).

tools/degenerate_sweep.py runs ALL queries against the fixture; this
suite pins the previously-crashing subset so the four latent ANSI
crashes (shingle bracket indexing; stats/compress/readability ratio
divisions) cannot return, and checks the guarded values are the
documented NULL/truncated-shingle semantics on both engines.
"""

from __future__ import annotations

import duckdb
import pytest

from fixtures.degenerate import ensure_degenerate_fixture

from datafusion_tpc_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def deg_dir():
    return ensure_degenerate_fixture()


# The r11 crash set plus the SHINGLES consumers most exposed to short
# docs. Running all 295 lives in tools/degenerate_sweep.py (too slow
# for the suite); this subset re-runs in seconds.
_REGRESSION_SET = [
    "q_text_stats",
    "q_text_compress",
    "q_text_readability",
    "q_text_fingerprint",
    "q_dedup_winnow",
    "q_dedup_winnow_pairs",
    "q_dedup_substr",
    "q_dedup_substr_maximal",
    "q_dedup_ngram",
    "q_dedup_minhash",
    # served legs: the probe docs are absent from the fixture (ids
    # 0-7 + 999xxx) — empty probe key set must yield empty, not throw
    "q_dedup_lsh_served",
    "q_dedup_lsh_served_batch",
]


@pytest.mark.parametrize("name", _REGRESSION_SET)
def test_degenerate_docs_do_not_throw(spark, deg_dir, name):
    rows = registry.QUERIES[name](spark, deg_dir).collect()
    assert rows is not None  # executing without throwing IS the test


def test_degenerate_guards_match_oracle(spark, deg_dir):
    """The NULLIF guards must produce the SAME values as the oracle on
    the degenerate fixture — not just avoid the crash (empty doc →
    NULL punct_ratio; zero-word language → NULL syls_per_word/flesch)."""
    from tests.conftest import assert_matches_oracle

    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{deg_dir}/{t}.parquet')"
        )
    # q_dedup_substr/spans/decontam: the fixture's 20- and 31-char
    # docs sit in the [L-S+1, L-1] band where the Spark/Duck strided
    # window generators diverged in r11 (ADVICE — DuckDB // truncates
    # toward zero); oracle parity HERE is what pins that fix.
    for name in (
        "q_text_stats",
        "q_text_readability",
        "q_dedup_substr",
        "q_dedup_spans",
        "q_dedup_decontam",
        "q_dedup_substr_maximal",
    ):
        df = registry.QUERIES[name](spark, deg_dir)
        assert_matches_oracle(df, con, registry.ORACLE[name], name)
    # and the guarded NULLs actually appear (the guard is exercised)
    stats = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_text_stats"](spark, deg_dir).collect()
    }
    assert stats[999003]["punct_ratio"] is None
    read = {
        r["lang"]: r
        for r in registry.QUERIES["q_text_readability"](
            spark, deg_dir
        ).collect()
    }
    assert read["xx"]["flesch"] is None and read["xx"]["syls_per_word"] is None
    assert read["en"]["flesch"] is not None
