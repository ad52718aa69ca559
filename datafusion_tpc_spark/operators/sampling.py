"""Weighted sampling (r5) — beyond-reference LLM-pipeline layer.

operators/pipeline.py covers uniform hash sampling / splits /
stratified sampling (q_pipe_sample*). This module adds the missing
production shape: WEIGHTED sampling without replacement — "sample 100
documents with probability proportional to length" is the standard
way to build token-budget-matched eval slices from a 100 TB corpus.

Algorithm: Efraimidis-Spirakis A-ES. Each row draws u ∈ (0,1] and
gets key u^(1/w); the k largest keys are the sample. We order by the
monotone-equivalent priority = -ln(u)/w ascending (smaller is
better), which avoids pow() underflow for large weights.

Determinism (driver seed=42 convention): u derives from the shared
md5/h60 family (functions/digest.py), so Spark and DuckDB draw THE
SAME uniforms bit-for-bit. int64→double conversion and division are
IEEE-exact on both engines; ln() is libm-dependent, so the priority
is ROUND(…, 6)ed on both sides and ties break on doc_id — the repo's
standard float-boundary discipline.

100 TB design: priority is a zero-shuffle projection; ORDER BY
priority LIMIT k compiles to TakeOrderedAndProject — O(k) heap per
partition, k·P rows to the driver, never a global sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query

_K = 100
_TWO60 = float(1 << 60)


@query(
    "q_pipe_sample_weighted",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id,
             CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
             ROUND(
               -ln(({_h60_duck("concat('ws:', CAST(doc_id AS VARCHAR))")} + 1)
                   / {_TWO60!r})
               / GREATEST(n_chars, 1), 6) AS priority
      FROM documents
    )
    SELECT doc_id, weight, priority
    FROM pri
    ORDER BY priority ASC NULLS LAST, doc_id ASC NULLS LAST
    LIMIT {_K}
    """,
)
def q_pipe_sample_weighted(spark, sf_dir):
    """Length-weighted sample of documents, k=100, without
    replacement (Efraimidis-Spirakis): u = (h60(doc_id)+1)/2^60,
    priority = -ln(u)/weight, keep the k smallest priorities.
    Deterministic across engines via the md5-derived uniform; the
    plan is projection → TakeOrderedAndProject (no shuffle, no global
    sort)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    u = (h60(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) + 1) / F.lit(
        _TWO60
    )
    return (
        docs.select(
            "doc_id",
            w.cast("bigint").alias("weight"),
            F.round(-F.log(u) / w, 6).alias("priority"),
        )
        .orderBy(
            F.col("priority").asc_nulls_last(), F.col("doc_id").asc_nulls_last()
        )
        .limit(_K)
    )


_MIX = {"en": 80, "de": 30, "es": 30, "fr": 30, "zh": 30}


def _mix_case_duck() -> str:
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX.items())
        + " ELSE 0 END"
    )


@query(
    "q_pipe_mixture",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_h60_duck("concat('mix:', CAST(doc_id AS VARCHAR))")} ASC,
                        doc_id ASC) AS BIGINT) AS rk,
             {_mix_case_duck()} AS quota
      FROM documents
    )
    SELECT doc_id, lang, rk
    FROM ranked
    WHERE rk <= quota
    """,
)
def q_pipe_mixture(spark, sf_dir):
    """Corpus mixture rebalancing (the data-mixing / DoReMi shape):
    sample each language to a TARGET budget — en:80 de:30 es:30 fr:30
    zh:30 out of a skewed 218/70/73/64/75 input — by ranking docs
    within each language on the deterministic h60 uniform and keeping
    rank <= quota. One lang-partitioned window pass; selection is
    uniform-without-replacement per stratum and bit-reproducible.

    100 TB: rank-within-stratum funnels each language through one
    reducer — the scale twin pre-filters with a hash THRESHOLD
    (h60 < quota/stratum_count × 2^60, no sort, no single reducer,
    same distribution) and only rank-trims the ~exact boundary; the
    serving schema is identical. q_pipe_sample documents the
    threshold primitive."""
    docs = load_table(spark, sf_dir, "documents")
    expr = None
    for k, v in _MIX.items():
        expr = (
            F.when(F.col("lang") == k, v)
            if expr is None
            else expr.when(F.col("lang") == k, v)
        )
    quota = expr.otherwise(0)
    w = Window.partitionBy("lang").orderBy(
        h60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))).asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("bigint").alias("rk"),
            quota.alias("quota"),
        )
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang", "rk")
    )


def _duck_ipf_iter(n: int, prev: str) -> str:
    """One IPF iteration = row scaling to the lang target, then
    column scaling to the source target; weights re-rounded to 6dp
    after each scaling so both engines stay in lockstep."""
    return f"""
    r{n} AS (
      SELECT lang, source, cnt,
             ROUND(w * t_lang / SUM(w) OVER (PARTITION BY lang), 6) AS w,
             t_lang, t_src
      FROM {prev}
    ),
    i{n} AS (
      SELECT lang, source, cnt,
             ROUND(w * t_src / SUM(w) OVER (PARTITION BY source), 6) AS w,
             t_lang, t_src
      FROM r{n}
    )"""


@query(
    "q_pipe_ipf",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY lang, source
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
      FROM cells
    ),
    w0 AS (
      SELECT lang, source, cnt, CAST(cnt AS DOUBLE) AS w,
             n * 1.0 / nl AS t_lang, n * 1.0 / ns AS t_src
      FROM cells, tot
    ),
    {_duck_ipf_iter(1, "w0")},
    {_duck_ipf_iter(2, "i1")}
    SELECT lang, source, cnt, w AS weight
    FROM i2
    """,
)
def q_pipe_ipf(spark, sf_dir):
    """Iterative proportional fitting (raking) — balance the corpus
    weight matrix to TWO marginal targets at once (uniform language
    AND uniform source shares), the survey-statistics algorithm
    behind 2-D dataset mixing where q_pipe_mixture's single-stratum
    quotas don't compose. Two IPF iterations, each = scale rows to
    the lang target then columns to the source target via window
    sums over the |langs|·|sources| cell table.

    Determinism: all scaling arithmetic is IEEE +,*,/ (exact
    cross-engine); group sums could differ in summation order, so
    weights are ROUND(…, 6)ed after every scaling — both engines
    enter each step with identical doubles (the q_sim_kmeans
    choreography). 100 TB: one corpus-sized count agg; everything
    after is cell-table-sized (|langs|·|sources| rows) regardless of
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # marginal targets DERIVED from the data (n/|langs|, n/|sources|)
    # rather than hardcoded cardinalities — a testdata drop with more
    # strata keeps the stated uniform-marginal semantics (review r5).
    tot = cells.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("nl"),
        F.countDistinct("source").cast("bigint").alias("ns"),
    )
    w = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "cnt",
            F.col("cnt").cast("double").alias("w"),
            (F.col("n") * 1.0 / F.col("nl")).alias("t_lang"),
            (F.col("n") * 1.0 / F.col("ns")).alias("t_src"),
        )
    )
    w = ipf_scale(w, rounds=2)
    return w.select("lang", "source", "cnt", F.col("w").alias("weight"))


def ipf_scale(w, rounds: int = 2):
    """The IPF double-scaling fold over a (lang, source, w, t_lang,
    t_src) cell frame: each round scales rows to the lang target then
    columns to the source target, re-ROUNDing weights to 6dp after
    every scaling so both engines (and the pure-Python reference in
    tests/test_property_fuzz.py — r11, VERDICT r10 item 6) step from
    identical doubles. Module-level so the fuzz drives the EXACT
    production fold."""
    for _ in range(rounds):
        w = w.withColumn(
            "w",
            F.round(
                F.col("w")
                * F.col("t_lang")
                / F.sum("w").over(Window.partitionBy("lang")),
                6,
            ),
        ).withColumn(
            "w",
            F.round(
                F.col("w")
                * F.col("t_src")
                / F.sum("w").over(Window.partitionBy("source")),
                6,
            ),
        )
    return w


_DP_EPS = 0.5


@query(
    "q_agg_dp",
    oracle=f"""
    WITH agg AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM customer GROUP BY c_mktsegment
    ),
    noised AS (
      SELECT c_mktsegment, n_true,
             ({_h60_duck("concat('dp:', c_mktsegment)")} + 1) / {float(1 << 60)!r} - 0.5 AS u
      FROM agg
    )
    SELECT c_mktsegment,
           n_true,
           ROUND(n_true - (1.0 / {_DP_EPS}) *
                 CASE WHEN u >= 0 THEN 1.0 ELSE -1.0 END *
                 ln(1.0 - 2.0 * ABS(u)), 6) AS n_released
    FROM noised
    """,
)
def q_agg_dp(spark, sf_dir):
    """Differentially-private count release (Laplace mechanism,
    ε=0.5, sensitivity 1 for a per-segment count): the privacy layer
    a data-release pipeline applies before publishing corpus
    statistics. Noise is Laplace(1/ε) drawn by INVERSE CDF from the
    md5/h60 uniform — deterministic under the driver seed convention,
    so the released values carry an EXACT oracle (a production
    deployment swaps the h60 uniform for a secret-seeded PRNG; the
    plan is identical). Per-group noise is one row-local expression
    over the aggregated (group-bound) table — zero extra passes.
    ln() is transcendental → ROUND(…, 6) per repo convention."""
    cust = load_table(spark, sf_dir, "customer")
    agg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    u = (
        h60(F.concat(F.lit("dp:"), F.col("c_mktsegment"))) + 1
    ) / F.lit(float(1 << 60)) - 0.5
    noise = (
        (1.0 / _DP_EPS)
        * F.when(u >= 0, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u))
    )
    return agg.select(
        "c_mktsegment",
        "n_true",
        F.round(F.col("n_true") - noise, 6).alias("n_released"),
    )
