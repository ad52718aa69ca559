"""Dataset split & budget allocation (round 7) — the two assignment
ops every training-data pipeline runs after curation: a leakage-safe
deterministic train/val/test split, and a largest-remainder token
budget apportionment across sources for mixture construction.

Beyond-reference surface (the reference engine has no pipeline layer);
companions to operators/sampling.py (weighted/mixture/IPF draws) and
operators/curation.py (curriculum binning, byte-budget sharding).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query

_TRAIN_PCT = 80
_VAL_PCT = 10  # test gets the remainder


@query(
    "q_pipe_split_content",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, n_chars, lang,
             {_h60_duck("text")} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < {_TRAIN_PCT} THEN 'train'
                WHEN bucket < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM b
    GROUP BY 1
    ORDER BY split ASC NULLS LAST
    """,
)
def q_pipe_split_content(spark, sf_dir):
    """Deterministic leakage-safe train/val/test split (80/10/10):
    unlike q_pipe_split (operators/pipeline.py — id-keyed 90/5/5 row
    assignment), the split key is h60(text) — a CONTENT hash — so
    byte-identical duplicates always land in the same split and an
    eval document can never leak a verbatim copy into train. Reported
    as per-split doc count, char volume, and language coverage.

    Near-duplicate leakage needs the cluster representative as the
    key instead (hash the q_dedup_clusters canonical text — same
    one-line change, shown here content-keyed so the oracle stays a
    single scan). 100 TB: one stateless map per row + a 3-key agg —
    no shuffle beyond the map-side-combined rollup; re-running on an
    appended corpus never reassigns an existing document (hash, not
    ntile/row_number — rank-based splits reshuffle on every append)."""
    b = load_table(spark, sf_dir, "documents").withColumn(
        "bucket", h60(F.col("text")) % 100
    )
    split = (
        F.when(F.col("bucket") < _TRAIN_PCT, "train")
        .when(F.col("bucket") < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        b.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .orderBy(F.col("split").asc_nulls_last())
    )


_BUDGET = 100_000  # chars to allocate across sources


@query(
    "q_pipe_budget",
    oracle=f"""
    WITH src AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_chars) AS total FROM src),
    raw AS (
      SELECT source, n_chars,
             CAST(FLOOR({_BUDGET} * (n_chars * 1.0 / total)) AS BIGINT) AS base,
             {_BUDGET} * (n_chars * 1.0 / total)
               - FLOOR({_BUDGET} * (n_chars * 1.0 / total)) AS frac
      FROM src, tot
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY frac DESC, source ASC) AS rk,
             {_BUDGET} - SUM(base) OVER () AS leftover
      FROM raw
    )
    SELECT source, n_chars,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    ORDER BY source ASC NULLS LAST
    """,
)
def q_pipe_budget(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment of a 100k-char
    training budget across sources: each source gets
    floor(B·share), and the leftover units go to the largest
    fractional parts (source-name tie-break). The allocations sum to
    the budget EXACTLY — the property proportional-rounding by
    ROUND() does not have and the reason every mixture pipeline uses
    largest-remainder or divisor methods.

    Cross-engine determinism: share = n_chars/total is one IEEE
    division, B·share one multiply — bit-identical on both engines —
    and FLOOR/rank comparisons are exact from there. 100 TB: the
    per-source table is |sources| rows (thousands); the window runs
    on that tiny aggregate, never on the corpus."""
    src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("bigint").alias("n_chars"))
    )
    tot = src.agg(F.sum("n_chars").alias("total"))
    raw = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_chars",
        F.floor(_BUDGET * (F.col("n_chars") * 1.0 / F.col("total")))
        .cast("bigint")
        .alias("base"),
        (
            _BUDGET * (F.col("n_chars") * 1.0 / F.col("total"))
            - F.floor(_BUDGET * (F.col("n_chars") * 1.0 / F.col("total")))
        ).alias("frac"),
    )
    w_all = Window.partitionBy()
    ranked = raw.select(
        "source",
        "n_chars",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("frac").desc(), F.col("source").asc()))
        .alias("rk"),
        (F.lit(_BUDGET) - F.sum("base").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_chars",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    ).orderBy(F.col("source").asc_nulls_last())


_TAU = 0.7        # temperature exponent
_WSCALE = 10**9   # weight quantization (integerize after the one pow)


@query(
    "q_pipe_temperature",
    oracle=f"""
    WITH src AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_chars) AS total FROM src),
    wq AS (
      SELECT source, n_chars,
             CAST(ROUND(pow(n_chars * 1.0 / total, CAST({_TAU!r} AS DOUBLE))
                        * {_WSCALE}, 0) AS BIGINT) AS w
      FROM src, tot
    ),
    wt AS (SELECT SUM(w) AS wsum FROM wq),
    alloc AS (
      SELECT source, n_chars, w,
             CAST(({_BUDGET} * w) // wsum AS BIGINT) AS base,
             CAST(({_BUDGET} * w) % wsum AS BIGINT) AS rem
      FROM wq, wt
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk,
             {_BUDGET} - SUM(base) OVER () AS leftover
      FROM alloc
    )
    SELECT source, n_chars,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    ORDER BY source ASC NULLS LAST
    """,
)
def q_pipe_temperature(spark, sf_dir):
    """Temperature-scaled mixture allocation (τ=0.7): budget share
    ∝ (source share)^τ — the standard flattening every multilingual /
    multi-source training mix applies so small sources are not
    swamped (τ=1 is q_pipe_budget's proportional split, τ=0 uniform).

    Determinism: pow() is the ONE libm call; its result is quantized
    to an integer weight (×1e9, ROUND 0dp) immediately, and the whole
    apportionment from there is integer arithmetic — B·w // Σw plus
    largest-remainder on the integer remainders (rem DESC, source
    tie-break), so no float sum order can flip an allocation. Σ alloc
    == B exactly, pytest-pinned alongside the monotone-flattening
    property (temperature allocations sit between proportional and
    uniform). 100 TB: identical shape to q_pipe_budget — the window
    runs on the |sources|-row aggregate."""
    src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("bigint").alias("n_chars"))
    )
    tot = src.agg(F.sum("n_chars").alias("total"))
    wq = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_chars",
        F.round(
            F.pow(F.col("n_chars") * 1.0 / F.col("total"), F.lit(_TAU)) * _WSCALE,
            0,
        )
        .cast("bigint")
        .alias("w"),
    )
    wt = wq.agg(F.sum("w").alias("wsum"))
    alloc = wq.crossJoin(F.broadcast(wt)).select(
        "source",
        "n_chars",
        F.expr(f"CAST(({_BUDGET} * w) DIV wsum AS BIGINT)").alias("base"),
        F.expr(f"CAST(({_BUDGET} * w) % wsum AS BIGINT)").alias("rem"),
    )
    w_all = Window.partitionBy()
    ranked = alloc.select(
        "source",
        "n_chars",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("source").asc()))
        .alias("rk"),
        (F.lit(_BUDGET) - F.sum("base").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_chars",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    ).orderBy(F.col("source").asc_nulls_last())


_CAP = 15  # max docs kept per source


@query(
    "q_pipe_domain_cap",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id ASC
             ) AS rk
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN rk > {_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(CASE WHEN rk <= {_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM r GROUP BY source
    ORDER BY source ASC NULLS LAST
    """,
)
def q_pipe_domain_cap(spark, sf_dir):
    """Per-domain document cap (RefinedWeb/C4-style): keep at most
    _CAP documents per source (the fixture's domain key), ranked
    longest-first with doc_id as the integer tie-break — the
    anti-boilerplate measure that stops one mega-domain from
    dominating the training mix. Reported as a per-source rollup
    (total / kept / dropped / kept char volume).

    Determinism: ranking is pure integers (n_chars DESC, doc_id ASC)
    — no float anywhere. 100 TB: the plan is deliberately TWO
    branches, not one corpus-wide window. The totals branch is a
    map-side-combined groupBy (per-source counters, never row
    shuffle). The kept branch filters rank ≤ K immediately after the
    window, which Spark 3.5+ rewrites to WindowGroupLimit — each map
    task keeps a local top-K heap per source BEFORE the shuffle, so
    the window exchange carries ≤ K rows per (task, source), not the
    corpus (a single unfiltered window that computes the rollup via
    CASE WHEN rk<=K would shuffle EVERY row of a hot domain into one
    reducer — the shape this op exists to avoid). Both branches are
    |sources|-row aggregates at the join (plan-gated in
    tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    totals = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("n_chars").desc(), F.col("doc_id").asc()
        )
    )
    kept = (
        d.withColumn("rk", rk)
        .filter(F.col("rk") <= _CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )
    return (
        totals.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).cast("bigint").alias("n_dropped"),
            "kept_chars",
        )
        .orderBy(F.col("source").asc_nulls_last())
    )
