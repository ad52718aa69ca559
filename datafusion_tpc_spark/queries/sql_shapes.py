"""Advanced SQL shapes newly expressible in Spark 4 (r5): recursive
CTEs and correlated LATERAL joins — two surfaces DataFusion 19's
sqlparser 0.30 accepts but no prior query here exercised, and that
Spark only gained natively in the 4.x line (WITH RECURSIVE: Spark
4.0; lateral correlated subquery joins: 3.2+ with LIMIT support
maturing in 4.x).

Registered after the round-5 driver window; birth rounds pinned in
tests/test_registry_order.py.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table, register_tables
from datafusion_tpc_spark.registry import query

# Month spine via recursion, then gap-filled per-month order counts —
# the canonical time-series densification shape (months with zero
# orders MUST appear, which a plain GROUP BY cannot produce).
_RECURSIVE_SPARK = """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-07-01'
    ),
    per_month AS (
      SELECT date_trunc('month', o_orderdate) AS m2,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders
      GROUP BY 1
    )
    SELECT m AS month_start,
           CAST(COALESCE(c, 0) AS BIGINT) AS n_orders
    FROM months
    LEFT JOIN per_month ON m2 = m
    ORDER BY month_start NULLS LAST
"""

# DuckDB dialect delta: date_trunc on TIMESTAMP yields DATE-like
# values at day granularity (verify SKILL gotcha) — cast explicitly.
_RECURSIVE_DUCK = """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-07-01'
    )
    SELECT m AS month_start,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM months
    LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
    GROUP BY m
    ORDER BY month_start NULLS LAST
"""


@query("q_cte_recursive", oracle=_RECURSIVE_DUCK)
def q_cte_recursive(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): build a 79-month date
    spine by recursion, then gap-fill per-month order counts —
    zero-order months survive, which is the whole point of
    spine-based densification.

    Scale: the recursion generates O(spine) rows, never fact rows —
    depth is bounded by the date range, not data volume. The Spark
    side pre-aggregates orders per month BEFORE joining the spine, so
    the join input is |months| pre-combined rows instead of raw facts.
    Measured cost note (sf0.1): Spark's UnionLoopExec pays ~12 ms per
    recursion ITERATION (79 iterations ≈ 0.7 s regardless of row
    width), so WITH RECURSIVE is for genuinely iterative logic
    (hierarchies, fixpoints); a production date spine uses
    sequence(start, stop, interval) + explode — one codegen stage,
    no loop. This query exists to exercise the recursive operator
    itself. The oracle keeps the naive join-then-count formulation
    as the semantic spec — same result by construction."""
    register_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPARK)


_LATERAL_SQL = """
    SELECT n.n_name, l.s_name, ROUND(l.s_acctbal, 2) AS acctbal
    FROM nation n
    JOIN LATERAL (
      SELECT s_name, s_acctbal
      FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name ASC
      LIMIT 2
    ) l
    ORDER BY n_name NULLS LAST, acctbal DESC NULLS LAST, s_name NULLS LAST
"""


@query(
    "q_join_lateral",
    oracle="""
    SELECT n.n_name, l.s_name, ROUND(l.s_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT s_name, s_acctbal
      FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name ASC
      LIMIT 2
    ) l
    ORDER BY n_name NULLS LAST, acctbal DESC NULLS LAST, s_name NULLS LAST
    """,
)
def q_join_lateral(spark, sf_dir):
    """Correlated LATERAL join with per-row ORDER BY + LIMIT: top-2
    suppliers by account balance FOR EACH nation — the
    top-N-per-group shape in its SQL-standard lateral form (the
    DataFrame twin is q_topk_group's WindowGroupLimit). Ties break on
    name so both engines agree exactly. Catalyst decorrelates the
    lateral subquery into a ranked window join — same physical shape
    as the explicit window formulation, arrived at from standard
    SQL.

    Scale: decorrelation means the supplier side is scanned ONCE and
    windowed per nation key — not re-executed per outer row as naive
    lateral semantics would suggest."""
    register_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k, o_totalprice
      FROM orders
    ),
    b AS (
      SELECT DISTINCT NULLIF(o_orderpriority, '3-MEDIUM') AS k
      FROM orders
    )
    SELECT COALESCE(a.k, '<null>') AS key,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(a.o_totalprice), 2) AS total
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    ORDER BY key NULLS LAST
    """,
)
def q_join_nullsafe(spark, sf_dir):
    """Null-safe equi-join (`<=>` ↔ `IS NOT DISTINCT FROM`): NULL
    keys MATCH each other instead of vanishing — the semantic
    variant a plain equi-join cannot express (a.k = b.k drops every
    NULL row; here the NULLIF'd '3-MEDIUM' population survives the
    join and lands in the '<null>' bucket). Both engines treat
    null-safe equality as a hashable join key, so this plans as a
    regular hash/sort-merge join, not a nested loop — the property
    that keeps it usable on skewed nullable keys at scale.

    Scale: identical to any equi-join — <=> participates in hash
    partitioning (NULL hashes like a value), so co-partitioning and
    AQE skew handling apply unchanged."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("k"),
        "o_totalprice",
    )
    b = a.select("k").distinct().select(F.col("k").alias("bk"))
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("bk")))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("k"), F.lit("<null>")).alias("key"), "n", "total"
        )
        .orderBy(F.col("key").asc_nulls_last())
    )


@query(
    "q_union_evo",
    oracle="""
    SELECT doc_id, 'v1' AS src_branch, text, lang,
           CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars
    FROM documents
    UNION ALL
    SELECT doc_id, 'v2' AS src_branch, text, CAST(NULL AS VARCHAR) AS lang,
           source, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id ASC NULLS LAST, src_branch ASC NULLS LAST
    """,
)
def q_union_evo(spark, sf_dir):
    """Schema-evolution union: two snapshots of the same feed whose
    schemas drifted (v1 carries `lang`, v2 replaced it with `source`
    + `n_chars`) combined with unionByName(allowMissingColumns=True)
    — each branch's missing columns null-padded by NAME, not by
    position. This is the ingestion-reality operator positional UNION
    cannot express safely: reordered or added columns silently
    corrupt positional unions, while by-name resolution is stable
    under evolution. The oracle states the same semantics as explicit
    NULL-padded branches.

    Scale: pure row-local concatenation — no shuffle (the ORDER BY
    is the driver-comparison convention, dropped in production);
    at 100 TB this is how heterogeneous parquet generations of one
    dataset read as one table (the file-level twin is
    mergeSchema=true on the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.lit("v1").alias("src_branch"), "text", "lang")
    v2 = docs.select(
        "doc_id",
        F.lit("v2").alias("src_branch"),
        "text",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    return (
        v1.unionByName(v2, allowMissingColumns=True)
        .orderBy(F.col("doc_id").asc_nulls_last(), F.col("src_branch").asc_nulls_last())
    )


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_price,
             ROUND(SUM(l_discount), 2) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM wide
    ORDER BY l_returnflag ASC NULLS LAST, measure ASC NULLS LAST
    """,
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT / melt — the inverse of q_pivot: a wide per-flag
    3-measure aggregate reshaped to long (flag, measure, value) rows
    via DataFrame.unpivot (Spark 3.4+ native melt; physically an
    Expand — the same operator PIVOT's distinct-agg path and grouping
    sets use, stated from the reshape direction). The oracle is the
    portable UNION-ALL-per-measure form, which is exactly what Expand
    evaluates in one pass without re-reading the input.

    Scale: one aggregation shuffle for the wide form; the reshape
    itself is row-local (3× row expansion of a |flags|-row input)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return (
        wide.unpivot(
            ["l_returnflag"],
            ["sum_qty", "sum_price", "sum_disc"],
            "measure",
            "value",
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last(), F.col("measure").asc_nulls_last())
    )


_FUZZY_PROBES = (
    "Suplier#000000007",    # dropped char
    "Supplier#00000023",    # dropped zero
    "supplier#000000042",   # case damage
    "Supplier#0000000XX",   # corrupted tail
    "Suppli3r#000000099",   # substituted char
)


@query(
    "q_join_fuzzy",
    oracle=f"""
    WITH probes(probe) AS (
      VALUES {", ".join(f"('{p}')" for p in _FUZZY_PROBES)}
    ),
    scored AS (
      SELECT p.probe, s.s_name, s.s_suppkey,
             CAST(levenshtein(p.probe, s.s_name) AS INT) AS dist,
             ROW_NUMBER() OVER (
               PARTITION BY p.probe
               ORDER BY levenshtein(p.probe, s.s_name) ASC, s.s_suppkey ASC
             ) AS rn
      FROM probes p CROSS JOIN supplier s
    )
    SELECT probe, s_name AS best_match, s_suppkey, dist
    FROM scored WHERE rn = 1
    ORDER BY probe ASC NULLS LAST
    """,
)
def q_join_fuzzy(spark, sf_dir):
    """Fuzzy-match join (entity resolution): damaged supplier names
    resolved to their closest catalog entry by Levenshtein edit
    distance — broadcast the probe list across the dimension, score
    every pair, keep the per-probe argmin (ROW_NUMBER over (dist,
    key) so ties resolve deterministically). Both engines implement
    classic unweighted edit distance, so scores are integer-identical
    and the argmin cannot drift.

    Scale: probes broadcast (the tiny side of a nested-loop score);
    cost is |probes| × |dim| distance evaluations inside codegen —
    the honest shape below ~millions of pairs. Past that, entity
    resolution moves to the blocking patterns this repo already
    carries: n-gram/MinHash candidate generation (q_dedup_minhash)
    before exact scoring, exactly like the LSH-then-verify dedup
    path."""
    s = load_table(spark, sf_dir, "supplier")
    # JVM-side literal VALUES — createDataFrame would route 5 rows
    # through a Python RDD scan (~0.4 s of pure overhead per action)
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _FUZZY_PROBES])).alias("probe")
    )
    from pyspark.sql.window import Window

    dist = F.levenshtein(F.col("probe"), F.col("s_name"))
    w = Window.partitionBy("probe").orderBy(
        dist.asc(), F.col("s_suppkey").asc()
    )
    return (
        F.broadcast(probes)
        .crossJoin(s)
        .select(
            "probe",
            "s_name",
            "s_suppkey",
            dist.cast("int").alias("dist"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "probe",
            F.col("s_name").alias("best_match"),
            "s_suppkey",
            "dist",
        )
        .orderBy(F.col("probe").asc_nulls_last())
    )


def _order_windows(spark, sf_dir):
    """Per-order shipping window (ck, ok, lo, hi) — shared by the
    overlap joins. r16 (guide §2.3 "aggregate before you shuffle"):
    the original joined 6M lineitem rows to orders FIRST and then
    aggregated on the composite (custkey, orderkey); since orderkey
    functionally determines custkey, aggregating lineitem by
    l_orderkey alone (6M → 1.5M rows, single-int key) and broadcast-
    attaching o_custkey AFTER is the same relation — measured ~25-30%
    off the whole overlap query, rows bit-identical. Join-after-agg
    and join-before-agg commute here because the join key is the
    group key and orders is unique per key; an l_orderkey absent
    from orders drops in the inner join either way."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Size-gated explicit broadcast (ADVICE r16): the no-SortMergeJoin
    # plan pin previously leaned on the planner's size estimate alone,
    # so a stats change could silently flip this attach join to SMJ.
    # The hint makes the pinned shape deterministic where orders is
    # verifiably small; past the gate (big-SF corpora) the hint drops
    # and the join correctly shuffles both sides on the order key
    # (the prefix_join docs_small precedent).
    try:
        orders_small = (
            os.path.getsize(os.path.join(sf_dir, "orders.parquet")) < 1 << 30
        )
    except OSError:
        orders_small = False
    if orders_small:
        o = F.broadcast(o)
    per_ok = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    )
    return per_ok.join(o, per_ok.ok == o.o_orderkey).select(
        F.col("o_custkey").alias("ck"), "ok", "lo", "hi"
    )


@query(
    "q_join_overlap",
    oracle="""
    WITH w AS (
      SELECT o.o_custkey AS ck, l.l_orderkey AS ok,
             MIN(l.l_shipdate) AS lo, MAX(l.l_shipdate) AS hi
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, l.l_orderkey
    )
    SELECT a.ck AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(MAX(datediff('day', greatest(a.lo, b.lo),
                             least(a.hi, b.hi))) AS INT) AS max_overlap_days
    FROM w a
    JOIN w b ON a.ck = b.ck AND a.ok < b.ok
            AND a.lo <= b.hi AND b.lo <= a.hi
    GROUP BY a.ck
    ORDER BY custkey ASC NULLS LAST
    """,
)
def q_join_overlap(spark, sf_dir):
    """Interval-overlap self-join: per customer, how many pairs of
    their orders had overlapping shipping windows, and the longest
    overlap — the classic temporal-join shape (equi-key + symmetric
    interval predicate + ok<ok dedup) that rounds out the temporal
    family next to as-of (q_asof_join) and range (q_range_join)
    joins. Overlap length is integer day arithmetic on timestamps.

    Scale: the window table aggregates once per (customer, order);
    the self-join is EQUI on custkey — Catalyst plans a hash join
    with the interval conditions as residual, so cost is
    Σ per-customer orders², bounded by per-key fan-out (~10 orders
    per customer at any SF), never a global cross product. The plan
    gate family's no-cartesian check covers it."""
    w = _order_windows(spark, sf_dir)
    a = w.alias("a")
    b = w.alias("b")
    overlap_days = F.datediff(
        F.least(F.col("a.hi"), F.col("b.hi")),
        F.greatest(F.col("a.lo"), F.col("b.lo")),
    )
    return (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.ok") < F.col("b.ok"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .groupBy(F.col("a.ck").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlapping_pairs"),
            F.max(overlap_days).cast("int").alias("max_overlap_days"),
        )
        .orderBy(F.col("custkey").asc_nulls_last())
    )


@query(
    "q_join_overlap_banded",
    oracle="""
    WITH w AS (
      SELECT o.o_custkey AS ck, l.l_orderkey AS ok,
             MIN(l.l_shipdate) AS lo, MAX(l.l_shipdate) AS hi
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, l.l_orderkey
    )
    SELECT a.ck AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs,
           CAST(MAX(datediff('day', greatest(a.lo, b.lo),
                             least(a.hi, b.hi))) AS INT) AS max_overlap_days
    FROM w a
    JOIN w b ON a.ck = b.ck AND a.ok < b.ok
            AND a.lo <= b.hi AND b.lo <= a.hi
    GROUP BY a.ck
    ORDER BY custkey ASC NULLS LAST
    """,
)
def q_join_overlap_banded(spark, sf_dir):
    """Time-BANDED interval-overlap join — the scale path for the
    case q_join_overlap's per-key fan-out bound breaks down (one key
    with millions of intervals): explode each interval into the
    2048-day buckets it spans, equi-join on (key, bucket) — so the
    join key now includes TIME and a hot key's intervals only meet
    within a band — verify the true overlap predicate as residual,
    and DISTINCT away pairs that met in several buckets.

    SIZING RULE (the real lesson of banded joins, measured here):
    bucket width must be on the order of the TYPICAL interval width.
    This fixture's shipping windows average 1,344 days; naive 30-day
    buckets exploded every interval into ~46 bands (6.7M banded rows,
    ~46x candidate multiplicity, 5.9 s at sf0.1), while 2048-day
    buckets (~1.7 bands/interval) restore near-direct cost and keep
    the hot-key time-partitioning property.

    Same oracle as q_join_overlap on purpose: two physical
    strategies, one semantics — the hash must match the direct
    self-join bit-for-bit, which pins the banding as lossless
    (every overlapping pair shares at least the bucket containing
    max(a.lo, b.lo), and non-overlapping same-bucket candidates die
    on the residual). 100 TB: join-key cardinality = keys × active
    buckets; per-band cost is bounded by intervals-per-band², the
    classic partition-by-time interval join."""
    w = _order_windows(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    banded = w.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col("lo"), epoch) / 2048),
                F.floor(F.datediff(F.col("hi"), epoch) / 2048),
            )
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.ok") < F.col("b.ok"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .select(
            F.col("a.ck").alias("custkey"),
            F.col("a.ok").alias("ok_a"),
            F.col("b.ok").alias("ok_b"),
            F.datediff(
                F.least(F.col("a.hi"), F.col("b.hi")),
                F.greatest(F.col("a.lo"), F.col("b.lo")),
            ).alias("overlap_days"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlapping_pairs"),
            F.max("overlap_days").cast("int").alias("max_overlap_days"),
        )
        .orderBy(F.col("custkey").asc_nulls_last())
    )
