"""Round-7 operator properties — the invariants that make each new op
what it claims to be, beyond the oracle hash (which
test_queries_oracle.py already enforces for all six).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_prefix_join_matches_quadratic_baseline(spark):
    """q_dedup_prefix must return the EXACT pair set of q_dedup_ngram
    (same threshold, same shingles) — the whole point is identical
    output from a prefix-bounded candidate set."""
    prefix = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in registry.QUERIES["q_dedup_prefix"](spark, SF_DIR).collect()
    }
    ngram = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in registry.QUERIES["q_dedup_ngram"](spark, SF_DIR).collect()
    }
    assert prefix == ngram
    assert prefix  # fixture plants near-dups; empty would be vacuous


def test_prefix_index_is_smaller_than_full_index(spark):
    """The indexed prefix table must be materially smaller than the
    full inverted index — floor(n/2)+1 of n shingles per doc."""
    from datafusion_tpc_spark.functions.shingles import shingle_table

    sh = shingle_table(spark, SF_DIR)
    full = sh.count()
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    prefix_budget = per_doc.agg(
        F.sum(F.expr("n DIV 2") + 1).alias("p")
    ).first().p
    assert prefix_budget < 0.6 * full


def test_split_content_is_exhaustive_and_leak_free(spark):
    """Splits partition the corpus (doc counts sum to |documents|) and
    byte-identical texts never straddle splits."""
    res = {
        r.split: r.n_docs
        for r in registry.QUERIES["q_pipe_split_content"](spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(res.values()) == docs.count()
    assert set(res) == {"train", "val", "test"}
    from datafusion_tpc_spark.functions.digest import h60

    leak = (
        docs.withColumn("bucket", h60(F.col("text")) % 100)
        .withColumn(
            "split",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test"),
        )
        .groupBy(F.md5("text"))
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leak == 0


def test_budget_allocation_sums_exactly(spark):
    """Largest-remainder apportionment: Σ alloc == budget, every
    source allocated within 1 unit of floor(B·share)."""
    rows = registry.QUERIES["q_pipe_budget"](spark, SF_DIR).collect()
    assert sum(r.alloc for r in rows) == 100_000
    total = sum(r.n_chars for r in rows)
    for r in rows:
        base = int(100_000 * (r.n_chars / total))
        assert base <= r.alloc <= base + 1


def test_pq_codes_cover_all_vectors(spark):
    """Every vector gets a code in every subspace: per-subspace
    membership sums to |embeddings|; codes are within 1..K."""
    rows = registry.QUERIES["q_sim_pq"](spark, SF_DIR).collect()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    by_sub = {}
    for r in rows:
        assert 1 <= r.cid <= 4
        assert r.avg_d2 >= 0
        by_sub[r.sub] = by_sub.get(r.sub, 0) + r.n
    assert by_sub == {0: n_vecs, 1: n_vecs}


def test_dq_skew_fields_are_consistent(spark):
    row = registry.QUERIES["q_dq_skew"](spark, SF_DIR).first()
    assert row.bucket_peak_ratio >= 1.0
    assert 0 < row.max_key_share < 1
    assert row.bucket_cv >= 0


def test_dq_drift_is_near_zero_on_random_halves(spark):
    """Even/odd orderkey halves of one distribution: total PSI must
    sit far under the 0.1 'stable' convention."""
    rows = registry.QUERIES["q_dq_drift"](spark, SF_DIR).collect()
    assert len(rows) == 10
    psi = sum(abs(r.psi_contrib) for r in rows)
    assert psi < 0.05


def test_hll_estimate_within_error_bound(spark):
    """HLL p=8 standard error is 1.04/sqrt(256) ≈ 6.5%; pin <10%."""
    row = registry.QUERIES["q_agg_hll"](spark, SF_DIR).first()
    assert row.n_exact > 0
    assert abs(row.hll_est - row.n_exact) / row.n_exact < 0.10


def test_cms_overcounts_only(spark):
    """Count-Min error is one-sided: est >= exact for every probe."""
    rows = registry.QUERIES["q_agg_cms"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0
        assert r.cms_est >= r.exact_cnt


def test_kanon_fields_consistent(spark):
    row = registry.QUERIES["q_dq_kanon"](spark, SF_DIR).first()
    assert 0 <= row.n_below_k <= row.n_groups
    assert 0 <= row.risk_share <= 1
    assert row.rows_at_risk >= row.n_below_k * 0 and (
        row.n_below_k == 0 or row.rows_at_risk >= row.n_below_k
    )


def test_duplicate_registration_raises():
    from datafusion_tpc_spark.registry import query

    with pytest.raises(ValueError, match="duplicate query registration"):
        query("q_dedup_prefix")(lambda spark, sf_dir: None)


def test_near_split_no_candidate_pair_straddles(spark):
    """No MinHash-LSH candidate pair may straddle splits — the
    leakage property q_pipe_near_split exists to guarantee."""
    from datafusion_tpc_spark.operators.dedup import (
        q_dedup_clusters,
        q_dedup_minhash,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clusters = q_dedup_clusters(spark, SF_DIR)
    labeled = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    from datafusion_tpc_spark.functions.digest import h60

    rep = docs.select(
        F.col("doc_id").alias("cluster_id"), (h60("text") % 100).alias("bucket")
    )
    split_of = labeled.join(rep, "cluster_id").select(
        "doc_id",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    pairs = q_dedup_minhash(spark, SF_DIR)
    sa = split_of.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "split", "split_a"
    )
    sb = split_of.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "split", "split_b"
    )
    straddling = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0
    # totals still partition the corpus
    res = {
        r.split: r.n_docs
        for r in __import__("datafusion_tpc_spark.registry", fromlist=["registry"])
        .QUERIES["q_pipe_near_split"](spark, SF_DIR)
        .collect()
    }
    assert sum(res.values()) == docs.count()


def test_dpo_preserves_untouched_partitions(spark):
    """The core dynamic-overwrite property: after the 'F'-only
    restatement, non-F partitions still hold their ORIGINAL rows
    (static overwrite would have deleted them) and F holds exactly
    the adjusted batch."""
    res = {
        r.o_orderstatus: (r.n, r.total)
        for r in registry.QUERIES["q_sink_dpo"](spark, SF_DIR).collect()
    }
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    expected_n = {
        r.o_orderstatus: r.n
        for r in src.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(res) == set(expected_n)
    for status, n in expected_n.items():
        assert res[status][0] == n, status


def test_hll_registers_merge_associatively(spark):
    """The property that makes HLL a DISTRIBUTED sketch: building
    per-source register sets and MAX-merging them must yield exactly
    the registers (hence exactly the estimate) of a direct global
    build — partial aggregation IS sketch merge."""
    from datafusion_tpc_spark.functions.digest import h60
    from datafusion_tpc_spark.operators.sketches_ext import _WBITS

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    hv = o.select(
        "o_orderstatus",
        h60(F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))).alias("hv"),
    ).distinct()
    w = F.col("hv") % F.lit(1 << _WBITS).cast("long")
    regs = hv.select(
        "o_orderstatus",
        F.shiftright("hv", _WBITS).alias("bucket"),
        F.when(w == 0, F.lit(_WBITS + 1))
        .otherwise(F.lit(_WBITS + 1) - F.length(F.bin(w)))
        .alias("rho"),
    )
    per_source = regs.groupBy("o_orderstatus", "bucket").agg(
        F.max("rho").alias("m")
    )
    merged = {
        (r.bucket, r.m)
        for r in per_source.groupBy("bucket").agg(F.max("m").alias("m")).collect()
    }
    direct = {
        (r.bucket, r.m)
        for r in regs.groupBy("bucket").agg(F.max("rho").alias("m")).collect()
    }
    assert merged == direct


def test_temperature_flattens_toward_uniform(spark):
    """τ=0.7 allocations must (a) sum exactly to the budget and
    (b) sit between proportional (τ=1) and uniform: every
    below-average source gains vs its proportional share, every
    above-average source loses."""
    temp = {
        r.source: (r.n_chars, r.alloc)
        for r in registry.QUERIES["q_pipe_temperature"](spark, SF_DIR).collect()
    }
    prop = {
        r.source: r.alloc
        for r in registry.QUERIES["q_pipe_budget"](spark, SF_DIR).collect()
    }
    assert sum(a for _, a in temp.values()) == 100_000
    total_chars = sum(n for n, _ in temp.values())
    mean_share = 1.0 / len(temp)
    for src, (n, alloc) in temp.items():
        share = n / total_chars
        if share < mean_share:
            assert alloc >= prop[src], src
        elif share > mean_share:
            assert alloc <= prop[src], src


def test_semdedup_kept_set_is_tau_independent(spark):
    """SemDeDup invariants: (a) the kept set contains no within-label
    pair at/above the τ=0.3 near-dup threshold (every dup pair lost
    its near-centroid member), and (b) every dropped vector has a
    KEPT-or-dropped beating neighbor above τ — no orphan drops."""
    import numpy as np

    from datafusion_tpc_spark.catalog import load_table

    res = registry.QUERIES["q_dedup_semantic"](spark, SF_DIR).collect()
    assert any(r.dropped for r in res)  # fixture has 111 dup edges
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    by_label = {}
    by_id = {}
    for r in res:
        by_label.setdefault(r.label, []).append(r)
        by_id[r.vec_id] = r
    for rows in by_label.values():
        kept = [r for r in rows if not r.dropped]
        for i, a in enumerate(kept):
            for b in kept[i + 1 :]:
                assert cos(emb[a.vec_id], emb[b.vec_id]) < 0.3, (
                    a.vec_id,
                    b.vec_id,
                )
        for a in rows:
            if not a.dropped:
                continue
            assert any(
                b.vec_id != a.vec_id
                and cos(emb[a.vec_id], emb[b.vec_id]) >= 0.3
                and (b.c2c, b.vec_id) < (a.c2c, a.vec_id)
                for b in rows
            ), a.vec_id


def test_prcurve_cumulative_invariants(spark):
    """PR-curve sanity: as the threshold sweeps down, TP and FP are
    non-decreasing, recall is non-decreasing and ends at 1.0, and
    every precision sits in (0, 1]."""
    rows = (
        registry.QUERIES["q_dq_prcurve"](spark, SF_DIR)
        .orderBy(F.col("threshold").desc())
        .collect()
    )
    assert len(rows) > 10
    last_tp = last_fp = last_rec = 0
    for r in rows:
        assert r.tp >= last_tp and r.fp >= last_fp
        assert r.recall >= last_rec
        assert 0 < r.prec <= 1
        last_tp, last_fp, last_rec = r.tp, r.fp, r.recall
    assert rows[-1].recall == 1.0


def test_lenbucket_powers_of_two_and_fill(spark):
    """Bucket caps must be powers of two; every doc lands in the
    SMALLEST holding cap, so each cap>1 bucket fills past 50%; token
    totals reconcile with a direct count."""
    rows = registry.QUERIES["q_pipe_lenbucket"](spark, SF_DIR).collect()
    from datafusion_tpc_spark.catalog import load_table

    total = (
        load_table(spark, SF_DIR, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.sum_tokens for r in rows) == total
    for r in rows:
        assert r.bucket_cap & (r.bucket_cap - 1) == 0
        if r.bucket_cap > 1:
            assert r.fill_ratio > 0.5, r


def test_cdc_boundaries_resync_after_insertion(spark):
    """The defining CDC property: prepending bytes to a document
    shifts every fixed-window chunk, but content-defined boundaries
    re-synchronize — all chunks after the first boundary are
    identical. Reimplements the 8-gram h60 splitter in Python on one
    fixture doc and asserts the chunk-hash tail survives a 13-char
    prepend. Also reconciles sum_len with total text volume."""
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.operators.cdc import _POLY_M, _POLY_W

    rows = registry.QUERIES["q_pipe_cdc"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    total_chars = docs.select(F.sum(F.length("text"))).collect()[0][0]
    assert sum(r.sum_len for r in rows) == total_chars
    assert any(r.dedup_ratio < 1.0 for r in rows)  # planted dups share chunks

    def chunks(text):
        def gram_hash(s):
            return sum(ord(c) * w for c, w in zip(s, _POLY_W)) % _POLY_M

        ends = sorted(
            {
                i + 8 - 1
                for i in range(1, len(text) - 8 + 2)
                if gram_hash(text[i - 1 : i + 7]) % 64 == 0
            }
            | {len(text)}
        )
        prev, out = 0, []
        for e in ends:
            out.append(text[prev:e])
            prev = e
        return out

    text = docs.orderBy("doc_id").limit(50).collect()[0].text
    base = chunks(text)
    shifted = chunks("INSERTED_PREFIX"[:13] + text)
    assert len(base) > 2, "doc too short for the property to bite"
    # every base chunk after the first boundary reappears verbatim
    assert set(base[1:]) <= set(shifted)


def test_mmr_diversifies_relevance_ranking(spark):
    """MMR invariants: the first pick is the pure-relevance argmax
    (maxsim=0 by definition), ranks are 1..K, and the picked set
    DIFFERS from relevance top-K — the diversity term must actually
    change the ranking on the fixture, else the op is vacuous."""
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.functions.digest import cosine
    from datafusion_tpc_spark.operators.mmr import _K, _QID

    mmr = registry.QUERIES["q_sim_mmr"](spark, SF_DIR).collect()
    assert [r.rank for r in mmr] == list(range(1, _K + 1))
    assert mmr[0].maxsim == 0.0
    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qv = e.filter(F.col("vec_id") == _QID).select(F.col("emb").alias("qe"))
    top = (
        e.filter(F.col("vec_id") != _QID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine(F.col("emb"), F.col("qe")), 6).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_K)
        .collect()
    )
    assert mmr[0].vec_id == top[0].vec_id
    assert {r.vec_id for r in mmr} != {r.vec_id for r in top}


def test_benford_flags_synthetic_prices(spark):
    """Shares must sum to 1 (±rounding), expected shares are the
    Benford constants, and the synthetic uniform price fixture MUST
    violate the law (total chi-square ≫ the 15.5 α=0.05 critical
    value for 8 df) — a passing fixture would make the audit vacuous."""
    rows = registry.QUERIES["q_dq_benford"](spark, SF_DIR).collect()
    assert [r.digit for r in rows] == [str(d) for d in range(1, 10)]
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert abs(rows[0].expected - 0.30103) < 1e-5
    total = sum(r.n for r in rows)
    chi = total * sum(r.chi_contrib for r in rows)
    assert chi > 15.5


def test_holt_degenerate_single_day_is_empty(spark, tmp_path):
    """(r8, ADVICE r7) q_evt_holt needs two daily points to
    initialize the trend (b1 = v2 - v1). On a single-day series the
    DuckDB recursive init (rn=1 x rn=2) emits zero rows; the Spark
    fold must match instead of emitting NULL-trend rows from a
    missing s[1]."""
    import datetime as dt

    rows = [
        (i, "view", dt.datetime(2025, 1, 1, 8, i))  # one calendar day
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "user_id long, event string, ts timestamp")
    sf_dir = str(tmp_path)
    df.write.parquet(sf_dir + "/events.parquet")
    out = registry.QUERIES["q_evt_holt"](spark, sf_dir)
    assert out.count() == 0
