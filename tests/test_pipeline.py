"""Semantic checks for the training-data pipeline curation operators
(operators/pipeline.py) — beyond the oracle parity that
test_queries_oracle.py already runs for every registered query, these
pin the *meaning*: sampling determinism and rates, split soundness,
filter rule precedence, ranking invariants, redaction completeness,
canonical-selection uniqueness.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from datafusion_tpc_spark.operators import pipeline as P
from tests.conftest import SF_DIR


def test_sample_deterministic_and_rate(spark):
    a = sorted(r.doc_id for r in P.q_pipe_sample(spark, SF_DIR).collect())
    b = sorted(r.doc_id for r in P.q_pipe_sample(spark, SF_DIR).collect())
    assert a == b  # same membership on every run — no RNG state
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert 0.04 <= len(a) / n <= 0.18  # ~10% ± binomial noise at n=500


def test_split_disjoint_exhaustive(spark):
    rows = P.q_pipe_split(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n  # every doc assigned exactly once
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        counts[r.split] += 1
    assert counts["train"] / n > 0.8  # ~90/5/5
    assert counts["val"] > 0 and counts["test"] > 0


def test_stratified_downsamples_dominant_lang(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.lang: r.n
        for r in P.q_pipe_sample_stratified(spark, SF_DIR)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    en_rate = kept.get("en", 0) / base["en"]
    other_rate = sum(v for k, v in kept.items() if k != "en") / sum(
        v for k, v in base.items() if k != "en"
    )
    assert en_rate < other_rate  # 10% vs 40% by construction


def test_quality_filter_rule_precedence(spark):
    rows = P.q_pipe_quality_filter(spark, SF_DIR).collect()
    verdicts = {r.verdict for r in rows}
    assert verdicts <= {"too_short", "too_long", "word_len", "repetitive", "pass"}
    assert "pass" in verdicts and len(verdicts) >= 3  # thresholds exercise branches
    for r in rows:
        if r.n_words < 20:
            assert r.verdict == "too_short"  # first rule wins
        elif r.verdict == "pass":
            assert 20 <= r.n_words <= 80
            assert 4.8 <= r.awl <= 6.0
            assert r.diversity >= 0.35


def test_tfidf_top3_terms_come_from_doc(spark):
    rows = P.q_pipe_tfidf(spark, SF_DIR).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.rn <= 3
        per_doc.setdefault(r.doc_id, []).append(r)
    texts = {
        r.doc_id: set(r.text.split(" "))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for doc_id, rs in per_doc.items():
        assert len(rs) <= 3
        for r in rs:
            assert r.term in texts[doc_id]


def test_bm25_ranking_invariants(spark):
    rows = P.q_pipe_bm25(spark, SF_DIR).collect()
    assert len(rows) == 20
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    texts = {
        r.doc_id: set(r.text.split(" "))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in rows:  # a scored doc must contain a query term
        assert texts[r.doc_id] & set(P._BM25_TERMS)


def test_pii_redaction_is_complete(spark):
    rows = P.q_pipe_pii_redact(spark, SF_DIR).collect()
    email, phone = re.compile(P._EMAIL_RE), re.compile(P._PHONE_RE)
    for r in rows:
        assert not email.search(r.redacted), r.redacted
        assert not phone.search(r.redacted), r.redacted
        assert r.n_emails >= 1 and r.n_phones >= 1  # synthetic PII present
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted


def test_contamination_hits_bounded_by_eval_set(spark):
    rows = P.q_pipe_contamination(spark, SF_DIR).collect()
    assert rows  # top-corpus shingles must hit some docs
    for r in rows:
        assert 1 <= r.n_eval_hits <= 5  # ≤ |eval set| (distinct shingles/doc)


def test_canonical_one_per_cluster(spark):
    rows = P.q_pipe_canonical(spark, SF_DIR).collect()
    clusters = [r.cluster_id for r in rows]
    assert len(clusters) == len(set(clusters))  # exactly one winner each
    assert all(r.n_members >= 2 for r in rows)  # clusters come from pairs
    members = P.q_dedup_clusters(spark, SF_DIR).collect()
    by_cluster: dict[int, set] = {}
    for m in members:
        by_cluster.setdefault(m.cluster_id, set()).add(m.doc_id)
    for r in rows:
        assert r.canonical_doc_id in by_cluster[r.cluster_id]


def test_kept_corpus_composition(spark):
    """q_pipe_kept = quality-pass ∩ not-a-duplicate-loser, with a
    valid split for every survivor."""
    kept = {r.doc_id: r.split for r in P.q_pipe_kept(spark, SF_DIR).collect()}
    assert kept and set(kept.values()) <= {"train", "val", "test"}
    quality = {
        r.doc_id: r.verdict for r in P.q_pipe_quality_filter(spark, SF_DIR).collect()
    }
    canon = {r.canonical_doc_id for r in P.q_pipe_canonical(spark, SF_DIR).collect()}
    clustered = {r.doc_id for r in P.q_dedup_clusters(spark, SF_DIR).collect()}
    losers = clustered - canon
    for doc_id in kept:
        assert quality[doc_id] == "pass"
        assert doc_id not in losers
    # and no pass-quality non-loser is missing
    expected = {d for d, v in quality.items() if v == "pass"} - losers
    assert set(kept) == expected
