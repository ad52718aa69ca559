"""Invariants for the chunking/packing/repetition ops
(operators/chunking.py). q_pipe_chunk and q_pipe_rep also carry exact
DuckDB oracles (tests/test_queries_oracle.py); q_pipe_pack is
rows-only (†) — greedy packing has no SQL twin — so its contract is
pinned here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark import registry
from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.operators.chunking import CHUNK_SIZE, CHUNK_STRIDE, PACK_CAPACITY
from tests.conftest import SF_DIR

registry.load_all()


def test_chunk_covers_every_document(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    chunks = registry.QUERIES["q_pipe_chunk"](spark, SF_DIR)
    per_doc = {
        r["doc_id"]: r
        for r in chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_start").alias("last_start"),
            F.max(F.length("chunk_text")).alias("max_len"),
        )
        .collect()
    }
    for d in docs.collect():
        row = per_doc[d["doc_id"]]
        n = len(d["text"])
        # every char is inside some chunk: last start + size reaches the end
        assert row["last_start"] + CHUNK_SIZE >= n, d["doc_id"]
        assert row["max_len"] <= CHUNK_SIZE
        # chunk count matches the stride arithmetic
        expected = max(1, (max(n - 1, 0)) // CHUNK_STRIDE + 1)
        assert row["n_chunks"] == expected, (d["doc_id"], n)


def test_chunk_overlap_is_consistent(spark):
    """Consecutive chunks of one doc overlap by size-stride chars:
    chunk k's tail equals chunk k+1's head wherever both are full."""
    chunks = (
        registry.QUERIES["q_pipe_chunk"](spark, SF_DIR)
        .filter(F.col("doc_id") == 1)
        .orderBy("chunk_id")
        .collect()
    )
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    for prev, cur in zip(chunks, chunks[1:]):
        if len(prev["chunk_text"]) == CHUNK_SIZE:
            assert prev["chunk_text"][CHUNK_STRIDE:] == cur["chunk_text"][:overlap]


def test_pack_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    packed = registry.QUERIES["q_pipe_pack"](spark, SF_DIR)
    rows = packed.collect()
    # every doc packed exactly once
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    # no pack exceeds capacity unless it is a single oversized doc
    by_pack: dict[int, list] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pack_id, members in by_pack.items():
        total = sum(r["n_chars"] for r in members)
        if total > PACK_CAPACITY:
            assert len(members) == 1, pack_id
        # pack_pos is a clean 0..k-1 sequence
        assert sorted(r["pack_pos"] for r in members) == list(range(len(members)))
        # pack_fill of the last member equals the pack total
        assert max(r["pack_fill"] for r in members) == total


def test_pack_is_deterministic(spark):
    a = {
        (r["doc_id"], r["pack_id"], r["pack_pos"])
        for r in registry.QUERIES["q_pipe_pack"](spark, SF_DIR).collect()
    }
    b = {
        (r["doc_id"], r["pack_id"], r["pack_pos"])
        for r in registry.QUERIES["q_pipe_pack"](spark, SF_DIR).collect()
    }
    assert a == b


def test_pack_efficiency_is_sane(spark):
    """Greedy packing should beat one-doc-per-context by a wide
    margin: mean fill ≥ 60% of capacity on the fixture (docs average
    ~300 chars vs 600 capacity, so ~2 docs/pack)."""
    packed = registry.QUERIES["q_pipe_pack"](spark, SF_DIR)
    fills = (
        packed.groupBy("pack_id")
        .agg(F.max("pack_fill").alias("fill"))
        .agg(F.avg("fill").alias("avg_fill"))
        .collect()[0]["avg_fill"]
    )
    assert fills >= 0.6 * PACK_CAPACITY, fills
