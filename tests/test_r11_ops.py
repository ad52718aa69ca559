"""Round-11 operator invariants: the IVF materialized-assignment
serving path (VERDICT r10 item 3) and the trained-codebook memo
(ADVICE r10)."""

from __future__ import annotations

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_ivf_served_equals_recomputed_search(spark):
    """The materialized index is a physical change only: the served
    top-k must be ROW-IDENTICAL (values and order) to q_sim_ivf's
    recomputed-assignment search."""
    served = registry.QUERIES["q_sim_ivf_served"](spark, SF_DIR).collect()
    base = registry.QUERIES["q_sim_ivf"](spark, SF_DIR).collect()
    assert len(served) == len(base) == 20
    assert [tuple(r) for r in served] == [tuple(r) for r in base]


def test_ivf_served_reads_persisted_codebook(spark):
    """Serving probes with the WRITER'S codebook (the zorder
    grid-persistence convention): the probe selection must read
    _ivf_codebook.json, not retrain — a fresh process serving a
    cached index does zero training."""
    import json
    import os

    from datafusion_tpc_spark.operators.ivf_served import _ivf_index

    path, codebook = _ivf_index(spark, SF_DIR)
    assert os.path.exists(os.path.join(path, "_ivf_codebook.json"))
    with open(os.path.join(path, "_ivf_codebook.json")) as f:
        persisted = [(int(c), [float(x) for x in e]) for c, e in json.load(f)]
    assert codebook == persisted
    # partition layout: one directory per trained cell
    cells = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert 1 <= len(cells) <= 8
    from datafusion_tpc_spark.functions.ivf import IVF_DIM, IVF_K

    assert len(codebook) == IVF_K
    assert all(len(e) == IVF_DIM for _, e in codebook)


def test_ivf_codebook_memo_hits(spark):
    """ADVICE r10: six consumers share one training run per
    (source fingerprint, constants) — the memo must be primed after
    any ivf_model call and return the identical object on re-call."""
    from datafusion_tpc_spark.functions import ivf

    ivf.ivf_model(spark, SF_DIR)
    assert ivf._CODEBOOK_MEMO, "memo not primed by ivf_model"
    v = None  # memo hit must not need the training frame
    key_hits = ivf._trained_codebook(spark, SF_DIR, v)
    assert key_hits is ivf._trained_codebook(spark, SF_DIR, v)


def test_ivf_served_batch_equals_batched_search(spark):
    """The batched served path composes the materialized index with
    the q_sim_ivf_batch probe semantics: row-identical output."""
    served = registry.QUERIES["q_sim_ivf_served_batch"](spark, SF_DIR).collect()
    base = registry.QUERIES["q_sim_ivf_batch"](spark, SF_DIR).collect()
    assert len(served) == len(base) == 50
    assert [tuple(r) for r in served] == [tuple(r) for r in base]


# ---- span-dedup family + PSI drift (late r11) --------------------------


def test_substr_spans_decontam_consistency(spark):
    """Cross-operator invariants tying the three span queries to one
    window universe (same L/S constants, same h60 hashes)."""
    sub = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_dedup_substr"](spark, SF_DIR).collect()
    }
    # per-doc bounds + window count matches the closed form over text
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for doc_id, r in sub.items():
        assert 0 <= r["n_dup"] <= r["n_windows"]
        assert abs(r["dup_frac"] - round(r["n_dup"] / r["n_windows"], 6)) < 1e-9
        n = len(docs[doc_id])
        assert r["n_windows"] == (n - 32) // 16 + 1
    # every doc with >= 32 chars appears exactly once
    assert len(sub) == sum(1 for t in docs.values() if len(t) >= 32)

    spans = registry.QUERIES["q_dedup_spans"](spark, SF_DIR).collect()
    assert 0 < len(spans) <= 20
    for r in spans:
        assert r["n_docs"] >= 2 and r["n_occ"] >= r["n_docs"]
        assert len(r["span"]) == 32
    # ranked output: non-increasing (n_docs, n_occ) with span tiebreak
    keys = [(-r["n_docs"], -r["n_occ"], r["span"]) for r in spans]
    assert keys == sorted(keys)
    # each top span's docs must show up as duplicated mass in substr
    top = spans[0]["span"]
    carriers = [d for d, t in docs.items() if top in t]
    assert len(carriers) >= 2
    # windowed carrier docs (span aligned to the stride grid in at
    # least one doc) must report n_dup > 0 — weak but non-vacuous
    assert any(sub[d]["n_dup"] > 0 for d in carriers if d in sub)

    dec = registry.QUERIES["q_dedup_decontam"](spark, SF_DIR).collect()
    assert dec, "test split is empty?"
    import hashlib

    def py_h60(s):  # pure-Python twin of functions.digest.h60
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for r in dec:
        assert py_h60(str(r["doc_id"])) % 100 >= 95, "non-test doc in output"
        assert 0 <= r["n_contam"] <= r["n_windows"]
        # decontam windows are a subset of this doc's substr windows
        assert r["n_windows"] == sub[r["doc_id"]]["n_windows"]
    # fixture carries real contamination signal (31 windows at sf0.01)
    assert sum(r["n_contam"] for r in dec) > 0


def test_psi_nonnegative_and_single_scan(spark):
    """PSI is a sum of (q-p)ln(q/p) terms, each >= 0 — and the plan
    must read events exactly ONCE (the closed-form missing-bin fold
    replaces the grid-completion join; VERDICT r5 re-scan lesson)."""
    df = registry.QUERIES["q_dq_psi"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 5  # five event types in the fixture
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    for r in rows:
        assert r["psi"] >= 0.0
        assert r["n_a"] > 0 and r["n_b"] > 0
    assert sum(r["n_a"] + r["n_b"] for r in rows) == total
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE toString appends an "Initial Plan" echo — count the final
    # plan section only.
    final = plan.split("Initial Plan")[0]
    assert final.count("Scan parquet") == 1, "events must be scanned once"


def test_winnow_matches_python_reference(spark):
    """Per-doc winnowed fingerprint sets recomputed in pure Python
    (md5 h60, k=5 shingles, W=4 windows) must match the Spark/SQL
    fold exactly for a sample of docs — plus global bounds."""
    import hashlib

    rows = registry.QUERIES["q_dedup_winnow"](spark, SF_DIR).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    sample = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )
    assert len(by_doc) == spark.read.parquet(
        f"{SF_DIR}/documents.parquet"
    ).count()

    def h60py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for row in sample:
        w = row["text"].split(" ")
        n_sh = max(len(w) - 4, 1)
        hs = [
            h60py(" ".join(x for x in w[i : i + 5] if x is not None))
            for i in range(n_sh)
        ]
        n_win = max(len(hs) - 3, 1)
        fps = {min(hs[j : j + 4]) for j in range(n_win)}
        r = by_doc[row["doc_id"]]
        assert r["n_fp"] == len(fps), row["doc_id"]
        assert 0 <= r["n_shared"] <= r["n_fp"]
        assert abs(r["share_frac"] - round(r["n_shared"] / r["n_fp"], 6)) < 1e-9


def test_span_family_single_scan(spark):
    """The substr/decontam/winnow rollups derive their cross-doc
    counts from window functions over one exchange — the corpus must
    be scanned exactly ONCE per query (the groupBy-then-join-back
    form re-executes the scan lineage per consumer; VERDICT r5
    re-scan lesson)."""
    for name in (
        "q_dedup_substr",
        "q_dedup_decontam",
        "q_dedup_winnow",
        "q_dedup_winnow_pairs",
    ):
        df = registry.QUERIES[name](spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        assert final.count("Scan parquet") == 1, f"{name}: scans != 1"


def test_winnow_pairs_consistent_with_winnow(spark):
    """Every reported pair is ordered, deduplicated, and both members
    must show shared mass in q_dedup_winnow (a pair exists only via
    fps with 2 <= nd <= CAP, which winnow counts as shared)."""
    pairs = registry.QUERIES["q_dedup_winnow_pairs"](spark, SF_DIR).collect()
    assert 0 < len(pairs) <= 20
    shared = {
        r["doc_id"]: r["n_shared"]
        for r in registry.QUERIES["q_dedup_winnow"](spark, SF_DIR).collect()
    }
    seen = set()
    prev = None
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["n_shared"] >= 1
        assert shared[r["doc_a"]] >= r["n_shared"]
        assert shared[r["doc_b"]] >= r["n_shared"]
        key = (-r["n_shared"], r["doc_a"], r["doc_b"])
        assert prev is None or prev <= key  # ranked output
        prev = key


def test_short_doc_shingles_do_not_throw(spark):
    """Regression for the r11 fuzz finding: under ANSI mode (Spark 4
    default), bracket indexing w[i+k] THREW on docs shorter than the
    shingle width — get() returns NULL there (concat_ws skips it),
    matching DuckDB's out-of-bounds bracket semantics. The fixture
    never has short docs, so only a synthetic doc exercises this."""
    import hashlib

    from pyspark.sql import functions as F

    from datafusion_tpc_spark.functions.shingles import SHINGLES
    from datafusion_tpc_spark.operators.dedup import _winnow_fpt_from

    d = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "a b c d e f")],
        "doc_id long, text string",
    )
    sh = (
        d.withColumn("w", F.split("text", " "))
        .select("doc_id", F.expr(SHINGLES).alias("sh"))
        .collect()
    )
    got = {r["doc_id"]: r["sh"] for r in sh}
    assert got[1] == ["solo"]          # 1 word -> the word itself
    assert got[2] == ["two words"]     # 2 words -> one short shingle
    assert got[3][0] == "a b c"        # full-width shingles unchanged

    fps = {r["doc_id"] for r in _winnow_fpt_from(d).collect()}
    assert fps == {1, 2, 3}            # winnow survives short docs
    h = int(hashlib.md5(b"solo").hexdigest()[:15], 16)
    one = [r["fp"] for r in _winnow_fpt_from(d).collect() if r["doc_id"] == 1]
    assert one == [h]                  # 1 shingle -> its own min-hash


def test_spans_and_pairs_plan_shapes(spark):
    """Ranked outputs must plan as TakeOrderedAndProject (map-side
    heaps — no global sort), and the pairs matcher must contain NO
    join at all (in-row basket expansion replaced the fp self-join)."""
    for name in ("q_dedup_spans", "q_dedup_winnow_pairs"):
        df = registry.QUERIES[name](spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        assert "TakeOrderedAndProject" in final, name
        assert "CartesianProduct" not in final, name
    pairs_plan = (
        registry.QUERIES["q_dedup_winnow_pairs"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("Initial Plan")[0]
    )
    assert "Join" not in pairs_plan, "pairs must be join-free"
