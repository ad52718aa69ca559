"""Property tests for the extension operators — checks the oracle
can't express: recall of the approximate paths against exact ground
truth, heuristic accuracy, and the reference's only in-repo
correctness property (mode equivalence under repetition/concurrency,
reference src/main.rs:79 vs :116)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle

registry.load_all()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_recall_vs_ngram(spark):
    """LSH candidates must recover ≥90% of true high-Jaccard pairs
    (planted near-dups sit at jaccard ≥0.9; with k=8, b=4, r=2 the
    hit probability at s=0.9 is 1-(1-s²)⁴ ≈ 0.999)."""
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["q_dedup_ngram"](spark, SF_DIR).collect()
        if r["jaccard"] >= 0.9
    }
    candidates = _pairs(registry.QUERIES["q_dedup_minhash"](spark, SF_DIR))
    assert truth, "fixture should contain planted near-dup pairs"
    recall = len(truth & candidates) / len(truth)
    assert recall >= 0.9, f"minhash recall {recall:.2f} over {len(truth)} true pairs"


def test_simhash_separates_near_dups(spark):
    """Planted near-dup pairs must be closer in Hamming distance than
    random pairs on average."""
    sim = {r["doc_id"]: r["simhash"] for r in registry.QUERIES["q_dedup_simhash"](spark, SF_DIR).collect()}
    near = [
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["q_dedup_ngram"](spark, SF_DIR).collect()
        if r["jaccard"] >= 0.9
    ]
    assert near
    ham = lambda a, b: bin(sim[a] ^ sim[b]).count("1")
    near_avg = sum(ham(a, b) for a, b in near) / len(near)
    ids = sorted(sim)[:60]
    rand_pairs = [(ids[i], ids[i + 1]) for i in range(0, len(ids) - 1, 2)]
    rand_avg = sum(ham(a, b) for a, b in rand_pairs) / len(rand_pairs)
    assert near_avg < rand_avg / 2, f"near {near_avg:.1f} vs random {rand_avg:.1f}"


def test_ann_recall_vs_bruteforce(spark):
    """Sign-LSH ANN must place ≥1 of the true top-5 neighbors in its
    candidate list (single-bucket probe — recall is partial by design,
    but zero overlap would mean broken bucketing)."""
    exact = [r["vec_id"] for r in registry.QUERIES["q_sim_topk"](spark, SF_DIR).collect()][:5]
    approx = {r["vec_id"] for r in registry.QUERIES["q_sim_ann"](spark, SF_DIR).collect()}
    assert approx, "ANN returned nothing — bucketing broken"
    assert len(set(exact) & approx) >= 1, f"no overlap: exact top5 {exact}, ann {sorted(approx)[:10]}"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=2 of 8 cells must recover a majority of the
    true top-10 (cells are data-adaptive, so recall should beat the
    single-probe sign-LSH variant)."""
    exact = [r["vec_id"] for r in registry.QUERIES["q_sim_topk"](spark, SF_DIR).collect()][:10]
    approx = {r["vec_id"] for r in registry.QUERIES["q_sim_ivf"](spark, SF_DIR).collect()}
    assert approx, "IVF returned nothing"
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f} over top-10"


def test_embed_lsh_recall_vs_exact(spark):
    """Bucketed embedding near-dup must recover a reasonable share of
    the exact pairs (single-bucket probe: both vectors must land in
    the same 4-bit bucket — at cos≈0.4-0.5 per-bit agreement ≈ 0.63,
    so expected recall ≈ 0.63⁴ ≈ 15-25%; assert a floor that breakage
    would violate)."""
    exact = _pairs(registry.QUERIES["q_dedup_embed"](spark, SF_DIR), "vec_a", "vec_b")
    approx = _pairs(registry.QUERIES["q_dedup_embed_lsh"](spark, SF_DIR), "vec_a", "vec_b")
    assert exact, "exact embed dedup found no pairs"
    assert approx.issubset(exact | approx)  # sanity: no spurious pairs below threshold
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.05, f"LSH recall {recall:.2f} — bucketing broken"


def test_cluster_ids_are_component_minima(spark):
    """Every cluster member must map to the smallest doc_id of its
    candidate-pair component (transitivity check on the Spark side,
    independent of the oracle)."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["q_dedup_minhash"](spark, SF_DIR).collect()
    ]
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in registry.QUERIES["q_dedup_clusters"](spark, SF_DIR).collect()
    }
    for a, b in pairs:
        assert labels[a] == labels[b], f"pair ({a},{b}) split across clusters"
        assert labels[a] <= min(a, b)


def test_lang_id_accuracy(spark):
    """The fixture's text is English-vocab soup for every lang label
    (verified: zh-labeled rows contain no CJK), so accuracy-vs-label is
    unmeasurable there. Instead: the heuristic must (a) classify real
    multilingual sentences correctly, (b) call the fixture's
    English-like text 'en'."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.operators.text import _LANG_CASE

    samples = [
        ("the quick brown fox jumps over the lazy dog and the cat is here", "en"),
        ("der hund und die katze sind im haus und das wetter ist gut", "de"),
        ("le chat et le chien sont dans la maison et la vie est belle", "fr"),
        ("el perro y el gato están en la casa y los niños es feliz", "es"),
        ("今天天气很好我们去公园散步", "zh"),
    ]
    df = spark.createDataFrame(samples, "text string, expected string").withColumn(
        "padded", F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    )
    case = _LANG_CASE.replace("regexp_matches(text, ", "rlike(text, ")
    rows = df.select("expected", F.expr(case).alias("pred")).collect()
    for r in rows:
        assert r["pred"] == r["expected"], f"{r['expected']} classified as {r['pred']}"

    fixture = registry.QUERIES["q_text_lang"](spark, SF_DIR).collect()
    en_rate = sum(1 for r in fixture if r["lang_pred"] == "en") / len(fixture)
    assert en_rate >= 0.95, f"English-vocab fixture predicted en only {en_rate:.2f}"


def test_exact_dedup_collapses_planted_dups(spark):
    """Union the table with itself → every content-hash group doubles:
    proves the collapse machinery (fixture itself has no exact dups)."""
    from datafusion_tpc_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_DIR, "documents")
    doubled = d.union(d)
    groups = (
        doubled.groupBy(F.md5("text").alias("h"))
        .count()
        .filter(F.col("count") != 2)
        .count()
    )
    assert groups == 0


def test_mode_equivalence_repeated_and_concurrent(spark):
    """Port of the reference's only correctness check (row counts equal
    across execution modes and repetitions, src/main.rs:65-80,103-117;
    concurrent runs benches/query.rs:60-76): one prepared DataFrame,
    re-executed serially and from 8 threads — identical results."""
    df = registry.QUERIES["q_agg_avg"](spark, SF_DIR)
    baseline = sorted(map(tuple, df.collect()))
    for _ in range(3):
        assert sorted(map(tuple, df.collect())) == baseline
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(lambda _: sorted(map(tuple, df.collect())), range(8)))
    assert all(r == baseline for r in results)


def test_clusters_converge_on_chain(spark):
    """Chain-shaped duplicate family (0-1-2-…-9, diameter 9 — longer
    than any small fixed round count): min-label propagation must run
    to the fixpoint and label every node with the chain minimum.
    Guards the ADVICE finding that plain neighbor-min propagation
    moves the minimum ONE hop per round, not 2^rounds."""
    from datafusion_tpc_spark.operators.dedup import min_label_propagation

    n = 10
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs], "a long, b long"
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in min_label_propagation(edges).collect()}
    assert labels == {i: 0 for i in range(n)}


def test_arrayagg_raw_array(spark, ddb):
    """The raw array-typed collect_list form, kept out of the driver
    registry (its hash canonicalizer cannot factorize list cells —
    q_agg_arrayagg ships the string-joined form instead) but verified
    here with the list-aware comparator."""
    from datafusion_tpc_spark.catalog import load_table
    from pyspark.sql import functions as F

    df = (
        load_table(spark, SF_DIR, "nation")
        .groupBy("n_regionkey")
        .agg(F.array_sort(F.collect_list("n_name")).alias("nations"))
    )
    assert_matches_oracle(
        df,
        ddb,
        """
        SELECT n_regionkey, list_sort(array_agg(n_name)) AS nations
        FROM nation GROUP BY n_regionkey
        """,
        name="arrayagg_raw",
    )


def test_sign_bucket_deterministic_across_constructions(spark):
    """Two INDEPENDENT constructions of _sign_bucket must assign every
    vector the same bucket. Guards the ADVICE finding that a defaulted
    second lambda parameter (`lambda d, _p=p:`) flips F.transform into
    its (element, index) binary form, binding the default to the index
    Column — whose fresh-name repr then varies per construction, so the
    same data silently got different buckets each time."""
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.operators.similarity import _sign_bucket
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    first = {
        r["vec_id"]: r["bucket"]
        for r in e.withColumn("bucket", _sign_bucket(F.col("emb"))).collect()
    }
    second = {
        r["vec_id"]: r["bucket"]
        for r in e.withColumn("bucket", _sign_bucket(F.col("emb"))).collect()
    }
    assert first == second
    # buckets must actually spread the data (all-one-bucket would mean
    # the plane projections collapsed)
    assert len(set(first.values())) > 1


def test_minhash_band_cap_drops_boilerplate(spark):
    """Mega-band guard: 120 identical boilerplate docs share every band
    key (a 120-member mega-band → 7140 quadratic pairs uncapped); two
    planted unique near-dups sit in small band keys. With cap=50 the
    boilerplate family must produce ZERO pairs while the planted pair
    survives."""
    from datafusion_tpc_spark.operators.dedup import band_table, lsh_candidate_pairs

    boiler = "all rights reserved this document is provided as is " * 4
    near_a = "the quick brown fox jumps over the lazy dog again and again today"
    near_b = "the quick brown fox jumps over the lazy dog again and again tonight"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(120)] + [(1000, near_a), (1001, near_b)],
        "doc_id long, text string",
    )
    bands = band_table(docs)
    capped = _pairs(lsh_candidate_pairs(bands, band_cap=50))
    uncapped = lsh_candidate_pairs(bands, band_cap=None).count()
    assert (1000, 1001) in capped
    assert all(a >= 1000 for a, _ in capped), "boilerplate pairs must be dropped"
    assert uncapped > 7000  # the quadratic blowup the guard prevents


def test_sign_bucket_literal_matches_expression(spark):
    """The literal-weights fast path (dim known → md5s precomputed in
    Python) must assign bit-identical buckets to the expression path
    (per-row md5 evaluation) — same hash family, same fold order."""
    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.operators.similarity import _sign_bucket
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    dim = e.select(F.size("emb")).first()[0]
    expr_path = {
        r["vec_id"]: r["bucket"]
        for r in e.withColumn("bucket", _sign_bucket(F.col("emb"))).collect()
    }
    lit_path = {
        r["vec_id"]: r["bucket"]
        for r in e.withColumn(
            "bucket", _sign_bucket(F.col("emb"), dim=dim)
        ).collect()
    }
    assert expr_path == lit_path


def test_text_compress_matches_direct_zlib(spark):
    """q_text_compress's pandas_udf must agree byte-for-byte with
    direct zlib at the same level — pins the rows-only query's values
    since no DuckDB oracle can."""
    import zlib

    from datafusion_tpc_spark import registry

    rows = (
        registry.QUERIES["q_text_compress"](spark, SF_DIR)
        .limit(50)
        .collect()
    )
    assert rows
    # join the sampled doc_ids back by KEY — two independent unordered
    # limit() prefixes can diverge once the fixture is multi-file
    # (ADVICE r5), turning a real assertion into a KeyError.
    sampled_ids = [r.doc_id for r in rows]
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id").isin(sampled_ids))
        .collect()
    }
    for r in rows:
        expected = len(zlib.compress(docs[r.doc_id].encode("utf-8"), 6))
        assert r.comp_bytes == expected, r.doc_id
        assert r.flag_repetitive == (r.comp_bytes * 10 < r.n_bytes * 3)


def test_tdigest_rank_error_within_bound(spark):
    """q_agg_tdigest (rows-only): each quantile estimate must sit
    between the exact (q−2%) and (q+2%) quantiles of o_totalprice —
    i.e. rank error ≤ 2%, the accuracy class t-digest promises at
    this compression width."""
    rows = {
        r.q: r.estimate
        for r in registry.QUERIES["q_agg_tdigest"](spark, SF_DIR).collect()
    }
    vals = sorted(
        r.o_totalprice
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    assert set(rows) == {0.5, 0.9, 0.99}
    for q, est in rows.items():
        lo = vals[max(0, int((q - 0.02) * n) - 1)]
        hi = vals[min(n - 1, int((q + 0.02) * n))]
        assert lo <= est <= hi, (q, est, lo, hi)


def test_pca_power_iteration_invariants(spark):
    """q_sim_pca invariants. The fixture's embeddings are nearly
    isotropic (top two eigenvalues of XᵀX within ~2% of each other),
    so two power-iteration rounds CANNOT lock onto the top
    eigenvector — what power iteration does guarantee, and what this
    pins, is (a) monotone Rayleigh-quotient ascent from the v0 start,
    (b) ‖XᵀX·v‖ ≤ λmax for the unit iterate (the eigval_est upper
    bound), and (c) a unit-norm output vector."""
    import numpy as np

    out = registry.QUERIES["q_sim_pca"](spark, SF_DIR).collect()
    v = np.array([r.loading for r in sorted(out, key=lambda r: r.pos)])
    est = out[0].eigval_est
    X = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    S = X.T @ X
    eigvals = np.linalg.eigvalsh(S)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # (c) unit output
    v0 = np.full(64, 0.125)
    rayleigh0 = float(v0 @ S @ v0)
    rayleigh2 = float(v @ S @ v)
    assert rayleigh2 > rayleigh0  # (a) monotone ascent
    # (b) the norm estimate can never exceed the top eigenvalue
    assert est <= eigvals[-1] * 1.001, (est, eigvals[-1])
    # and it must have made real progress from the isotropic floor
    assert est > eigvals.mean(), (est, eigvals.mean())


def test_documents_text_is_single_byte_chars(spark):
    """q_mm_dedup's oracle slices a 32-CHARACTER text prefix while the
    Spark side slices a 32-BYTE payload prefix (DuckDB has no BLOB
    substring) — equivalent only while every document, including
    lang='zh', is pure single-byte text. q_mm_meta compares byte
    lengths to byte lengths so it does NOT pin this (ADVICE r5); this
    does, explicitly: chars == bytes for every document. A fixture
    drop with real multi-byte text fails HERE, not via silent group-
    membership drift."""
    mismatched = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.octet_length("text") != F.length("text"))
        .count()
    )
    assert mismatched == 0


def test_bpe_train_matches_list_based_reference(spark):
    """q_pipe_bpe_train's sentinel-padded string-replace merge must
    agree with an INDEPENDENT list-based BPE implementation (scan the
    symbol list left→right; on a pair match emit the merged symbol
    and continue AFTER it — the same single-pass non-overlapping
    semantics Java String.replace / DuckDB replace implement). Pins
    the merge-application mechanics the oracle alone can't isolate:
    both engines could share a boundary bug, a third implementation
    can't."""
    import collections

    rows = registry.QUERIES["q_pipe_bpe_train"](spark, SF_DIR).collect()
    got = {(r.rnd, r.rk): (r.pair, r.cnt) for r in rows}

    wf = collections.Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ):
        for w in r.text.split(" "):
            wf[w] += 1

    def pair_counts(symlists):
        c = collections.Counter()
        for syms, f in symlists:
            for a, b in zip(syms[:-1], syms[1:]):
                c[f"{a} {b}"] += f
        return c

    def apply_merge(syms, pair):
        a, b = pair.split(" ")
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2  # continue AFTER the merged pair (single pass)
            else:
                out.append(syms[i])
                i += 1
        return out

    symlists = [(list(w), f) for w, f in wf.items() if len(w) >= 2]
    p1 = pair_counts(symlists)
    top5_r1 = sorted(p1.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for rk, (pair, cnt) in enumerate(top5_r1, 1):
        assert got[(1, rk)] == (pair, cnt), (rk, got[(1, rk)], pair, cnt)
    m1 = top5_r1[0][0]
    symlists = [(apply_merge(s, m1), f) for s, f in symlists]
    p2 = pair_counts(symlists)
    top5_r2 = sorted(p2.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for rk, (pair, cnt) in enumerate(top5_r2, 1):
        assert got[(2, rk)] == (pair, cnt), (rk, got[(2, rk)], pair, cnt)
