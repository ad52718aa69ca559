"""Training-data pipeline curation operators — north-star extension
(SURVEY.md §7/M5 family, beyond the reference's own surface).

The ops a large-scale LLM training-data pipeline runs between raw
crawl and tokenized shards, each expressed Spark-first with an exact
DuckDB oracle:

- deterministic hash sampling / train-val-test splitting (the
  reproducibility workhorse — same doc always lands in the same
  split, on any cluster, at any scale; no RNG state to ship),
- stratified sampling with per-stratum rates,
- Gopher-style composite quality filtering with reject reasons,
- TF-IDF top-terms and BM25 relevance scoring,
- PII redaction (regex scrub + audit counts),
- eval-set contamination flagging (n-gram collision against a
  benchmark shingle set),
- canonical-document selection per near-dup cluster (the "keep best"
  step after q_dedup_clusters).

Scale notes (100 TB):
- Sampling/splitting/redaction are pure row-local expressions — scan
  speed, zero shuffle, trivially partition-parallel.
- TF-IDF/BM25 shuffle once on (doc_id, term) for TF; the document-
  frequency side collapses to ~vocabulary cardinality and is
  broadcast back. Map-side combine does the heavy lifting: shuffle
  bytes ∝ distinct (doc, term), not corpus tokens.
- Contamination broadcasts the eval shingle set (benchmarks are
  small by nature) — one scan-side semi-join, no full shuffle.
- Canonical selection rides q_dedup_clusters' label table: one
  window over cluster_id (cluster count « corpus size).

Reference parity: the reference engine (thinkharderdev/datafusion-tpc)
stops at the relational surface (src/main.rs:40-57 runs plain SQL);
these extend it for the LLM-pipeline use cases the prompt contracts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import (
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
    split_bucket,
    split_bucket_duck,
)
from datafusion_tpc_spark.operators.dedup import (
    _BAND_SELECTS,
    _MIN_EXPRS,
    _SHINGLES_DUCK,
    _h60_duck,
    h60,
    q_dedup_clusters,
    shingle_table,
)
from datafusion_tpc_spark.registry import query

# ---- deterministic hash sampling / splitting --------------------------

# md5-derived bucket in [0, 100) — identical on both engines via the
# shared h60 family. The convention (expression + 90/5/5 thresholds)
# lives in functions/digest.py so the decontamination auditor
# (operators/dedup.py q_dedup_decontam) can share it without importing
# this module's registrations (review r11). Production pipelines key
# this on a stable doc URL/id so re-runs and incremental loads keep
# membership. (_bucket is a function, not a module constant: Column
# construction needs a live SparkContext, and this module imports
# before any session exists.)
_bucket = split_bucket
_BUCKET_DUCK = split_bucket_duck()


@query(
    "q_pipe_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST({_BUCKET_DUCK} AS BIGINT) AS bucket
    FROM documents
    WHERE {_BUCKET_DUCK} < 10
    """,
)
def q_pipe_sample(spark, sf_dir):
    """Deterministic 10% sample: hash-bucket the stable doc key and
    keep buckets [0, 10). Row-local, zero shuffle, reproducible on any
    cluster — the scalable replacement for rand()-based sampling
    (which changes membership per run and per partitioning)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "source", _bucket().cast("bigint").alias("bucket")
    ).filter(F.col("bucket") < 10)


@query(
    "q_pipe_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET_DUCK} < {SPLIT_TRAIN_LT} THEN 'train'
                WHEN {_BUCKET_DUCK} < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_pipe_split(spark, sf_dir):
    """Train/val/test assignment (90/5/5) off the same hash buckets —
    splits are disjoint, exhaustive, and stable across reruns/rescale;
    a doc can never leak between train and eval because membership is
    a pure function of its id."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(_bucket() < SPLIT_TRAIN_LT, "train")
        .when(_bucket() < SPLIT_VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "q_pipe_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_BUCKET_DUCK} <
          CASE lang WHEN 'en' THEN 10 ELSE 40 END
    """,
)
def q_pipe_sample_stratified(spark, sf_dir):
    """Stratified sampling: per-stratum rates (downsample the dominant
    'en' stratum to 10%, keep 40% of the rest) — the language-
    rebalancing step of a multilingual data mix. Still row-local and
    deterministic; no per-stratum pass, one CASE on the rate."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 10).otherwise(40)
    return d.select("doc_id", "lang").filter(_bucket() < rate)


# ---- Gopher-style quality filter --------------------------------------


@query(
    "q_pipe_quality_filter",
    oracle="""
    SELECT doc_id, n_words, awl, diversity,
           CASE WHEN n_words < 20 THEN 'too_short'
                WHEN n_words > 80 THEN 'too_long'
                WHEN awl < 4.8 OR awl > 6.0 THEN 'word_len'
                WHEN diversity < 0.35 THEN 'repetitive'
                ELSE 'pass' END AS verdict
    FROM (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             ROUND(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS awl,
             ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')), 6) AS diversity
      FROM documents
    )
    """,
)
def q_pipe_quality_filter(spark, sf_dir):
    """Composite quality rules (Gopher-style) with a reject reason per
    doc: word-count bounds, mean-word-length band, lexical diversity
    (distinct/total tokens). First failing rule wins. All signals are
    row-local JVM string expressions — scan speed, no shuffle; the
    comparisons run on ROUND(…, 6) values so the rule outcome is
    engine-exact. Thresholds are fixture-calibrated to exercise every
    branch (TESTDATA: 10-99 words, awl 4.67-6.24, diversity ≥ 0.277)."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    nw = F.size(w)
    awl = F.round(F.length("text") / nw, 6)
    div = F.round(F.size(F.array_distinct(w)) / nw, 6)
    return d.select(
        "doc_id",
        nw.cast("bigint").alias("n_words"),
        awl.alias("awl"),
        div.alias("diversity"),
    ).withColumn(
        "verdict",
        F.when(F.col("n_words") < 20, "too_short")
        .when(F.col("n_words") > 80, "too_long")
        .when((F.col("awl") < 4.8) | (F.col("awl") > 6.0), "word_len")
        .when(F.col("diversity") < 0.35, "repetitive")
        .otherwise("pass"),
    )


# ---- TF-IDF / BM25 ----------------------------------------------------

_TOK_DUCK = """
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
"""

_BM25_TERMS = ("table", "join", "data", "query")
_K1, _B = 1.2, 0.75


def _token_tf(spark, sf_dir):
    """(doc_id, term, c) term frequencies — one shuffle, map-side
    combined (shuffle bytes ∝ distinct doc-term pairs, not tokens).

    Deliberately NOT cache()d, though its consumers re-execute the
    explode+groupBy lineage (r11 scan audit: bm25 reads the corpus
    5×; tfidf read it 3× until the r12 window-df rewrite cut its
    derived branch): caching was implemented and MEASURED WORSE at sf0.1
    — tfidf 0.86→0.80 but bm25 0.60→1.00 median (2.2× its baseline
    row): the InMemoryRelation reads break whole-stage codegen and
    cost more than re-running the pipelined scan at this rollup size.
    At a scale where the corpus scan dominates, persist this rollup
    once and serve both queries from it (the q_sim_ivf_served
    materialization pattern) rather than re-introducing a blanket
    cache()."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))


@query(
    "q_pipe_tfidf",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS c
      FROM ({_TOK_DUCK}) GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS d FROM tf GROUP BY term),
    n AS (SELECT count(*) AS nn FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.c * ln((n.nn + 1.0) / (dfreq.d + 1.0)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
)
def q_pipe_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (keyword extraction). TF is the
    one real shuffle; document frequency is a COUNT window over the
    term partition of the SAME tf stream — (doc_id, term) is unique in
    tf, so the partition row count IS df(term) (the r11 span-family
    single-scan pattern) — replacing the broadcast-dfreq join whose
    derived branch re-executed the whole corpus scan+explode lineage
    (r12: 3 corpus scans → 2, 0.89 → 0.69 s measured same-session,
    row-identical). The final top-3 is a window over doc_id; ranking
    compares ROUND(…, 6) scores (term ASC tiebreak) so order is
    engine-exact across libm ln() implementations.

    100 TB trade-off, stated honestly: the term-partition window
    buffers df(term) rows per partition, so a stopword-grade term
    concentrates ~|docs| rows in one spilling window task — against
    the old form's full second corpus scan + explode. For Zipfian
    vocabularies with standard stopword handling the window wins;
    past that, the production answer is neither: persist the tf
    rollup once and derive dfreq from the materialized table (the
    _token_tf docstring's q_sim_ivf_served pattern)."""
    tf = _token_tf(spark, sf_dir)
    nn = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("nn")
    )
    d = F.count(F.lit(1)).over(Window.partitionBy("term"))
    scored = (
        tf.withColumn("d", d)
        .join(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("c") * F.log((F.col("nn") + 1.0) / (F.col("d") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return (
        scored.withColumn("rn", rn.cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


@query(
    "q_pipe_bm25",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS c
      FROM ({_TOK_DUCK}) GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS d FROM tf GROUP BY term),
    dls AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS nn FROM documents),
    avgs AS (SELECT AVG(dl) AS avgdl FROM dls)
    SELECT tf.doc_id AS doc_id,
           ROUND(SUM(
             ln(1 + (stats.nn - dfreq.d + 0.5) / (dfreq.d + 0.5))
             * tf.c * ({_K1} + 1)
             / (tf.c + {_K1} * (1 - {_B} + {_B} * dls.dl / avgs.avgdl))
           ), 6) AS score
    FROM tf
    JOIN dfreq USING (term)
    JOIN dls ON dls.doc_id = tf.doc_id
    CROSS JOIN stats CROSS JOIN avgs
    WHERE tf.term IN {_BM25_TERMS!r}
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id
    LIMIT 20
    """,
)
def q_pipe_bm25(spark, sf_dir):
    """BM25 relevance of every document against a fixed query-term set
    (k1=1.2, b=0.75) — the retrieval-scoring step of a dedup-against-
    eval or quality-ranking pass. Same TF/DF/length statistics as
    TF-IDF; the query-term filter prunes TF before any join, so the
    scored set is ∝ matching docs, not the corpus. Top-20 with
    (score DESC, doc_id) tiebreak is a TakeOrderedAndProject — no
    global sort."""
    tf = _token_tf(spark, sf_dir)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("d"))
    dls = tf.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("dl"))
    nn = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("nn")
    )
    avgdl = dls.agg(F.avg("dl").alias("avgdl"))
    qt = tf.filter(F.col("term").isin(*_BM25_TERMS))
    idf = F.log(
        1 + (F.col("nn") - F.col("d") + 0.5) / (F.col("d") + 0.5)
    )
    tfn = (F.col("c") * (_K1 + 1)) / (
        F.col("c") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        qt.join(F.broadcast(dfreq), "term")
        .join(dls, "doc_id")
        .join(F.broadcast(nn))
        .join(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tfn), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# ---- PII redaction ----------------------------------------------------

# Conservative regex subset (identical semantics in Java regex and
# RE2): character classes, +, bounded repeats. The fixture corpus has
# no PII, so each doc gets a deterministic synthetic contact line
# appended — the redaction is then genuinely exercised and the oracle
# stays exact.
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "q_pipe_pii_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(synth, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(synth, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(synth, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones
    FROM (
      SELECT doc_id,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@example.com or call 555-',
                    lpad(CAST(doc_id AS VARCHAR), 4, '0')) AS synth
      FROM documents
    )
    """,
)
def q_pipe_pii_redact(spark, sf_dir):
    """PII scrub: replace emails/phone numbers with typed placeholder
    tokens and count what was found (the audit trail a compliance pass
    needs). Pure regexp_replace/regexp_count JVM expressions — scan
    speed, zero shuffle, trivially scales with input splits."""
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    return d.select("doc_id", synth.alias("synth")).select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("synth", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        F.regexp_count("synth", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("synth", F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
    )


# ---- eval-set contamination -------------------------------------------


@query(
    "q_pipe_contamination",
    oracle=f"""
    WITH sh AS ({_SHINGLES_DUCK}),
    freq AS (SELECT s, count(*) AS nf FROM sh GROUP BY s),
    eval5 AS (SELECT s FROM freq ORDER BY nf DESC, s LIMIT 5)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_hits
    FROM sh JOIN eval5 USING (s)
    GROUP BY doc_id
    """,
)
def q_pipe_contamination(spark, sf_dir):
    """Benchmark-contamination flagging: count per-document collisions
    against an eval shingle set (here: the corpus's own top-5 3-gram
    shingles, deterministically chosen, standing in for a benchmark's
    n-grams). The eval set is broadcast — real benchmarks are tiny
    relative to a 100 TB corpus — so the membership check rides the
    document scan; the only shuffle is the per-doc hit count.

    The shingle table is cached because BOTH sides read it here (the
    eval-set aggregation and the join probe) — uncached, the explode
    pipeline executes twice per run. In production the eval set comes
    from outside the corpus, the probe side is one pass, and nothing
    corpus-sized needs caching."""
    sh = shingle_table(spark, sf_dir).cache()
    eval5 = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("nf"))
        .orderBy(F.desc("nf"), F.asc("s"))
        .limit(5)
        .select("s")
    )
    return (
        sh.join(F.broadcast(eval5), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_hits"))
    )


# ---- canonical document per near-dup cluster --------------------------


@query(
    "q_pipe_canonical",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_DUCK}),
    sig AS (
      SELECT doc_id, {_MIN_EXPRS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {_BAND_SELECTS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                                AND a.doc_id <> b.doc_id
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    labels AS (
      SELECT src AS doc_id,
             CAST(LEAST(src, MIN(dst)) AS BIGINT) AS cluster_id
      FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT l.cluster_id, l.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY l.cluster_id
                                ORDER BY d.n_chars DESC, l.doc_id) AS rn,
             count(*) OVER (PARTITION BY l.cluster_id) AS n_members
      FROM labels l JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           doc_id AS canonical_doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def q_pipe_canonical(spark, sf_dir):
    """Canonical-document selection: after near-dup clustering, keep
    exactly one representative per cluster — the longest document
    (n_chars DESC), doc_id ASC as tiebreak — plus the member count for
    the audit ledger. This is the step that turns a cluster table into
    an actual dedup decision. One window over cluster_id on the label
    table (∝ clustered docs, « corpus size)."""
    labels = q_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = labels.join(docs, "doc_id")
    w = Window.partitionBy("cluster_id")
    ranked = j.select(
        "cluster_id",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("canonical_doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_members").cast("bigint").alias("n_members"),
    )


# ---- end-to-end curation composition ----------------------------------


@query(
    "q_pipe_kept",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_DUCK}),
    sig AS (
      SELECT doc_id, {_MIN_EXPRS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {_BAND_SELECTS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                                AND a.doc_id <> b.doc_id
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    labels AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    ranked AS (
      SELECT l.doc_id,
             row_number() OVER (PARTITION BY l.cluster_id
                                ORDER BY d.n_chars DESC, l.doc_id) AS rn
      FROM labels l JOIN documents d USING (doc_id)
    ),
    dup_losers AS (SELECT doc_id FROM ranked WHERE rn > 1),
    quality AS (
      SELECT doc_id,
             CASE WHEN n_words < 20 THEN 'too_short'
                  WHEN n_words > 80 THEN 'too_long'
                  WHEN awl < 4.8 OR awl > 6.0 THEN 'word_len'
                  WHEN diversity < 0.35 THEN 'repetitive'
                  ELSE 'pass' END AS verdict
      FROM (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               ROUND(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS awl,
               ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 6) AS diversity
        FROM documents
      )
    )
    SELECT d.doc_id AS doc_id,
           CASE WHEN {split_bucket_duck('d.doc_id')} < {SPLIT_TRAIN_LT} THEN 'train'
                WHEN {split_bucket_duck('d.doc_id')} < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents d
    JOIN quality q ON q.doc_id = d.doc_id
    WHERE q.verdict = 'pass'
      AND d.doc_id NOT IN (SELECT doc_id FROM dup_losers)
    """,
)
def q_pipe_kept(spark, sf_dir):
    """End-to-end curation: the composition a real pipeline ships —
    quality-filter the corpus (Gopher rules), near-dup cluster it
    (MinHash-LSH + connected components), keep one canonical doc per
    cluster, and assign the survivors a train/val/test split. Output
    is the kept corpus's (doc_id, split) ledger.

    Built entirely by composing the other registered operators —
    q_pipe_quality_filter, q_dedup_clusters, the canonical ranking,
    q_pipe_split — which is the point: each stage is a bounded-shuffle
    DataFrame transform, so the composition inherits the scale story
    (filter rides the scan; the semi/anti joins key on doc_id; only
    the LSH stage shuffles corpus-sized data)."""
    docs = load_table(spark, sf_dir, "documents")
    quality_pass = (
        q_pipe_quality_filter(spark, sf_dir)
        .filter(F.col("verdict") == "pass")
        .select("doc_id")
    )
    labels = q_dedup_clusters(spark, sf_dir)
    ranked = labels.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("cluster_id").orderBy(
                F.desc("n_chars"), F.asc("doc_id")
            )
        )
        .alias("rn"),
    )
    dup_losers = ranked.filter(F.col("rn") > 1).select("doc_id")
    return (
        docs.join(quality_pass, "doc_id", "left_semi")
        .join(dup_losers, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.when(_bucket() < SPLIT_TRAIN_LT, "train")
            .when(_bucket() < SPLIT_VAL_LT, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
