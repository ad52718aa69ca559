"""Chunking / packing / repetition-removal operators — the tokenizer-
adjacent half of the training-data pipeline (extends operators/
pipeline.py; SURVEY.md §7/M5 family, beyond the reference's own
relational surface, reference src/main.rs:40-57).

Between curation (dedup/quality/PII) and tokenized shards, a corpus
pipeline runs:

- **chunking** — split each document into fixed-size overlapping
  windows (RAG indexing, long-doc truncation). Pure row-local
  expression work: `sequence → posexplode → substring`, no shuffle,
  scan-speed at 100 TB. Exact DuckDB oracle (generate_series +
  unnest).
- **repetition signals** — Gopher-style intra-document repetition
  (duplicate-word fraction, top-bigram fraction) used to drop
  boilerplate/spam. One explode→groupBy per signal, keyed on
  (doc_id, gram): shuffle bytes ∝ distinct grams, map-side combine
  collapses repeats. Exact DuckDB oracle (list_transform + unnest).
- **sequence packing** — greedy first-fit-sequential packing of docs
  into fixed-capacity contexts (padding-free pretraining batches).
  Greedy packing is inherently sequential, so it shards: documents
  hash-bucket deterministically (h60 % NB), each bucket packs its
  docs in doc_id order inside one `applyInPandas` group. Parallelism
  = bucket count; state = one open pack per bucket. EXACT-oracled
  since r11: the per-bucket greedy fold IS SQL-expressible as a
  DuckDB recursive CTE stepping one doc per iteration (see
  q_pipe_pack's oracle below); tests/test_chunking.py additionally
  pins the invariants (every doc packed exactly once, no pack over
  capacity unless single-doc, bit-identical re-runs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.literals import values_df
from datafusion_tpc_spark.functions.digest import _h60_duck, h60
from datafusion_tpc_spark.registry import query

CHUNK_SIZE = 200
CHUNK_STRIDE = 150

PACK_CAPACITY = 600  # chars per packed context (demo scale: ~2 docs)
PACK_BUCKETS = 32


@query(
    "q_pipe_chunk",
    oracle=f"""
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           substring(text, CAST(s + 1 AS INTEGER), {CHUNK_SIZE}) AS chunk_text
    FROM documents,
         UNNEST(generate_series(0, GREATEST(length(text) - 1, 0), {CHUNK_STRIDE}))
           AS t(s)
    ORDER BY doc_id NULLS LAST, chunk_id NULLS LAST
    """,
)
def q_pipe_chunk(spark, sf_dir):
    """Fixed-size overlapping character chunks (size 200, stride 150,
    50-char overlap) — the RAG-indexing / long-context-truncation
    primitive. Chunk starts come from `sequence(0, len-1, stride)`
    so every document yields ≥1 chunk (empty-ish docs produce one
    short chunk) and the final partial chunk keeps the tail.

    Scale: zero shuffle — the explode multiplies rows ~len/stride×
    inside the scan stage and everything stays in WholeStageCodegen;
    output partitioning follows the input, ready for a downstream
    embed/tokenize mapInPandas."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "text",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length("text") - 1, F.lit(0)),
                    F.lit(CHUNK_STRIDE),
                )
            ).alias("chunk_id", "chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.expr(f"substring(text, chunk_start + 1, {CHUNK_SIZE})").alias(
                "chunk_text"
            ),
        )
        # no ORDER BY: the driver's hash compare is order-insensitive,
        # and a global sort of the chunk set would be a pure-waste
        # full shuffle at corpus scale
    )


# words / bigrams on both engines: split on single spaces (the fixture
# text is single-space word salad; real corpora would pre-normalize
# whitespace upstream in q_text_stats' cleaning pass)
_REP_THRESH_DUP = 0.80  # keep if dup_word_frac below
_REP_THRESH_BIGRAM = 0.20  # and top_bigram_frac below


@query(
    "q_pipe_rep",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, w
      FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    ),
    wc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct
      FROM words GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id, bg
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i + 1]
               ) AS bgs
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2
      ), UNNEST(bgs) AS t(bg)
    ),
    bg_counts AS (
      SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
      FROM bigrams GROUP BY doc_id, bg
    ),
    bg_top AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_bigrams,
             MAX(c) AS top_n,
             MIN(bg) FILTER (
               WHERE c = (SELECT MAX(c) FROM bg_counts b2
                          WHERE b2.doc_id = bg_counts.doc_id)
             ) AS top_bigram
      FROM bg_counts GROUP BY doc_id
    )
    SELECT wc.doc_id,
           wc.n_words,
           ROUND(1.0 - CAST(wc.n_distinct AS DOUBLE) / wc.n_words, 6)
             AS dup_word_frac,
           bg_top.top_bigram,
           ROUND(CAST(bg_top.top_n AS DOUBLE) / bg_top.n_bigrams, 6)
             AS top_bigram_frac,
           (1.0 - CAST(wc.n_distinct AS DOUBLE) / wc.n_words
              < {_REP_THRESH_DUP}
            AND CAST(bg_top.top_n AS DOUBLE) / bg_top.n_bigrams
              < {_REP_THRESH_BIGRAM}) AS keep
    FROM wc JOIN bg_top ON wc.doc_id = bg_top.doc_id
    ORDER BY wc.doc_id NULLS LAST
    """,
)
def q_pipe_rep(spark, sf_dir):
    """Intra-document repetition signals (Gopher-style repetition
    filters): duplicate-word fraction and most-frequent-bigram mass,
    plus the keep/drop verdict at the documented thresholds. Ties on
    the top bigram break to the lexicographically smallest so both
    engines agree bit-for-bit.

    Scale: two explode→groupBy passes keyed on (doc_id, gram) —
    map-side combine collapses repeated grams before the shuffle, so
    shuffle bytes ∝ distinct grams per doc, not corpus tokens. The
    final per-doc join is co-keyed on doc_id (both sides already
    hash-partitioned by the groupBy).

    Measured dead ends (sf0.1, don't redo): (a) a "zero-shuffle"
    rewrite counting each distinct gram with nested higher-order
    lambdas (filter() inside transform()) ran 3× SLOWER (2.06 s vs
    0.65 s here) — lambda functions evaluate interpreted, outside
    WholeStageCodegen, so an O(d×n) per-row lambda loses to columnar
    explode+hash-agg even WITH the shuffle; (b) carrying row-local
    word stats through the explode to drop the wc branch + join was
    equally slow (1.98 s) — the pre-explode projection gets collapsed
    past Generate and recomputed per generated row."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    wc = (
        d.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.countDistinct("w").alias("n_distinct"),
        )
    )
    # size(ws) >= 2 on BOTH sides (mirrored by the oracle's len >= 2
    # filter): without it, a single-word doc emits ws[1] out-of-bounds
    # → NULL bigram here while DuckDB's empty range drops the doc
    # entirely (ADVICE r4 — latent on the current fixture).
    bg_counts = (
        d.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i - 1], ' ', ws[i]))")
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_top = bg_counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max("c").alias("top_n"),
        F.expr("min_by(bg, struct(-c, bg))").alias("top_bigram"),
    )
    dup_frac = 1.0 - F.col("n_distinct").cast("double") / F.col("n_words")
    top_frac = F.col("top_n").cast("double") / F.col("n_bigrams")
    return (
        wc.join(bg_top, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(dup_frac, 6).alias("dup_word_frac"),
            "top_bigram",
            F.round(top_frac, 6).alias("top_bigram_frac"),
            ((dup_frac < _REP_THRESH_DUP) & (top_frac < _REP_THRESH_BIGRAM)).alias(
                "keep"
            ),
        )
        # no ORDER BY — see q_pipe_chunk
    )


_PACK_ORACLE = f"""
    WITH RECURSIVE d0 AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             ({_h60_duck("CAST(doc_id AS VARCHAR)")} % {{nb}}) AS bucket
      FROM documents
    ),
    d AS (
      SELECT doc_id, n_chars, bucket,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id ASC)
               AS rn
      FROM d0
    ),
    -- the greedy first-fit-sequential fold, one row per bucket per
    -- step (the q_evt_holt sequential-recurrence pattern): state =
    -- (seq, fill, pos); a doc that does not fit opens a new pack.
    -- All-integer arithmetic, so the trajectory is hash-exact.
    steps AS (
      SELECT bucket, rn, doc_id, n_chars,
             CAST(0 AS BIGINT) AS seq, n_chars AS fill,
             CAST(0 AS BIGINT) AS pos
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.bucket, d.rn, d.doc_id, d.n_chars,
             CASE WHEN s.fill + d.n_chars > {{cap}} THEN s.seq + 1
                  ELSE s.seq END,
             CASE WHEN s.fill + d.n_chars > {{cap}} THEN d.n_chars
                  ELSE s.fill + d.n_chars END,
             CASE WHEN s.fill + d.n_chars > {{cap}} THEN CAST(0 AS BIGINT)
                  ELSE s.pos + 1 END
      FROM steps s JOIN d ON d.bucket = s.bucket AND d.rn = s.rn + 1
    )
    SELECT doc_id, n_chars,
           bucket * 4294967296 + seq AS pack_id,
           pos AS pack_pos,
           fill AS pack_fill
    FROM steps
    ORDER BY doc_id ASC NULLS LAST
    """


@query(
    "q_pipe_pack",
    oracle=_PACK_ORACLE.format(nb=PACK_BUCKETS, cap=PACK_CAPACITY),
)
def q_pipe_pack(spark, sf_dir):
    """Greedy first-fit-sequential sequence packing: assign documents
    to fixed-capacity contexts (PACK_CAPACITY chars) so pretraining
    batches carry minimal padding. Documents shard into PACK_BUCKETS
    deterministic hash buckets (h60(doc_id) % NB — same digest family
    as the dedup/sampling ops); within a bucket, docs pack in doc_id
    order: a doc joins the open pack if it fits, else opens a new
    pack. Oversized docs (> capacity) get a pack of their own —
    packing never truncates; truncation is q_pipe_chunk's job.

    Output: one row per doc — (doc_id, n_chars, pack_id, pack_pos,
    pack_fill). pack_id = bucket * 2^32 + seq is globally unique and
    reproducible run-to-run, cluster-to-cluster.

    Scale: parallelism = bucket count (set ∝ corpus / executor
    count), state per group = one open pack counter — applyInPandas
    streams each bucket's docs through pandas once. The only shuffle
    is the bucket groupBy.

    EXACT-oracled since r11 (VERDICT r10 item 4): the packing rule is
    deterministic per (h60 shard, doc_id order) and all-integer, so
    the greedy fold unrolls as a DuckDB recursive CTE stepping one
    row per bucket per iteration (the q_evt_holt sequential-
    recurrence pattern) — iterations = max bucket depth, buckets
    advance in parallel. Structural invariants additionally live in
    tests/test_chunking.py."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .withColumn("bucket", (h60(F.col("doc_id").cast("string")) % PACK_BUCKETS))
    )

    out_schema = (
        "doc_id long, n_chars long, pack_id long, pack_pos long, pack_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["bucket"].iloc[0])
        seq, fill, pos = 0, 0, 0
        ids, poss, fills = [], [], []
        first = True
        for n in pdf["n_chars"]:
            n = int(n)
            if not first and fill + n > PACK_CAPACITY:
                seq += 1
                fill, pos = 0, 0
            first = False
            fill += n
            ids.append((bucket << 32) + seq)
            poss.append(pos)
            fills.append(fill)
            pos += 1
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_chars": pdf["n_chars"].values,
                "pack_id": ids,
                "pack_pos": poss,
                "pack_fill": fills,
            }
        )

    return d.groupBy("bucket").applyInPandas(pack, out_schema)


_UPSERT_ROWS = [
    (1, "updated text one", "en", "patch"),
    (2, "updated text two", "en", "patch"),
    (99999901, "brand new doc", "de", "patch"),
]


@query(
    "q_pipe_upsert",
    oracle="""
    WITH updates(doc_id, text, lang, source) AS (
      VALUES (1, 'updated text one', 'en', 'patch'),
             (2, 'updated text two', 'en', 'patch'),
             (99999901, 'brand new doc', 'de', 'patch')
    ),
    all_rows AS (
      SELECT doc_id, text, lang, source, 0 AS version FROM documents
      UNION ALL
      SELECT doc_id, text, lang, source, 1 AS version FROM updates
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
           CAST(version AS INTEGER) AS version,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM all_rows
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY version DESC) = 1
    """,
)
def q_pipe_upsert(spark, sf_dir):
    """Upsert / MERGE-INTO pattern at the engine level: apply a patch
    batch (updated + brand-new documents) to the corpus, latest
    version wins. Implemented as ANTI-JOIN + UNION — base rows whose
    doc_id appears in the patch are dropped via a broadcast left-anti
    join, then the patch is unioned in. This beats the
    window/row_number formulation the oracle uses (same result): the
    anti join broadcasts the (always small) patch keys and never
    sorts, while row_number would range-partition and sort the whole
    corpus. In a lakehouse deployment this is `MERGE INTO` on
    Delta/Iceberg; the plan underneath is exactly this shape.

    Scale: one broadcast anti join (patch keys ≪ corpus) + a
    metadata-only union — no shuffle of the base table at all."""
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    updates = values_df(
        spark, _UPSERT_ROWS, "doc_id long, text string, lang string, source string"
    )
    merged = (
        base.join(F.broadcast(updates.select("doc_id")), "doc_id", "left_anti")
        .withColumn("version", F.lit(0))
        .unionByName(updates.withColumn("version", F.lit(1)))
    )
    return merged.select(
        "doc_id",
        "lang",
        "source",
        "version",
        F.length("text").cast("bigint").alias("n_chars"),
    )
