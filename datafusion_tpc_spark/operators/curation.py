"""Corpus-curation operators (r6) — right-to-be-forgotten purge and
BPE tokenizer TRAINING (two argmax-merge rounds): governance and
tokenizer stages of a training-data pipeline, extending
operators/pipeline.py (quality/PII/contamination) and the pair-count
pass of operators/sketches.py::q_pipe_bpe. North-star extension
(SURVEY.md §7/M5) — no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query

# "Takedown" sources standing in for a forget-list feed: in
# production the list arrives as bare ids from a compliance system;
# deriving it from `source` here keeps the fixture self-contained
# while the purge itself consumes ONLY the id column.
_FORGET_SOURCES = ("src7", "src13")


@query(
    "q_pipe_forget",
    oracle=f"""
    WITH forget AS (
      SELECT doc_id FROM documents
      WHERE source IN {_FORGET_SOURCES!r}
    ),
    kept AS (
      SELECT d.* FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.doc_id = d.doc_id)
    ),
    kept_stats AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS bytes_kept
      FROM kept GROUP BY lang
    ),
    total_stats AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
      FROM documents GROUP BY lang
    )
    SELECT t.lang, k.n_kept, k.bytes_kept,
           t.n_total - COALESCE(k.n_kept, 0) AS n_purged
    FROM total_stats t LEFT JOIN kept_stats k USING (lang)
    ORDER BY t.lang ASC NULLS LAST
    """,
)
def q_pipe_forget(spark, sf_dir):
    """Right-to-be-forgotten purge with an audit report: drop every
    document on a forget-list (ids only — the shape a compliance feed
    has) via LEFT ANTI join, then report per-language kept/purged
    counts and kept bytes so the deletion is *evidenced*, not just
    executed.

    Plan shape: the forget-list is broadcast (takedown lists are
    tiny relative to any corpus) so the purge rides the document scan
    with zero extra shuffle — the same broadcast-anti pattern as
    q_tpch_q16's blacklist; the audit is one map-side-combined
    aggregation each over kept and total. 100 TB: this is exactly how
    GDPR deletion passes run — rewrite the table minus a broadcast
    tombstone set; the LEFT JOIN of the two stat tables keeps
    languages whose every document was purged visible (n_kept NULL →
    reported via COALESCE-d n_purged)."""
    docs = load_table(spark, sf_dir, "documents")
    forget = docs.filter(F.col("source").isin(*_FORGET_SOURCES)).select("doc_id")
    kept = docs.join(F.broadcast(forget), "doc_id", "left_anti")
    kept_stats = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum(F.octet_length("text")).cast("bigint").alias("bytes_kept"),
    )
    total_stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return (
        total_stats.join(kept_stats, "lang", "left")
        .select(
            "lang",
            "n_kept",
            "bytes_kept",
            (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_purged"
            ),
        )
        .orderBy(F.col("lang").asc_nulls_last())
    )


@query(
    "q_pipe_curriculum",
    oracle="""
    WITH binned AS (
      SELECT lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(NTILE(4) OVER (PARTITION BY lang
                                 ORDER BY n_chars ASC, doc_id ASC) AS INT)
               AS difficulty_bin
      FROM documents
    )
    SELECT lang, difficulty_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM binned
    GROUP BY lang, difficulty_bin
    ORDER BY lang ASC NULLS LAST, difficulty_bin ASC NULLS LAST
    """,
)
def q_pipe_curriculum(spark, sf_dir):
    """Curriculum binning — order training data easy→hard and cut it
    into per-language quartiles (difficulty proxy: document length),
    the curriculum-learning data layout. NTILE(4) per language with a
    doc_id tie-break makes bucket membership deterministic; the
    rollup reports per-bin doc counts, mean length, and the token
    budget each curriculum stage will feed the trainer.

    Plan shape: one window over lang partitions (each language sorts
    independently — no global sort) + one map-side-combined rollup.
    100 TB: per-partition NTILE is the only ranked piece; with
    billions of docs per language the cut switches to quantile
    thresholds (q_agg_tdigest) joined broadcast — bin semantics
    identical, sort eliminated."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    binned = docs.select(
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.ntile(4).over(w).cast("int").alias("difficulty_bin"),
    )
    return (
        binned.groupBy("lang", "difficulty_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy(
            F.col("lang").asc_nulls_last(),
            F.col("difficulty_bin").asc_nulls_last(),
        )
    )


_BPE_TOP = 5  # merge candidates reported per round


@query(
    "q_pipe_bpe_train",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM words GROUP BY w),
    spaced AS (
      SELECT concat(' ', rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')), ' ') AS s, f
      FROM wf WHERE length(w) >= 2
    ),
    p1 AS (
      SELECT l[i.i] || ' ' || l[i.i + 1] AS pair, SUM(f) AS cnt
      FROM (SELECT string_split(trim(s), ' ') AS l, f FROM spaced) t,
           LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) i
      GROUP BY 1
    ),
    top1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
    merged AS (
      SELECT replace(s, ' ' || (SELECT pair FROM top1) || ' ',
                     ' ' || replace((SELECT pair FROM top1), ' ', '') || ' ') AS s,
             f
      FROM spaced
    ),
    p2 AS (
      SELECT l[i.i] || ' ' || l[i.i + 1] AS pair, SUM(f) AS cnt
      FROM (SELECT string_split(trim(s), ' ') AS l, f FROM merged) t,
           LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) i
      GROUP BY 1
    ),
    r1 AS (
      SELECT 1 AS rnd,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS INT) AS rk,
             pair, CAST(cnt AS BIGINT) AS cnt
      FROM p1
    ),
    r2 AS (
      SELECT 2 AS rnd,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS INT) AS rk,
             pair, CAST(cnt AS BIGINT) AS cnt
      FROM p2
    )
    SELECT rnd, rk, pair, cnt
    FROM (SELECT * FROM r1 WHERE rk <= {_BPE_TOP}
          UNION ALL
          SELECT * FROM r2 WHERE rk <= {_BPE_TOP})
    ORDER BY rnd ASC NULLS LAST, rk ASC NULLS LAST
    """,
)
def q_pipe_bpe_train(spark, sf_dir):
    """BPE tokenizer training, two merge rounds: count adjacent
    symbol pairs over the word-frequency table, pick the argmax pair
    (count DESC, pair ASC tie-break — fully deterministic), APPLY the
    merge, and recount — reporting the top-5 merge candidates of each
    round. This is the loop production BPE trainers run ~50k times;
    two rounds pin the whole mechanism (count → argmax → apply →
    recount) with an exact oracle.

    Representation: words become sentinel-padded spaced symbols
    (' k e y '); a merge replaces ' a b ' with ' ab ' — the padding
    makes symbol boundaries explicit so 'b' inside a merged 'ab'
    can never false-match a neighboring pair. Replacement is
    left-to-right non-overlapping in ONE pass on both engines
    (Java String.replace ≡ DuckDB replace), which under-merges
    back-to-back repeats ('a a a a' → 'aa a a' not 'aa aa') — a
    deliberate, documented single-pass semantics, identical
    cross-engine.

    Scale (the q_pipe_bpe structural trick, sketches.py): every pass
    runs over the VOCABULARY-sized word-frequency table, weighted by
    corpus frequency — corpus size touches only the initial word
    count; each merge round is vocabulary-bound (one tiny argmax
    broadcast + one row-local replace + one pair re-count). 100 TB
    changes the word-count pass only."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    spaced = wf.filter(F.length("w") >= 2).select(
        F.concat(
            F.lit(" "),
            F.rtrim(F.regexp_replace("w", "(.)", "$1 ")),
            F.lit(" "),
        ).alias("s"),
        "f",
    )

    def pair_counts(df):
        pairs = F.expr(
            "transform(sequence(1, size(split(trim(s), ' ')) - 1),"
            " i -> concat(element_at(split(trim(s), ' '), i), ' ',"
            "             element_at(split(trim(s), ' '), i + 1)))"
        )
        return (
            df.select(F.explode(pairs).alias("pair"), "f")
            .groupBy("pair")
            .agg(F.sum("f").cast("bigint").alias("cnt"))
        )

    p1 = pair_counts(spaced)
    top1 = p1.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1).select(
        F.col("pair").alias("mpair")
    )
    merged = spaced.crossJoin(F.broadcast(top1)).select(
        F.replace(
            F.col("s"),
            F.concat(F.lit(" "), F.col("mpair"), F.lit(" ")),
            F.concat(
                F.lit(" "), F.replace(F.col("mpair"), F.lit(" "), F.lit("")), F.lit(" ")
            ),
        ).alias("s"),
        "f",
    )
    p2 = pair_counts(merged)

    def ranked(df, rnd):
        w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
        return (
            df.withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= _BPE_TOP)
            .select(F.lit(rnd).cast("int").alias("rnd"), "rk", "pair", "cnt")
        )

    return ranked(p1, 1).unionAll(ranked(p2, 2)).orderBy(
        F.col("rnd").asc_nulls_last(), F.col("rk").asc_nulls_last()
    )


_SHARD_BYTES = 20_000  # per-shard byte budget


@query(
    "q_pipe_shard",
    oracle=f"""
    WITH sized AS (
      SELECT source, doc_id, octet_length(encode(text)) AS nb
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, nb,
             SUM(nb) OVER (PARTITION BY source ORDER BY doc_id ASC
                           ROWS UNBOUNDED PRECEDING) - nb AS bytes_before
      FROM sized
    ),
    assigned AS (
      SELECT source, doc_id, nb,
             CAST(bytes_before // {_SHARD_BYTES} AS INT) AS shard_id
      FROM cum
    )
    SELECT source, shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nb) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM assigned
    GROUP BY source, shard_id
    ORDER BY source ASC NULLS LAST, shard_id ASC NULLS LAST
    """,
)
def q_pipe_shard(spark, sf_dir):
    """Byte-budget dataset sharding — the webdataset/TFRecord prep
    step: pack each source's documents, in deterministic doc_id
    order, into ~20 KB shards by cumulative byte offset (a document
    lands in shard floor(bytes_before/budget) — the greedy
    streaming-append rule every shard writer implements). Output is
    the shard manifest: doc count, realized bytes, id range per
    shard — what the training loader consumes.

    Cross-engine exactness: byte lengths are integers and the running
    sum is an integer window fold — bit-exact; `// budget` is integer
    division (epoch-math convention).

    Scale: the window partitions by SOURCE — each source packs
    independently (exactly how production sharding parallelizes);
    no global ordering exists anywhere. A source too big for one
    task gets range-split by id first and the budget applied per
    range with offset carry — same manifest semantics; the
    per-source running sum here is the honest single-writer form."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sized = docs.select(
        "source", "doc_id", F.octet_length("text").alias("nb")
    )
    assigned = sized.select(
        "source",
        "doc_id",
        "nb",
        ((F.sum("nb").over(w) - F.col("nb")) / _SHARD_BYTES)
        .cast("int")
        .alias("shard_id"),
    )
    return (
        assigned.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nb").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy(F.col("source").asc_nulls_last(), F.col("shard_id").asc_nulls_last())
    )
