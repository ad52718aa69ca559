"""Text analysis operators — north-star extension (SURVEY.md §7/M5).

Per-document quality/statistics signals a training-data pipeline
computes before filtering: length stats, token counts (whitespace +
regex "BPE-ish"), punctuation/digit/stopword ratios, heuristic
language ID, and rolling-hash-style fingerprints.

Everything is built-in string expressions (JVM codegen, no Python) —
these run at scan speed and scale linearly; the only shuffle anywhere
is if a downstream groupBy wants corpus-level stats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.functions.digest import h60
from datafusion_tpc_spark.registry import query

_PUNCT = r"[.,!?;:]"
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# stopword markers per language — counted as substring hits on the
# padded text so word boundaries are exact on both engines
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " is "],
    "de": [" der ", " und ", " die ", " ist "],
    "fr": [" le ", " la ", " et ", " est "],
    "es": [" el ", " los ", " que ", " es "],
}


def _hits(padded_col_sql: str, needle: str) -> str:
    """SQL expression counting non-overlapping occurrences of `needle`
    — identical text on both engines."""
    n = len(needle)
    return f"(length({padded_col_sql}) - length(replace({padded_col_sql}, '{needle}', ''))) / {n}"


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_hits("padded", m) for m in _LANG_MARKERS[lang])


@query(
    "q_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           ROUND(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS avg_word_len,
           CAST(length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')) AS BIGINT)
             AS n_punct,
           ROUND((length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')))
                 * 1.0 / NULLIF(length(text), 0), 6) AS punct_ratio,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
             AS n_digits,
           CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_text_stats(spark, sf_dir):
    """Quality-signal stats: char/word/token counts, average word
    length, punctuation + digit counts/ratios. The regex token count
    is the BPE-ish proxy (letters|digits|other runs)."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    words = F.split(F.col("text"), " ")
    stripped_punct = F.regexp_replace(F.col("text"), _PUNCT, "")
    stripped_digit = F.regexp_replace(F.col("text"), "[0-9]", "")
    return d.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        F.size(words).cast("bigint").alias("n_words"),
        F.round(n_chars / F.size(words), 6).alias("avg_word_len"),
        (n_chars - F.length(stripped_punct)).cast("bigint").alias("n_punct"),
        F.round(
            (n_chars - F.length(stripped_punct))
            / F.nullif(n_chars, F.lit(0)),
            6,
        ).alias("punct_ratio"),
        (n_chars - F.length(stripped_digit)).cast("bigint").alias("n_digits"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_TOKEN_RE}', 0)"))
        .cast("bigint")
        .alias("n_tokens"),
    )


_LANG_CASE = f"""
    CASE
      WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      WHEN {_lang_score_sql("en")} >= {_lang_score_sql("de")}
       AND {_lang_score_sql("en")} >= {_lang_score_sql("fr")}
       AND {_lang_score_sql("en")} >= {_lang_score_sql("es")} THEN 'en'
      WHEN {_lang_score_sql("de")} >= {_lang_score_sql("fr")}
       AND {_lang_score_sql("de")} >= {_lang_score_sql("es")} THEN 'de'
      WHEN {_lang_score_sql("fr")} >= {_lang_score_sql("es")} THEN 'fr'
      ELSE 'es'
    END
"""


@query(
    "q_text_lang",
    oracle=f"""
    WITH p AS (SELECT doc_id, lang, concat(' ', lower(text), ' ') AS padded, text
               FROM documents)
    SELECT doc_id, lang AS lang_actual, {_LANG_CASE} AS lang_pred
    FROM p
    """,
)
def q_text_lang(spark, sf_dir):
    """Heuristic language ID: CJK char range → zh, else argmax of
    per-language stopword hit counts. Pure SQL CASE — identical
    expression both engines; accuracy vs the fixture's `lang` label is
    property-tested separately (the oracle checks engine parity, not
    truth)."""
    d = load_table(spark, sf_dir, "documents")
    # Spark: `text rlike pattern`; DuckDB: regexp_matches(text, pattern)
    spark_case = _LANG_CASE.replace("regexp_matches(text, ", "rlike(text, ")
    return (
        d.withColumn("padded", F.concat(F.lit(" "), F.lower("text"), F.lit(" ")))
        .select(
            "doc_id",
            F.col("lang").alias("lang_actual"),
            F.expr(spark_case).alias("lang_pred"),
        )
    )


@query(
    "q_text_fingerprint",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS s
      FROM tok, LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-2, 1))) AS i) g
    )
    SELECT doc_id,
           CAST(MIN(CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS BIGINT)
             AS fingerprint,
           substr(md5(concat_ws('', MIN(s), MAX(s))), 1, 8) AS sketch
    FROM sh GROUP BY doc_id
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprint: min shingle-hash (1-permutation MinHash —
    the rolling-hash fingerprint of SURVEY §7/M5) plus an 8-hex sketch
    of the lexicographic shingle extremes.

    100 TB shape: ZERO shuffle. A document's shingles live in its own
    row, so min-hash and lexicographic extremes are array folds
    (array_min/array_max over transform) — per-row, scan-speed, stays
    in WholeStageCodegen. The earlier explode+groupBy form paid a
    per-shingle row blowup and a per-doc shuffle for aggregates that
    never needed to cross rows; this one shuffles nothing at all."""
    d = load_table(spark, sf_dir, "documents")
    sh = F.expr(
        "transform(sequence(1, greatest(size(w) - 2, 1)),"
        " i -> concat_ws(' ', get(w, i-1), get(w, i), get(w, i+1)))"
    )
    return (
        d.withColumn("w", F.split("text", " "))
        .withColumn("sh", sh)
        .select(
            "doc_id",
            F.array_min(F.transform(F.col("sh"), h60)).cast("bigint").alias(
                "fingerprint"
            ),
            F.substring(
                F.md5(F.concat(F.array_min("sh"), F.array_max("sh"))), 1, 8
            ).alias("sketch"),
        )
    )


@query(
    "q_text_quality",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
    )
    SELECT doc_id, lang,
           ROUND(n_uniq * 1.0 / n_words, 6) AS lexical_diversity,
           CASE WHEN n_words BETWEEN 20 AND 1000
                 AND n_uniq * 1.0 / n_words > 0.2 THEN true ELSE false END AS keep
    FROM s
    """,
)
def q_text_quality(spark, sf_dir):
    """Quality score/filter: lexical diversity (unique/total words) +
    a keep/drop decision — the shape of a pretraining quality gate."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_uniq = F.size(F.array_distinct(words))
    diversity = n_uniq / n_words
    return d.select(
        "doc_id",
        "lang",
        F.round(diversity, 6).alias("lexical_diversity"),
        (n_words.between(20, 1000) & (diversity > 0.2)).alias("keep"),
    )


@query(
    "q_text_vocab",
    oracle="""
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    GROUP BY w
    ORDER BY c DESC NULLS LAST, w ASC NULLS LAST
    LIMIT 50
    """,
)
def q_text_vocab(spark, sf_dir):
    """Corpus vocabulary head: top-50 unigrams by frequency with a
    deterministic lexicographic tie-break — the vocabulary-building /
    tokenizer-training first pass.

    Scale: explode → groupBy(word) with map-side combine (shuffle
    bytes ∝ distinct vocabulary, not corpus tokens), then the top-50
    is TakeOrderedAndProject — per-partition heaps merged on the
    driver, never a global sort of the vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc_nulls_last(), F.col("word").asc_nulls_last())
        .limit(50)
    )

