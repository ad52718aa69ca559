"""Readability scoring (round 7) — the Flesch reading-ease family of
surface statistics, the curation signal quality-filter stacks use
alongside length/punctuation ratios (q_text_quality) and language ID
(q_text_lang): per-language corpus readability from word, sentence,
and syllable-proxy counts.

Beyond-reference surface (the reference engine — thinkharderdev/
datafusion-tpc — has no text layer).

The syllable proxy is the vowel-group count ([aeiouy]+ runs), the
standard cheap stand-in for hyphenation dictionaries; sentences floor
at 1 per document so punctuation-free synthetic docs don't divide by
zero. All three counts come from one regexp_extract_all pass each —
character-class regexes whose semantics are identical between Java
regex (Spark) and RE2 (DuckDB).

Exactness (the q_dq_calibration integer discipline): per-language
Σwords, Σsentences, Σsyllables are exact BIGINT sums; the Flesch
expression 206.835 − 1.015·(W/S) − 84.6·(Y/W) is two divisions and
two multiplies over those integers with literal double constants —
one deterministic IEEE expression per output row, then ROUND 6.

100 TB: one scan, row-local regex counting, |languages|-key
map-side-combinable agg — exactly as expensive as the quality filter
already being run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_text_readability",
    oracle="""
    WITH c AS (
      SELECT lang,
             CAST(length(regexp_extract_all(lower(text), '[a-z]+'))
                  AS BIGINT) AS w,
             CAST(GREATEST(length(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS s,
             CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS y
      FROM documents
    ),
    g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS words,
             CAST(SUM(s) AS BIGINT) AS sents,
             CAST(SUM(y) AS BIGINT) AS syls
      FROM c GROUP BY lang
    )
    SELECT lang, n_docs, words, sents, syls,
           ROUND(words * 1.0 / sents, 6) AS words_per_sent,
           ROUND(syls * 1.0 / NULLIF(words, 0), 6) AS syls_per_word,
           ROUND(206.835 - 1.015 * (words * 1.0 / sents)
                 - 84.6 * (syls * 1.0 / NULLIF(words, 0)), 6) AS flesch
    FROM g
    ORDER BY lang ASC NULLS LAST
    """,
)
def q_text_readability(spark, sf_dir):
    """Per-language Flesch reading ease from corpus-level word /
    sentence / vowel-group counts (module docstring): n_docs, the
    three integer totals, words-per-sentence, syllables-per-word, and
    the Flesch score — the curation-time readability gate."""
    c = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0)))
        .cast("bigint")
        .alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
            F.lit(1),
        )
        .cast("bigint")
        .alias("s"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        )
        .cast("bigint")
        .alias("y"),
    )
    g = c.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("words"),
        F.sum("s").cast("bigint").alias("sents"),
        F.sum("y").cast("bigint").alias("syls"),
    )
    wps = F.col("words") * 1.0 / F.col("sents")
    # NULLIF guard (degenerate-sweep r11): a language slice whose docs
    # contain no [a-z]+ words (e.g. all-empty docs) has words = 0 —
    # under ANSI the bare division THROWS; NULL flesch is the contract.
    spw = F.col("syls") * 1.0 / F.nullif(F.col("words"), F.lit(0))
    return g.select(
        "lang",
        "n_docs",
        "words",
        "sents",
        "syls",
        F.round(wps, 6).alias("words_per_sent"),
        F.round(spw, 6).alias("syls_per_word"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6).alias("flesch"),
    ).orderBy(F.col("lang").asc_nulls_last())
