"""Content-defined chunking (CDC) — the rolling-hash boundary
splitter behind storage-level dedup (LBFS/rsync/FastCDC family): cut
a document wherever the hash of its local 8-gram hits a mask, so
chunk boundaries survive insertions/deletions and shared substrings
across documents hash to identical chunks.

Beyond-reference surface (the reference engine — thinkharderdev/
datafusion-tpc — has no text layer); companion to q_pipe_chunk
(fixed-window splitting, whose boundaries shift under edits) and the
near-dup family in operators/dedup.py (document-level; THIS is the
sub-document dedup signal).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import cpu_width, load_table
from datafusion_tpc_spark.registry import query

_W = 8     # rolling gram width
_MASK = 64  # boundary when hash(gram) % _MASK == 0 → ~64-char chunks

# Rabin-style polynomial fingerprint weights: B^k mod M for
# B=1000003, M=2^31-1 (Mersenne prime — a power-of-2 modulus would
# make `% _MASK` depend on only the last char). Precomputed so both
# engines evaluate a pure integer dot product per gram — no
# transcendental, no md5-per-position.
_POLY_M = 2147483647
_POLY_W = [1, 1000003, 1426104154, 1049561761, 1604566856, 1953433226,
           2061642598, 57298384]


def _gram_hash(cs: str, i: str, get: str) -> str:
    """SQL fragment: polynomial hash of the 8-gram of code array
    `cs` starting at 1-based position `i`. `get` is the engine's
    1-based list accessor — `element_at` on Spark, `list_extract`
    on DuckDB (bracket indexing is 0-based on Spark, 1-based on
    DuckDB, so it is never used)."""
    terms = " + ".join(
        f"{get}({cs}, {i} + {k}) * {w}" if k else f"{get}({cs}, {i}) * {w}"
        for k, w in enumerate(_POLY_W)
    )
    return f"(({terms}) % {_POLY_M})"


@query(
    "q_pipe_cdc",
    oracle=f"""
    WITH cs0 AS (
      SELECT source, doc_id, text,
             list_transform(string_split(text, ''),
                            c -> CAST(ascii(c) AS BIGINT)) AS cs
      FROM documents
    ),
    p AS (
      SELECT source, doc_id, text,
             CASE WHEN length(text) >= {_W} THEN
               list_filter(range(1, length(text) - {_W} + 2),
                 i -> {_gram_hash("cs", "i", "list_extract")} % {_MASK} = 0)
             ELSE []::BIGINT[] END AS pos
      FROM cs0
    ),
    e AS (
      SELECT source, doc_id, text,
             list_sort(list_distinct(list_concat(
               list_transform(pos, x -> x + {_W} - 1),
               [CAST(length(text) AS BIGINT)]))) AS ends
      FROM p
    ),
    ch AS (
      SELECT source, text,
             CASE WHEN k = 1 THEN 0 ELSE ends[k - 1] END AS prev,
             ends[k] AS e
      FROM e, LATERAL (SELECT unnest(generate_series(1, len(ends))) AS k)
    ),
    h AS (
      SELECT source, e - prev AS clen,
             md5(substr(text, CAST(prev + 1 AS INT), CAST(e - prev AS INT)))
               AS chash
      FROM ch
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chash) AS BIGINT) AS n_uniq,
           CAST(SUM(clen) AS BIGINT) AS sum_len,
           ROUND(SUM(clen) * 1.0 / COUNT(*), 6) AS avg_len,
           ROUND(COUNT(DISTINCT chash) * 1.0 / COUNT(*), 6) AS dedup_ratio
    FROM h GROUP BY source
    ORDER BY source ASC NULLS LAST
    """,
)
def q_pipe_cdc(spark, sf_dir):
    """Content-defined chunking + chunk-hash dedup profile: boundary
    wherever the Rabin-style polynomial fingerprint of the local
    8-gram ≡ 0 (mod 64) — expected ~64-char chunks — then roll up
    per source: chunk count, distinct chunk hashes, byte volume,
    average chunk length, and the dedup ratio (distinct/total — the
    fraction of chunk storage that survives dedup; duplicate
    documents share every chunk, so the fixture's planted near-dups
    pull it below 1).

    Determinism: boundaries are a pure-integer dot product of
    precomputed B^k mod M weights over the char-code array (no
    float, no per-position md5 — the first cut hashed md5 per
    character position and cost 5.8 s at sf0.1; this form is ~20×
    cheaper), ends are sorted integer offsets, and the two ratios
    are single integer divisions ROUND(6)-ed; md5 runs once per
    CHUNK for identity. 100 TB: the per-row HOFs (char-code
    transform + unrolled filter) are whole-stage codegen — no
    Python; the only shuffle is the per-source distinct-count
    aggregate whose keys are 32-char chunk hashes (bounded by chunk
    count, with partial aggregation). The sum/avg rollup is map-side
    combined; a giant document costs O(|doc|) integer ops in its own
    task, never a cross-row dependency."""
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    # ONE-PASS expression discipline: Catalyst collapses stacked
    # projections, so a column reference to an intermediate array
    # (cs/pos/ends) re-INLINES its whole defining expression at every
    # use site — with element_at(cs, i+k) inside the per-position
    # lambda that turned the boundary scan O(|doc|²) and hung the
    # sf0.1 bench. Instead every intermediate is bound exactly once
    # via the transform(array(x), v -> …)[1] let-binding idiom
    # (lambda variables are evaluated once), and the 8-term gram hash
    # is an elementwise zip_with chain over SHIFTED SLICES of the
    # code array — O(8·|doc|) total, no positional element_at at all.
    cs_s = "transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))"
    width = f"greatest(length(text) - {_W} + 1, 0)"
    # H[i] = sum_k cs[i+k]·W_k (mod M), i = 1..n-W+1, via shifted slices
    terms = [
        f"transform(slice(cs, {k + 1}, {width}), c -> c * {w})"
        for k, w in enumerate(_POLY_W)
    ]
    h = terms[0]
    for t in terms[1:]:
        h = f"zip_with({h}, {t}, (x, y) -> x + y)"
    bounds = (
        f"filter(transform({h}, (v, k) -> "
        f"IF(v % {_POLY_M} % {_MASK} = 0, CAST(k + {_W} AS BIGINT), "
        f"CAST(-1 AS BIGINT))), x -> x >= 0)"
    )
    ends = (
        f"array_sort(array_distinct(concat({bounds}, "
        f"array(CAST(length(text) AS BIGINT)))))"
    )
    pairs = (
        # let-bind ends (referenced 3×: zip arg, slice, size)
        f"element_at(transform(array({ends}), a -> "
        f"zip_with(a, concat(array(CAST(0 AS BIGINT)), slice(a, 1, size(a) - 1)), "
        f"(e, p) -> struct(e - p AS clen, "
        f"md5(substring(text, CAST(p + 1 AS INT), CAST(e - p AS INT))) AS chash))"
        f"), 1)"
    )
    # let-bind cs (referenced by the 8 slices)
    chunk_arr = f"element_at(transform(array({cs_s}), cs -> {pairs}), 1)"
    chunks = (
        # testdata ships single-row-group parquet — unsplittable, so
        # the CPU-dense chunking would run in ONE task; fan the rows
        # out first (q_dedup_prefix AQE-coalescing precedent).
        d.repartition(cpu_width(spark), "doc_id")
        .select("source", F.explode(F.expr(chunk_arr)).alias("ch"))
        .select("source", F.col("ch.clen").alias("clen"), F.col("ch.chash").alias("chash"))
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("chash").cast("bigint").alias("n_uniq"),
            F.sum("clen").cast("bigint").alias("sum_len"),
        )
        .select(
            "source",
            "n_chunks",
            "n_uniq",
            "sum_len",
            F.round(F.col("sum_len") * 1.0 / F.col("n_chunks"), 6).alias("avg_len"),
            F.round(F.col("n_uniq") * 1.0 / F.col("n_chunks"), 6).alias(
                "dedup_ratio"
            ),
        )
        .orderBy(F.col("source").asc_nulls_last())
    )
