"""Sequence-length bucketing / padding-waste analysis — the batching
efficiency audit every training run does before choosing packing vs
padding: bucket documents by power-of-two token capacity and report
how many pad tokens fixed-shape batches would burn per bucket.

Beyond-reference surface (the reference engine — thinkharderdev/
datafusion-tpc — has no pipeline layer); companion to
operators/chunking.py's q_pipe_pack (first-fit sequence packing — the
FIX for the waste this op measures) and q_pipe_chunk (fixed-window
splitting).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_pipe_lenbucket",
    oracle="""
    WITH t AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT n_tok,
             CASE WHEN n_tok <= 1 THEN 1
                  ELSE 1 << length(bin(n_tok - 1)) END AS cap
      FROM t
    )
    SELECT CAST(cap AS BIGINT) AS bucket_cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(SUM(cap - n_tok) AS BIGINT) AS pad_tokens,
           ROUND(SUM(n_tok) * 1.0 / (COUNT(*) * cap), 6) AS fill_ratio
    FROM b GROUP BY cap
    ORDER BY bucket_cap ASC NULLS LAST
    """,
)
def q_pipe_lenbucket(spark, sf_dir):
    """Length-bucket batching audit: assign each document to the
    smallest power-of-two token capacity that holds it (the bucketed
    batching scheme), then report per-bucket document count, real
    tokens, pad tokens a fixed-shape batch would add, and the fill
    ratio — the number that decides whether sequence packing
    (q_pipe_pack) is worth its shuffle.

    Determinism: the bucket cap is integer bit-length, not log2 —
    `1 << length(bin(n-1))` evaluates identically on Spark and DuckDB
    (the q_agg_hll rho pattern; caps ≤ 2^31 by construction since
    token counts are document-bounded); fill_ratio is ONE integer
    division ROUND(6)-ed. 100 TB: stateless per-row map into a
    ≤~20-group aggregate with map-side combine — corpus size touches
    only the scan."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    cap = F.when(F.col("n_tok") <= 1, F.lit(1)).otherwise(
        F.expr("shiftleft(1, length(bin(n_tok - 1)))")
    )
    return (
        d.select(n_tok.alias("n_tok"))
        .select("n_tok", cap.cast("bigint").alias("cap"))
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
            F.sum(F.col("cap") - F.col("n_tok")).cast("bigint").alias("pad_tokens"),
        )
        .select(
            F.col("cap").alias("bucket_cap"),
            "n_docs",
            "sum_tokens",
            "pad_tokens",
            F.round(
                F.col("sum_tokens") * 1.0 / (F.col("n_docs") * F.col("cap")), 6
            ).alias("fill_ratio"),
        )
        .orderBy(F.col("bucket_cap").asc_nulls_last())
    )
