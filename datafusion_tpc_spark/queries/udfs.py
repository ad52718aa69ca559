"""UDF surface — SURVEY.md §2.11.

Reference exposes `create_udf` (scalar Rust fn over Arrow arrays) and
`create_udaf` (Tier B, reference Cargo.toml:15). Spark analog of the
Arrow-columnar scalar UDF is the vectorized pandas_udf; the UDAF
analog (grouped-agg pandas_udf) is q_udaf in aggregates.py.

Scale notes: pandas UDFs move Arrow batches across the JVM↔Python
boundary — ~10-100× faster than row-at-a-time Python UDFs but still
off the codegen fast path. The declared UDFs compute SQL-expressible
math precisely so the oracle can verify the plumbing; in production
these slots hold logic that genuinely can't be expressed in SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
             AS charged
    FROM lineitem
    """,
)
def q_udf(spark, sf_dir):
    """Vectorized scalar UDF (Arrow batches) — the Spark analog of
    DF's create_udf over Arrow arrays (SURVEY §2.11). Same arithmetic
    stated in SQL on the oracle side."""

    @F.pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


@query(
    "q_udf_iter",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_py,
           CAST(length(string_split(text, ' ')) AS BIGINT) AS n_words_py
    FROM documents
    """,
)
def q_udf_iter(spark, sf_dir):
    """mapInPandas — per-partition Arrow batch iterator (the shape used
    for custom scans/operators; SURVEY §2.11 / pyspark guide). Returns
    deterministic text stats so DuckDB can verify."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_py": pdf["text"].str.len().astype("int64"),
                    "n_words_py": pdf["text"].str.split(" ").str.len().astype("int64"),
                }
            )

    return d.mapInPandas(stats, schema="doc_id long, n_chars_py long, n_words_py long")


@query(
    "q_udf_grouped_map",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ROUND(o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderpriority), 2)
             AS demeaned
    FROM orders
    """,
)
def q_udf_grouped_map(spark, sf_dir):
    """applyInPandas grouped-map — per-group pandas transform
    (demeaning), verified against the window-function formulation.

    Scale note: grouped-map materializes each whole group in one
    Python worker, and per-group overhead is ~1ms — so the right shape
    is FEW LARGE groups (here: 5 priority classes), never
    high-cardinality keys (grouping the same data by o_custkey is
    ~30× slower: 15k tiny groups of ~10 rows). For per-row math use a
    scalar pandas_udf (q_udf); for high-cardinality demeaning use the
    window form the oracle shows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_orderpriority", "o_orderkey"]].copy()
        # round to 2dp: pandas' pairwise summation and the oracle's
        # sequential AVG differ at ~1e-13, which flips 6dp rounding on
        # boundary values; 2dp keeps the compare deterministic
        out["demeaned"] = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()).round(2)
        return out

    return o.groupBy("o_orderpriority").applyInPandas(
        demean, schema="o_orderpriority string, o_orderkey long, demeaned double"
    )


@query(
    "q_udtf",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t,
         LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g
    """,
)
def q_udtf(spark, sf_dir):
    """Python UDTF (Spark 4, SURVEY §2.11): a table function LATERAL-
    joined per input row — the user-extensible generator slot (the
    built-in generator surface is q_explode/posexplode). This one
    tokenizes with positions, so the DuckDB oracle states the same
    expansion via unnest(generate_series).

    Scale note: Python UDTFs are row-at-a-time — the documented slow
    path, for logic a built-in generator genuinely can't express.
    Everything SQL-expressible (like this demo's tokenize) should use
    explode/posexplode (JVM codegen) instead; the point here is
    verifying the API plumbing end-to-end."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class ExpandTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, t in enumerate(text.split(" ")):
                yield i, t

    spark.udtf.register("expand_tokens", ExpandTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_for_udtf d, LATERAL expand_tokens(d.text) t
        """
    )
