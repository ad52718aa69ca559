"""Scalar function families — SURVEY.md §2.8 (Tier B; DF 19 function
registry via reference Cargo.toml:15; blake2/blake3 linked at
Cargo.lock:1222-1223).

Families: math, string, regex, hash/crypto, struct/array. Date/time
live in events.py (q_fn_date/q_fn_datebin). Every function here is a
native JVM expression inside whole-stage codegen — no Python in the
hot path, so these run at full vectorized speed regardless of scale.

Oracle dialect notes (probed against DuckDB 1.0):
- regexp_replace needs the 'g' flag in DuckDB to match Spark's
  replace-all; regex patterns kept to the Java∩RE2 common subset.
- DuckDB lacks initcap → emulated in the oracle via list_transform
  (single-space-separated fixture text makes this exact).
- DuckDB octet_length needs a BLOB → encode(text).
- trig/exp/ln are libm-backed in both engines; ROUND(x, 6) absorbs
  last-ulp differences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 1500.0), 6)        AS abs_diff,
           CAST(ceil(l_discount * 100) AS BIGINT)         AS ceil_disc,
           CAST(floor(l_extendedprice) AS BIGINT)         AS floor_price,
           ROUND(l_extendedprice, 2)                      AS round_price,
           ROUND(exp(l_discount), 6)                      AS exp_disc,
           ROUND(ln(l_extendedprice + 1), 6)              AS ln_price,
           ROUND(log10(l_extendedprice + 1), 6)           AS log10_price,
           ROUND(log2(l_quantity + 1), 6)                 AS log2_qty,
           ROUND(pow(l_quantity, 2), 6)                   AS qty_sq,
           ROUND(sqrt(l_extendedprice), 6)                AS sqrt_price,
           ROUND(sin(l_discount), 6)                      AS sin_disc,
           ROUND(cos(l_discount), 6)                      AS cos_disc,
           ROUND(atan2(l_quantity, l_linenumber), 6)      AS atan2_ql,
           CAST(sign(l_extendedprice - 1500.0) AS DOUBLE) AS sgn
    FROM lineitem
    """,
)
def q_fn_math(spark, sf_dir):
    """Math family: abs/ceil/floor/round/exp/ln/log10/log2/power/sqrt/
    trig/signum (DF 19 registry — SURVEY §2.8). `random` is
    nondeterministic and intentionally not oracled."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1500.0), 6).alias("abs_diff"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("ceil_disc"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        F.round("l_extendedprice", 2).alias("round_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_price"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("log2_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.sin("l_discount"), 6).alias("sin_disc"),
        F.round(F.cos("l_discount"), 6).alias("cos_disc"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_linenumber")), 6).alias("atan2_ql"),
        F.signum(F.col("l_extendedprice") - 1500.0).cast("double").alias("sgn"),
    )


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS up,
           lower(p_brand)                                  AS lo,
           CAST(length(p_name) AS INT)                     AS len,
           CAST(bit_length(p_name) AS INT)                 AS bits,
           CAST(octet_length(encode(p_name)) AS INT)       AS octets,
           concat(p_brand, ':', p_type)                    AS joined,
           concat_ws('|', p_brand, p_type, p_name)         AS joined_ws,
           left(p_name, 5)                                 AS l5,
           right(p_name, 5)                                AS r5,
           lpad(p_brand, 12, '*')                          AS padded,
           rpad(p_brand, 12, '.')                          AS rpadded,
           trim(BOTH ' ' FROM concat(' ', p_name, ' '))    AS trimmed,
           ltrim(concat('xx', p_name), 'x')                AS ltrimmed,
           replace(p_name, ' ', '_')                       AS replaced,
           reverse(p_brand)                                AS rev,
           repeat(p_brand, 2)                              AS doubled,
           substr(p_name, 3, 8)                            AS sub,
           split_part(p_type, ' ', 1)                      AS first_word,
           CAST(strpos(p_name, 'a') AS INT)                AS a_pos,
           starts_with(p_type, 'S')                        AS s_start,
           CAST(ascii(p_brand) AS INT)                     AS first_code,
           chr(CAST(65 + p_partkey % 26 AS INT))           AS letter,
           translate(p_brand, 'ABC', 'abc')                AS translated,
           array_to_string(list_transform(string_split(p_name, ' '),
              w -> concat(upper(w[1:1]), w[2:])), ' ')     AS initcapped
    FROM part
    """,
)
def q_fn_string(spark, sf_dir):
    """String family (DF 19 registry — SURVEY §2.8): case, length,
    concat, pad/trim, replace/translate, reverse/repeat, substr/split,
    search, chr/ascii, initcap. The oracle emulates DuckDB's missing
    initcap with a word-wise transform."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("int").alias("len"),
        F.bit_length("p_name").cast("int").alias("bits"),
        F.octet_length("p_name").cast("int").alias("octets"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("joined"),
        F.concat_ws("|", "p_brand", "p_type", "p_name").alias("joined_ws"),
        F.expr("left(p_name, 5)").alias("l5"),
        F.expr("right(p_name, 5)").alias("r5"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.rpad("p_brand", 12, ".").alias("rpadded"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.expr("ltrim('x', concat('xx', p_name))").alias("ltrimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.substring("p_name", 3, 8).alias("sub"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr("p_name", "a").cast("int").alias("a_pos"),
        F.startswith(F.col("p_type"), F.lit("S")).alias("s_start"),
        F.ascii("p_brand").cast("int").alias("first_code"),
        F.chr((F.lit(65) + F.col("p_partkey") % 26).cast("int")).alias("letter"),
        F.translate("p_brand", "ABC", "abc").alias("translated"),
        F.initcap("p_name").alias("initcapped"),
    )


@query(
    "q_fn_regex",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           regexp_extract(o_orderpriority, '([0-9])-([A-Z ]+)', 1) AS prio_digit,
           regexp_extract(o_orderpriority, '([0-9])-([A-Z ]+)', 2) AS prio_word,
           regexp_replace(o_orderpriority, '[0-9]', '#', 'g')      AS masked,
           regexp_matches(o_orderpriority, '^[12]-')               AS is_high
    FROM orders
    """,
)
def q_fn_regex(spark, sf_dir):
    """Regex family — regexp_extract (group capture), regexp_replace
    (Spark replaces all; DuckDB needs 'g'), boolean match. Pattern kept
    to the Java∩RE2 shared dialect (SURVEY §2.8 ⚠)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.regexp_extract("o_orderpriority", r"([0-9])-([A-Z ]+)", 1).alias("prio_digit"),
        F.regexp_extract("o_orderpriority", r"([0-9])-([A-Z ]+)", 2).alias("prio_word"),
        F.regexp_replace("o_orderpriority", r"[0-9]", "#").alias("masked"),
        F.col("o_orderpriority").rlike(r"^[12]-").alias("is_high"),
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                                        AS h_md5,
           sha256(text)                                     AS h_sha256,
           CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h_60bit
    FROM documents
    """,
)
def q_fn_hash(spark, sf_dir):
    """Hash family — md5 / sha256 (DF 19: md5 sha224..sha512 digest;
    blake2/3 are linked via `digest`, Spark-side equivalent would be a
    pandas_udf — out of the oracled subset). h_60bit is the shared
    deterministic 60-bit hash (first 15 hex chars of md5 as int) used
    by the MinHash dedup operators."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias("h_60bit"),
    )


@query("q_fn_nondet")  # † rows-only: uuid/random are nondeterministic by contract
def q_fn_nondet(spark, sf_dir):
    """Nondeterministic functions — DF 19 registry `random` and `uuid`
    (SURVEY §2.8 marks them †). Shape checks only: uuid format, rand
    range; values can never hash-match an oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.expr("uuid()").alias("row_uuid"),
        F.rand(42).alias("rand_val"),
        F.randn(42).alias("randn_val"),
    ).filter(
        (F.length("row_uuid") == 36) & F.col("rand_val").between(0.0, 1.0)
    )


@query(
    "q_explode",
    oracle="""
    SELECT p_partkey, CAST(i - 1 AS INT) AS pos, w[i] AS word
    FROM (SELECT p_partkey, string_split(p_type, ' ') AS w FROM part) t,
         LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g
    """,
)
def q_explode(spark, sf_dir):
    """posexplode — table-generating function (UDTF surface; absent in
    DF 19, SURVEY §2.11, provided natively by Spark). One row per
    word of p_type with its position."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_type", " ")).alias("pos", "word")
    ).select("p_partkey", F.col("pos").cast("int").alias("pos"), "word")


@query(
    "q_fn_struct",
    oracle="""
    SELECT c_custkey,
           (struct_pack(k := c_custkey, seg := c_mktsegment)).seg AS seg_from_struct,
           ([c_acctbal, c_acctbal * 2, 0.0])[2]                   AS arr_elem,
           CAST(len([c_custkey, c_nationkey]) AS INT)             AS arr_len
    FROM customer
    """,
)
def q_fn_struct(spark, sf_dir):
    """Struct/array construction + element access — DF 19 `struct`,
    `make_array`, field access (SURVEY §2.8). Scalars projected back
    out so the value hash is type-stable across engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.struct(F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"))
        .getField("seg")
        .alias("seg_from_struct"),
        F.element_at(
            F.array(F.col("c_acctbal"), F.col("c_acctbal") * 2, F.lit(0.0)), 2
        ).alias("arr_elem"),
        F.size(F.array(F.col("c_custkey"), F.col("c_nationkey").cast("bigint")))
        .cast("int")
        .alias("arr_len"),
    )


@query("q_fn_blake")  # † rows-only: DuckDB 1.0 has no blake2 counterpart
def q_fn_blake(spark, sf_dir):
    """blake2b-256 digest — the reference's `digest` function links
    blake2/blake3 (Cargo.lock:1222-1223, SURVEY §2.8). Spark has no
    native blake; functions/digests.py wraps stdlib hashlib.blake2b in
    an Arrow-vectorized pandas_udf. Deterministic, but DuckDB 1.0 has
    no blake2 either → rows-only here; exact digests are asserted
    against hashlib in tests/test_sources_and_skew.py."""
    from datafusion_tpc_spark.functions.digests import blake2b_hex

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", blake2b_hex("text").alias("h_blake2b"))


@query("q_fn_blake3")  # † rows-only: DuckDB 1.0 has no blake3 counterpart
def q_fn_blake3(spark, sf_dir):
    """blake3 digest — the second algorithm of the reference's `digest`
    function (Cargo.lock:1222-1223, SURVEY §2.8). Uses the blake3 wheel
    when installed, else the pure-Python spec implementation
    (functions/blake3_py.py — spec vectors pinned in
    tests/test_sources_and_skew.py). Rows-only: no DuckDB counterpart;
    bench-excluded (Python-speed fallback is the documented slow seam)."""
    from datafusion_tpc_spark.functions.digests import blake3_hex

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", blake3_hex()("text").alias("h_blake3"))


@query(
    "q_fn_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_json(spark, sf_dir):
    """JSON path extraction (schema-on-read) — get_json_object pulls a
    typed value out of the `props` JSON string column, then aggregates
    by event_type. The extraction is a JVM expression evaluated inside
    the scan stage; no Python, no extra pass — the pattern for
    semi-structured event payloads at scale (parse once, project the
    fields you need, let partial aggregation collapse the rest).
    DuckDB's json_extract states the same path query."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )
