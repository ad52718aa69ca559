"""Z-order (Morton-curve) layout clustering (r5) — the multi-column
data-skipping half of the storage-layout story, companion to
operators/bucketing.py (which removes join shuffles) and
fixtures/optimize.py (which fixes row-group parallelism).

Problem at 100 TB: a fact table laid out by ONE key skips files for
predicates on that key only; a 2-D box predicate (partkey range ×
suppkey range) still scans everything. Z-ordering interleaves the
bits of both keys' range-normalized cell numbers into one Morton
code, so rows close in EITHER dimension land in the same partition
directory — and a 2-D box maps to a SMALL set of z-cells whose union
covers it. This is exactly the layout trick Delta/Iceberg OPTIMIZE
ZORDER applies; here it is plain Spark: derive the z-bucket column,
write `partitionBy("zbucket")`, and at read time enumerate the
qualifying cells driver-side (a loop over 256 bucket ids — O(grid),
not O(data)) into an IN-list the scan prunes on (PartitionFilters,
plan-gated in tests/test_plans.py).

The reference has no write path at all (todo!(), reference
src/object_store/file.rs:215-228); its read-side row-group pruning
(parquet_pruning(true), benches/query.rs:38) is the single-column
ancestor of this: z-ordering is what makes min/max pruning effective
on MULTIPLE columns at once.

Layout is built once per (sf, grid) into .cache/zorder — the ingest
cost, paid once, like bucketing. Bucket-range math is integer
((key * 16) DIV (max+1)) end-to-end: no float boundary risk, and the
same arithmetic runs in the writer (Spark SQL) and the read-side
Python cell enumerator.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import (
    load_table,
    prune_stale_cache_dirs,
    sanitized_sf_tag,
)
from datafusion_tpc_spark.registry import query


def _source_tag(sf_dir: str, table: str = "lineitem") -> str:
    """Cache key for derived-layout copies: sf tag PLUS an (mtime_ns,
    size) fingerprint of the source parquet. Testdata drops replace
    files at the same path (FIXTURES.md), so a path-only key would
    serve a stale cached layout against a fresh oracle — the
    _evolve_dirs pattern (sinks.py, review r5; ADVICE r5 flagged this
    module still keying by sf tag alone)."""
    # Path-safe shared tag (review r11): an arbitrary corpus path
    # otherwise leaks '/' into the cache path — nested partitioned
    # dirs (CONFLICTING_DIRECTORY_STRUCTURES) or, absolute, an
    # os.path.join escape outside the cache root.
    tag = sanitized_sf_tag(sf_dir)
    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    fp = hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    return f"{tag}-{fp}"


# Superseded-fingerprint reclamation lives in catalog (one pruning
# implementation repo-wide; review r7 found this copy drifting from
# catalog's — notably the age gate that must cover in-flight reads).
_prune_stale_tags = prune_stale_cache_dirs

_CELLS_BITS = 4  # 16 cells per dimension → 256 z-buckets
_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache", "zorder"
)

# The demo box predicate (oracled): a 2-D range on both fact keys.
_P_LO, _P_HI = 100, 600
_S_LO, _S_HI = 10, 40


def _interleave(a: int, b: int) -> int:
    """Morton-interleave two _CELLS_BITS-bit cell numbers (a → odd
    bits, b → even bits)."""
    z = 0
    for i in range(_CELLS_BITS):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def _zbucket_col(pcell, scell):
    """The same interleave as a JVM column expression (stays in
    whole-stage codegen — 8 shift/mask terms OR-ed together)."""
    z = F.lit(0)
    for i in range(_CELLS_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(pcell, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(scell, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def _zorder_copy(spark, sf_dir: str) -> tuple[str, int, int]:
    """Ensure the z-clustered lineitem copy exists; returns
    (path, max_partkey, max_suppkey). Maxes persist beside the data so
    foreign sessions enumerate cells with the writer's exact grid."""
    path = os.path.join(_CACHE_ROOT, _source_tag(sf_dir))
    meta = os.path.join(path, "_zorder_meta.json")
    if os.path.exists(meta):
        # grid-constant guard: a cached copy built under a different
        # _CELLS_BITS assigns different cells than box_cover
        # enumerates — silently wrong pruning; rebuild instead.
        with open(meta) as f:
            if json.load(f).get("cells_bits") != _CELLS_BITS:
                import shutil

                shutil.rmtree(path, ignore_errors=True)
    if not os.path.exists(meta):
        li = load_table(spark, sf_dir, "lineitem")
        mx = li.agg(
            F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
        ).first()  # bounded driver scalars: the grid bounds (metadata)
        cells = 1 << _CELLS_BITS
        pcell = F.expr(f"CAST((l_partkey * {cells}) DIV {mx.p + 1} AS INT)")
        scell = F.expr(f"CAST((l_suppkey * {cells}) DIV {mx.s + 1} AS INT)")
        (
            li.withColumn("zbucket", _zbucket_col(pcell, scell))
            .repartition("zbucket")
            .write.mode("overwrite")
            .partitionBy("zbucket")
            .parquet(path)
        )
        with open(meta, "w") as f:
            json.dump({"max_p": mx.p, "max_s": mx.s, "cells_bits": _CELLS_BITS}, f)
        _prune_stale_tags(_CACHE_ROOT, _source_tag(sf_dir))
    with open(meta) as f:
        m = json.load(f)
    return path, m["max_p"], m["max_s"]


def box_cover(max_p: int, max_s: int) -> list[int]:
    """Z-cells whose union covers the demo box — the IN-list the scan
    prunes on. O(grid²) integer arithmetic, same formulas the writer
    used to assign cells."""
    cells = 1 << _CELLS_BITS
    p_cells = range(_P_LO * cells // (max_p + 1), _P_HI * cells // (max_p + 1) + 1)
    s_cells = range(_S_LO * cells // (max_s + 1), _S_HI * cells // (max_s + 1) + 1)
    return sorted(_interleave(p, s) for p in p_cells for s in s_cells)


def zorder_read(spark, sf_dir: str):
    """The z-layout read path: enumerate qualifying z-cells for the
    box driver-side, prune partitions by IN-list, keep the exact box
    as residual."""
    path, max_p, max_s = _zorder_copy(spark, sf_dir)
    buckets = box_cover(max_p, max_s)
    return (
        spark.read.parquet(path)
        .filter(F.col("zbucket").isin(buckets))
        .filter(
            F.col("l_partkey").between(_P_LO, _P_HI)
            & F.col("l_suppkey").between(_S_LO, _S_HI)
        )
    )


@query(
    "q_layout_zorder",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_partkey BETWEEN {_P_LO} AND {_P_HI}
      AND l_suppkey BETWEEN {_S_LO} AND {_S_HI}
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def q_layout_zorder(spark, sf_dir):
    """2-D box aggregate over the z-ordered lineitem copy: the scan
    prunes to the z-cells covering the box (PartitionFilters IN-list
    — file-level skipping on BOTH key dimensions from one layout),
    with the exact box kept as a residual filter. Oracle = the same
    box aggregate on the raw table: the layout is a physical change
    only, so the hashes must match while the z-read touches ~1/8 of
    the partitions (gate: tests/test_plans.py).

    Scale: the cell enumeration is O(grid²) driver arithmetic from
    two persisted scalars — no data touched before pruning; at 100 TB
    the grid deepens (more bits per dimension) and the same IN-list
    math holds. Production would additionally sort WITHIN buckets by
    the z-value to sharpen row-group min/max inside each file."""
    return (
        zorder_read(spark, sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


# ---- small-files compaction (the OPTIMIZE/maintenance half) ----------

_COMPACT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache", "compact"
)
_FRAG_FILES = 64
_TARGET_FILES = 4


def _compact_dirs(spark, sf_dir):
    """Build (once per sf) a deliberately fragmented 64-file copy of
    lineitem, then its 4-file compaction. The compacting write uses
    repartition(4), NOT coalesce(4): coalesce only caps the count at
    the SCAN's partition number, which depends on the session's split
    binning (maxPartitionBytes/openCost × parallelism) — a different
    driver session could bin the 64 small files into <4 splits and
    persist a wrong-file-count layout into the cache (review r5).
    repartition pins the output count at the price of one small
    shuffle; production compaction of append-only data keeps the
    no-shuffle coalesce and simply reports the realized count."""
    tag = _source_tag(sf_dir)
    frag = os.path.join(_COMPACT_ROOT, tag, "fragmented")
    comp = os.path.join(_COMPACT_ROOT, tag, "compacted_rp")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        load_table(spark, sf_dir, "lineitem").repartition(_FRAG_FILES).write.mode(
            "overwrite"
        ).parquet(frag)
    if not os.path.exists(os.path.join(comp, "_SUCCESS")):
        spark.read.parquet(frag).repartition(_TARGET_FILES).write.mode(
            "overwrite"
        ).parquet(comp)
        _prune_stale_tags(_COMPACT_ROOT, tag)
    return frag, comp


@query(
    "q_layout_compact",
    oracle=f"""
    SELECT CAST({_FRAG_FILES} AS BIGINT) AS files_before,
           CAST({_TARGET_FILES} AS BIGINT) AS files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    """,
)
def q_layout_compact(spark, sf_dir):
    """Small-files compaction report (the OPTIMIZE maintenance op the
    reference's todo!() write path never reached): a 64-file
    fragmented table is compacted to exactly 4 files (repartition —
    see _compact_dirs for why not coalesce), and the report proves
    (a) the file counts via `_metadata.file_name` grouping and
    (b) loss-free contents via row count + revenue checksum against
    the SOURCE table. 100 TB: compaction is one read+write pass;
    target file count derives from bytes/128MB rather than a
    constant — the constant here keeps the oracle literal."""
    frag, comp = _compact_dirs(spark, sf_dir)
    fb = (
        spark.read.parquet(frag)
        .select(F.col("_metadata.file_name").alias("f"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("files_before"))
    )
    fa = (
        spark.read.parquet(comp)
        .select(F.col("_metadata.file_name").alias("f"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("files_after"))
    )
    stats = spark.read.parquet(comp).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
    return fb.crossJoin(fa).crossJoin(stats)
