"""Bucketed-table co-located join — the storage-layout half of the
100 TB join story (SURVEY §7/M5 design notes; README "Design for
100 TB"). AQE and salting fix skew at runtime; BUCKETING removes the
join shuffle entirely by pre-partitioning both tables on the join key
at write time: `bucketBy(n, key)` persists hash-bucketed files whose
layout Catalyst recognizes as a satisfied HashClusteredDistribution,
so the sort-merge join plans with ZERO Exchange on either side
(plan-gated in tests/test_plans.py::test_bucketed_join_no_exchange).

At 100 TB this is the difference between shuffling the fact table on
every join and shuffling it once at ingest: a nightly pipeline writes
lineitem/orders bucketed by orderkey and every downstream
orderkey-join runs exchange-free. The reference has no storage layer
at all (its write path is todo!(), reference
src/object_store/file.rs:215-228) — this is Spark-native capability
beyond it.

The bucketed copies are built once per session into .cache/bucketed
(external tables — data survives, catalog entries are per-session and
rebuilt lazily). A foreign session (the external driver's) rebuilds
on first call; subsequent calls in the same session reuse the catalog
entry. Both the table NAME and the data dir carry the source's
(mtime, size) fingerprint — a testdata drop mid-session rebuilds
instead of serving stale buckets — and the dir is additionally
per-PID: two processes building concurrently land in disjoint dirs
instead of interleaving writes under one path (review r7 — a
pytest+mirror overlap flaked exactly this way); in-process threads
serialize on a lock around the exists-check+build (the 12-concurrent
bench would otherwise double-build one table name). Superseded dirs
are reclaimed by catalog.prune_stale_cache_dirs.
"""

from __future__ import annotations

import hashlib
import os
import threading

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import (
    load_table,
    prune_stale_cache_dirs,
    sanitized_sf_tag,
)
from datafusion_tpc_spark.registry import query

_N_BUCKETS = 8
_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache", "bucketed"
)
_BKT_LOCK = threading.Lock()


# Single shared implementation (review r11: the per-site copies
# drifted and ivf_served kept the unsanitized form) — see catalog.
_sf_tag = sanitized_sf_tag


def _bucketed_table(spark, sf_dir: str, table: str, key: str) -> str:
    """Ensure a bucketed copy of `table` exists as a catalog table;
    return its name. Write cost is paid once per (session, sf,
    source fingerprint); see module docstring for the race and
    staleness story."""
    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    fp = hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:12]
    tag = _sf_tag(sf_dir)
    name = f"{table}_bkt_{tag}_{fp}"
    with _BKT_LOCK:
        if not spark.catalog.tableExists(name):
            # Prune-prefix is namespaced PER TABLE (ADVICE r7): a
            # shared `{tag}-` prefix let building lineitem mark the
            # freshly built, catalog-referenced orders dir superseded
            # (and vice versa), so a later build event could delete
            # live data out from under the sibling table's reads.
            dir_key = f"{tag}_{table}-{fp}-{os.getpid()}"
            path = os.path.join(_CACHE_ROOT, dir_key, table)
            (
                load_table(spark, sf_dir, table)
                .write.mode("overwrite")
                .option("path", path)
                .bucketBy(_N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
            prune_stale_cache_dirs(_CACHE_ROOT, dir_key)
            # One-time sweep of pre-r8 shared-prefix dirs
            # ({tag}-{fp}-{pid}): the per-table rename above means
            # they match no live prefix anymore and would leak
            # forever (review r8). No new-scheme entry starts with
            # "{tag}-" (they start "{tag}_{table}-"), so everything
            # under the old prefix is superseded; the sentinel key
            # exists on no disk, and two-phase marking still gives
            # any straggler pre-r8 process its 6 h reader window.
            prune_stale_cache_dirs(_CACHE_ROOT, f"{tag}-r8-prefix-rename")
    return name


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o_orderstatus NULLS LAST
    """,
)
def q_join_bucketed(spark, sf_dir):
    """Fact-fact join on pre-bucketed tables: lineitem ⋈ orders on
    orderkey where BOTH sides were written `bucketBy(8, orderkey)`.
    The MERGE hint pins sort-merge (broadcast would trivially avoid
    the exchange at test SF and prove nothing); bucketing then
    satisfies the join's distribution requirement from the file
    layout, so the plan contains no join-side Exchange at all — the
    only shuffle left is the final tiny groupBy. Oracle = the same
    join on the raw tables (bucketing is a layout change, not a
    semantic one).

    Scale: at 1000 executors this layout turns every recurring
    orderkey-join from a full fact shuffle into a bucket-aligned
    local merge; bucket count is the parallelism floor, so production
    sizes it to O(cluster cores), not 8."""
    ob = spark.table(_bucketed_table(spark, sf_dir, "orders", "o_orderkey"))
    lb = spark.table(_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey"))
    return (
        lb.hint("merge")
        .join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.col("o_orderstatus").asc_nulls_last())
    )
