"""Double-scan audit: for every registered query, count how many times
each parquet path appears as a scan node in the FINAL (post-AQE)
executed plan. A path scanned >= 2x usually means a subtree with two
consumers re-executing its lineage (the groupBy-then-join-back shape
the r11 single-scan rewrite removed from substr/decontam/winnow —
2.3x there) — though self-joins (ngram/minhash LSH), union legs, and
eval queries comparing two derived sets are legitimately multi-scan.

Usage: python tools/scan_audit.py [sf_dir]   (default sf0.001 — plan
shape, not timing, is the signal, so the smallest fixture is enough)

Prints one line per flagged query: name, {path_basename: count}.
Read-only diagnostic; exits 0 always.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402

# Queries where multiple scans of one path are inherent to the
# algorithm (self-joins over the same stream, two derived sets being
# compared, iterative/eager materializations) — skipped, with the
# reason recorded here for the next auditor.
KNOWN_MULTI = {
    "q_dedup_ngram": "shingle self-join",
    "q_dedup_minhash": "LSH band self-join",
    "q_dedup_minhash_capped": "LSH band self-join",
    "q_dedup_clusters": "label-prop rounds + pair join",
    "q_pipe_near_split": "cluster join over pair rounds",
    "q_dedup_eval": "candidate vs exact pair sets",
    "q_dedup_embed": "pairwise self-join",
    "q_dedup_embed_lsh": "bucketed self-join",
    "q_dedup_prefix": "prefix self-join",
    "q_dedup_semantic": "cluster centroid + member join",
}

# r11 full-sweep results, reviewed query by query — each flagged
# multi-scan is one of these justified shapes (kept flagging so any
# NEW query joining this list gets reviewed too):
#
# - sketch-vs-exact contracts (q_agg_hll/cms/kmv/theta/freq/
#   bootstrap/winsorize, and r12's winsorize_td): the output pairs a
#   sketch (or a global bounds aggregate) with the per-group exact
#   pass — two aggregations of one table IS the query.
# - DQ audits comparing derived views (q_dq_checks/reconcile/skew/
#   drift/calibration): constraint suites and reconciliations read
#   the table per independent check by contract.
# - set-operation legs (q_intersect/_all, q_except_all): the two
#   legs of the declared set op.
# - type/slice-filtered chains (q_evt_funnel/retention/rfm/locf/
#   survival/cusum/anomaly, q_join_pit/asof): each scan carries a
#   pushed-down event_type/slice predicate — selective reads that
#   partition/row-group pruning keeps cheap at scale; a single-scan
#   window rewrite was evaluated for funnel and rejected (the
#   per-step shrinking join inputs beat one wide window state).
# - build+probe (q_join_bloom: filter build + probe; q_geo_nearest,
#   q_join_theta/nullsafe: dim × fact legs of the declared join).
# - training + serving lineages with documented plan-build caveats
#   (q_sim_ivf*/kmeans/ann/batch/anneval_batch/hardneg: BASELINE.md
#   rows note the codebook/assignment collect at call time).
# - multi-set pipeline semantics (q_pipe_contamination/diff/forget/
#   kept/near_split/domain_cap/rep/lm: the query compares or anti-
#   joins two declared document sets).
# - q_pipe_bm25: shared _token_tf rollup re-derived per consumer —
#   cache() was implemented and MEASURED WORSE at sf0.1 (bm25
#   0.60→1.00 median; InMemoryRelation reads break codegen); see
#   _token_tf's docstring for the at-scale materialization path.
#   q_pipe_tfidf left this list in r12 (df became a term-partition
#   COUNT window on the tf stream, 3 scans → 2, plan-gated
#   test_tfidf_two_scans_max; the residual 2nd scan is the 1-row
#   document count). The SAME window rewrite was prototyped for bm25
#   and MEASURED WORSE (r12: 1.16 → 1.42 median at sf0.1,
#   row-identical, 5 scans → 2): bm25's query-term filter prunes tf
#   to 4 terms BEFORE its joins, so the re-derived branches shuffle
#   tiny map-side-combined aggregates, while the window form
#   shuffles the full unaggregated tf stream twice. Scan count is a
#   proxy, not the objective — measure before "fixing".
# - fixture-builder reads (q_layout_compact, q_scan_corrupt,
#   q_agg_incr/q_dedup_incr snapshots): the query's subject is the
#   written artifact, read back.


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    registry.load_all()
    flagged = 0
    for name, fn in sorted(registry.QUERIES.items()):
        if name in KNOWN_MULTI:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — diagnostic sweep
            print(f"ERR {name}: {type(e).__name__}: {e}")
            continue
        final = plan.split("Initial Plan")[0]
        paths = re.findall(r"Location: [^\[]*\[([^\]]*)\]", final)
        counts = Counter(os.path.basename(p.rstrip("/")) for p in paths)
        multi = {p: c for p, c in counts.items() if c >= 2}
        if multi:
            flagged += 1
            print(f"MULTI {name}: {multi}")
    print(f"flagged: {flagged}")


if __name__ == "__main__":
    main()
