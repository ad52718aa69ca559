"""Double-scan audit: for every registered query, count how many times
each parquet path appears as a scan node in the FINAL (post-AQE)
executed plan. A path scanned >= 2x usually means a subtree with two
consumers re-executing its lineage (the groupBy-then-join-back shape
the r11 single-scan rewrite removed from substr/decontam/winnow —
2.3x there) — though self-joins (ngram/minhash LSH), union legs, and
eval queries comparing two derived sets are legitimately multi-scan.

Usage: python tools/scan_audit.py [sf_dir]   (default sf0.001 — plan
shape, not timing, is the signal, so the smallest fixture is enough)

Usage: python tools/scan_audit.py [sf_dir] [--write]

Prints one line per flagged query: name, {path_basename: count}; exits
1 if any flagged query is missing from JUSTIFIED_MULTI (r13 — the
review is enforced, not advisory). --write refreshes the committed
artifact tools/scan_audit_flags.json, which
tests/test_scan_audit_lint.py diffs against JUSTIFIED_MULTI and the
registry — run it (solo: it drives every query) after adding queries,
like tools/gen_coverage.py.
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

# Reviewed multi-scan justifications, query by query (r11 sweep,
# promoted from a header comment to DATA in r13 — VERDICT r12 item 4:
# main() now exits 1 on any flagged query missing here, and
# tests/test_scan_audit_lint.py diffs the committed artifact
# (scan_audit_flags.json, written by --write) against this dict, so a
# new unjustified double-scan fails the suite until it is either
# rewritten to one scan or reviewed into this list WITH its reason).
_SKETCH_EXACT = (
    "sketch-vs-exact contract: the output pairs a sketch/global-bounds "
    "aggregate with the per-group exact pass — two aggregations of one "
    "table IS the query"
)
_DQ_AUDIT = (
    "DQ audit comparing derived views: constraint suites/reconciliations "
    "read the table per independent check by contract"
)
_SETOP = "the two scans are the two legs of the declared set operation"
_SLICE_CHAIN = (
    "each scan carries a pushed-down event_type/slice predicate — "
    "selective reads that partition/row-group pruning keeps cheap at "
    "scale; the single-scan window rewrite was evaluated for funnel and "
    "rejected (per-step shrinking join inputs beat one wide window state)"
)
_BUILD_PROBE = "build+probe / dim-x-fact legs of the declared join"
_TRAIN_SERVE = (
    "training + serving lineage with a documented plan-build caveat "
    "(BASELINE.md rows note the codebook/assignment collect at call time)"
)
_MULTISET = (
    "multi-set pipeline semantics: the query compares or anti-joins two "
    "declared document sets"
)
_FIXTURE_READ = (
    "fixture-builder read: the query's subject is the written artifact, "
    "read back"
)
_TPCH_SHAPE = (
    "declared TPC-H shape: the correlated subquery / self-referencing "
    "view re-reads the table by definition"
)
JUSTIFIED_MULTI = {
    # sketch-vs-exact contracts
    "q_agg_hll": _SKETCH_EXACT,
    "q_agg_cms": _SKETCH_EXACT,
    "q_agg_kmv": _SKETCH_EXACT,
    "q_agg_theta": _SKETCH_EXACT,
    "q_agg_freq": _SKETCH_EXACT,
    "q_agg_bootstrap": _SKETCH_EXACT,
    "q_agg_winsorize": _SKETCH_EXACT,
    "q_agg_winsorize_td": _SKETCH_EXACT,
    # DQ audits comparing derived views
    "q_dq_checks": _DQ_AUDIT,
    "q_dq_reconcile": _DQ_AUDIT,
    "q_dq_skew": _DQ_AUDIT,
    "q_dq_drift": _DQ_AUDIT,
    "q_dq_calibration": _DQ_AUDIT,
    # set-operation legs
    "q_intersect": _SETOP,
    "q_intersect_all": _SETOP,
    "q_except_all": _SETOP,
    # type/slice-filtered chains
    "q_evt_funnel": _SLICE_CHAIN,
    "q_evt_retention": _SLICE_CHAIN,
    "q_evt_rfm": _SLICE_CHAIN,
    "q_evt_locf": _SLICE_CHAIN,
    "q_evt_survival": _SLICE_CHAIN,
    "q_evt_cusum": _SLICE_CHAIN,
    "q_evt_anomaly": _SLICE_CHAIN,
    "q_join_pit": _SLICE_CHAIN,
    "q_asof_join": _SLICE_CHAIN,
    # build+probe / dim x fact
    "q_join_bloom": _BUILD_PROBE + " (bloom build pass + probe pass)",
    "q_geo_nearest": _BUILD_PROBE,
    "q_join_theta": _BUILD_PROBE,
    "q_join_nullsafe": _BUILD_PROBE,
    # training + serving lineages
    "q_sim_ivf": _TRAIN_SERVE,
    "q_sim_ivf_batch": _TRAIN_SERVE,
    "q_sim_ivf_sweep": _TRAIN_SERVE,
    "q_sim_kmeans": _TRAIN_SERVE,
    "q_sim_ann": _TRAIN_SERVE,
    "q_sim_batch": _TRAIN_SERVE,
    "q_sim_anneval_batch": _TRAIN_SERVE,
    "q_sim_ivfeval_batch": _TRAIN_SERVE,
    "q_sim_hardneg": _TRAIN_SERVE,
    "q_sim_pq": _TRAIN_SERVE,
    "q_sim_pqadc": _TRAIN_SERVE,
    "q_sim_sq8": _TRAIN_SERVE,
    "q_sim_pca": _TRAIN_SERVE,
    "q_sim_ndcg": _TRAIN_SERVE,
    "q_sim_ndcg_batch": _TRAIN_SERVE,
    "q_sim_topk": "two bounded top-k candidate legs of the declared rank",
    "q_sim_rrf": "two bounded top-100 candidate legs fused FULL OUTER",
    # multi-set pipeline semantics
    "q_pipe_contamination": _MULTISET,
    "q_pipe_diff": _MULTISET,
    "q_pipe_forget": _MULTISET,
    "q_pipe_kept": _MULTISET,
    "q_pipe_domain_cap": _MULTISET,
    "q_pipe_rep": _MULTISET,
    "q_pipe_lm": _MULTISET
    + " (bigram window rewrite landed r12: 3 scans -> 2)",
    # bm25/tfidf: measured decisions, not oversights
    "q_pipe_bm25": (
        "shared _token_tf rollup re-derived per consumer — cache() was "
        "implemented and MEASURED WORSE at sf0.1 (0.60->1.00 median; "
        "InMemoryRelation reads break codegen); the r12 window rewrite "
        "was ALSO measured worse (1.16->1.42: the query-term filter "
        "prunes tf to 4 terms before the joins, so re-derived branches "
        "shuffle tiny aggregates while the window form shuffles the "
        "full tf stream twice). Scan count is a proxy — measure first"
    ),
    "q_pipe_tfidf": (
        "residual 2nd scan is the 1-row document count (r12 window "
        "rewrite took df 3 scans -> 2, plan-gated "
        "test_tfidf_two_scans_max)"
    ),
    # fixture-builder reads
    "q_layout_compact": _FIXTURE_READ,
    "q_scan_corrupt": _FIXTURE_READ,
    "q_dedup_incr": _FIXTURE_READ + " (ingest-batch vs digest snapshot)",
    "q_union_evo": _FIXTURE_READ + " (two schema-vintage snapshots)",
    # declared TPC-H shapes
    "q_tpch_q2": _TPCH_SHAPE + " (min-cost correlated subquery)",
    "q_tpch_q8": _TPCH_SHAPE + " (n1/n2 nation roles)",
    "q_tpch_q15": _TPCH_SHAPE + " (revenue view: max + join)",
    "q_tpch_q17": _TPCH_SHAPE + " (avg-quantity-per-part subquery)",
    "q_tpch_q18": _TPCH_SHAPE + " (having-sum subquery)",
    # misc declared shapes
    "q_skyline": "dominance self-anti-join over the same slice is the "
    "declared skyline algorithm (NOTE: the flag comes and goes with "
    "AQE's runtime reuse decisions — r14 re-observed it after an r13 "
    "sweep without it; keep the justification, the algorithm is the "
    "two-sided self-join by construction)",
}


ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scan_audit_flags.json")


def main() -> None:
    import json

    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark()
    registry.load_all()
    flagged: list[str] = []
    swept: list[str] = []
    errs = 0
    for name, fn in sorted(registry.QUERIES.items()):
        if name in KNOWN_MULTI:
            swept.append(name)  # justified by construction (self-join)
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — diagnostic sweep
            print(f"ERR {name}: {type(e).__name__}: {e}")
            errs += 1
            continue
        swept.append(name)
        final = plan.split("Initial Plan")[0]
        paths = re.findall(r"Location: [^\[]*\[([^\]]*)\]", final)
        counts = Counter(os.path.basename(p.rstrip("/")) for p in paths)
        multi = {p: c for p, c in counts.items() if c >= 2}
        if multi:
            flagged.append(name)
            print(f"MULTI {name}: {multi}")
    unjustified = [q for q in flagged if q not in JUSTIFIED_MULTI]
    stale = sorted(
        q for q in JUSTIFIED_MULTI if q in swept and q not in flagged
    )
    print(f"flagged: {len(flagged)}")
    for q in unjustified:
        print(f"UNJUSTIFIED {q}: review the plan, then either rewrite "
              f"to one scan or add it to JUSTIFIED_MULTI with a reason")
    if stale:
        print(f"stale justifications (flag cleared — prune when "
              f"convenient): {stale}")
    if write:
        with open(ARTIFACT, "w") as f:
            json.dump(
                {"sf_dir": os.path.basename(sf_dir.rstrip("/")),
                 "swept": sorted(swept), "flagged": sorted(flagged)},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {ARTIFACT}")
    if unjustified or errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
