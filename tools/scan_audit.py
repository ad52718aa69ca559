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
    "q_dedup_near_split": "cluster join over pair rounds",
    "q_dedup_eval": "candidate vs exact pair sets",
    "q_dedup_embed": "pairwise self-join",
    "q_dedup_embed_lsh": "bucketed self-join",
    "q_dedup_prefix": "prefix self-join",
    "q_dedup_semantic": "cluster centroid + member join",
}


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
