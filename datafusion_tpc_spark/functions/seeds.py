"""TakeOrdered(K) seed selection for the deterministic-k-means family
(VERDICT r8 item 2).

Registration-free module (the functions/digest.py discipline): it is
imported by window-scheduled query modules, so it must not register
queries of its own.

The pattern being replaced:
``row_number().over(Window.orderBy(h60(...), vec_id)) <= K`` ranks the
FULL embeddings corpus through one reducer — an Exchange
SinglePartition plus a global Sort of every (vec_id, hash) row — the
exact single-reducer gather round 8 removed from prefix_join's
vocabulary rank. Harmless at sf0.1 (narrow rows, small corpus), a
real scale-killer at 10^9+ vectors.

The replacement: ``orderBy(h, vec_id).limit(K)`` compiles to
TakeOrderedAndProject — a map-side per-partition top-K heap followed
by a K-row merge — so the corpus never funnels through one reducer;
only K (hash, vec_id) pairs do. cid is then assigned by position with
a row_number window over the K-row limit result: that window's single
partition holds K <= 8 rows, not the corpus (the same
rank-after-TakeOrdered shape quantization.py's eval legs already
use). The (h60, vec_id)-ascending order is identical to the ranked
form, so seed sets, cid numbering, downstream Lloyd trajectories, and
every existing DuckDB oracle are unchanged — the oracles keep their
QUALIFY row_number form because on K rows vs the corpus the SELECTED
rows are the same.

Adopted (round 10) by all three trainers — kmeans.py (q_sim_kmeans),
pq.py (q_sim_pq), quantization.py (q_sim_pqadc) — each joining the
broadcast K-row seed set back to the vector table. Plan-gated by
tests/test_plans.py::test_r9_seed_pick_no_corpus_window
(TakeOrderedAndProject present; the only partition-less window sits
above the K-row limit; source-level wiring check on the three
consumers) and by the unchanged output hashes of q_sim_kmeans /
q_sim_pq / q_sim_pqadc in driver_mirror.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_tpc_spark.functions.digest import h60


def seed_pick(v, tag: str, k: int):
    """The k seed rows (cid, vec_id): the k smallest
    (h60(tag || vec_id), vec_id) keys over `v` (any DataFrame carrying
    vec_id), cid = 1-based position in that order. Join the result
    back to the vector table (broadcast — k rows by construction) to
    attach embeddings."""
    h = h60(F.concat(F.lit(tag), F.col("vec_id").cast("string")))
    top = (
        v.select("vec_id", h.alias("_h"))
        .orderBy(F.col("_h").asc(), F.col("vec_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_h").asc(), F.col("vec_id").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("cid"), "vec_id"
    )
