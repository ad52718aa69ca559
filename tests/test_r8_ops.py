"""Round-8 operator invariants: the IVF recall eval (rows-only — the
coarse quantizer is driver-side numpy k-means with no DuckDB twin, so
its correctness evidence is these invariants plus the shared
candidate-stream plumbing with q_sim_ivf)."""

from __future__ import annotations

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_ivfeval_consistency_and_recall_floor(spark):
    row = registry.QUERIES["q_sim_ivfeval"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_exact"] == 10
    assert r["n_cand"] > 0  # probe nonempty; cand_frac < 1 = prunes
    assert r["tp"] <= min(r["n_exact"], r["n_cand"])
    assert 0.0 <= r["recall_at_k"] <= 1.0
    assert 0.0 < r["cand_frac"] < 1.0
    assert r["n_cells"] <= 2  # nprobe=2
    # measured 0.9 on the fixtures at sf0.001/0.01; a deterministic
    # quantizer on fixed data cannot drift, so a generous floor still
    # catches a broken probe (e.g. empty cells or wrong assignment)
    assert r["recall_at_k"] >= 0.7


def test_ivfeval_measures_the_search_candidates(spark):
    """The eval's candidate stream IS q_sim_ivf's input: the search's
    returned top-k must all come from cells the eval counted."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.operators.similarity import _ivf_candidates

    top = registry.QUERIES["q_sim_ivf"](spark, SF_DIR)
    cand = _ivf_candidates(spark, SF_DIR)
    missing = top.join(cand.select("vec_id"), "vec_id", "left_anti").count()
    assert missing == 0
