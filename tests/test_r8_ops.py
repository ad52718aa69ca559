"""Round-8 operator invariants: the IVF recall eval. Since r10 the
coarse quantizer is the distributed h60-seeded Lloyd choreography of
functions/ivf.py and q_sim_ivf/q_sim_ivfeval are EXACT-oracled; these
invariants additionally pin the MEASURED retrieval quality (recall
floor + beats-blind-sampling) that hash parity alone cannot."""

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
    # r11 3-iteration spherical quantizer (ADVICE r10): measured 0.5
    # (sf0.001) / 0.6 (sf0.01) at cand_frac ≈ 0.24 — the unclustered
    # gaussian fixture is IVF's worst case (the quantization.py
    # fixture-honesty note; the old 0.9 came from the r5
    # sample-trained quantizer's imbalanced cells, i.e. a larger
    # effective candidate mass).
    # Two invariants a broken probe cannot fake: an absolute floor,
    # and recall STRICTLY ABOVE the blind-sampling baseline — probing
    # cand_frac of the corpus at random would recover ≈ cand_frac of
    # the true top-10, so the data-adaptive cells must beat it.
    assert r["recall_at_k"] >= 0.4
    assert r["recall_at_k"] > r["cand_frac"]


def test_ivfeval_measures_the_search_candidates(spark):
    """The eval's candidate stream IS q_sim_ivf's input: the search's
    returned top-k must all come from cells the eval counted."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.operators.similarity import _ivf_candidates

    top = registry.QUERIES["q_sim_ivf"](spark, SF_DIR)
    cand = _ivf_candidates(spark, SF_DIR)
    missing = top.join(cand.select("vec_id"), "vec_id", "left_anti").count()
    assert missing == 0


def test_sq8_reconstruction_and_recall(spark):
    """SQ8's 255-level grid on the [-1,1]-ish fixture is near-lossless:
    quantized ranking must agree with the exact ranking and per-dim
    worst-case error bounds the MSE (64 dims × (step/2)² with
    step = range/255 ≤ ~0.02 on this data → mse ≪ 1e-3)."""
    rows = registry.QUERIES["q_sim_sq8"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert sum(r["in_exact"] for r in rows) >= 8
    assert 0.0 < rows[0]["mse"] < 1e-3
    assert all(rows[0]["mse"] == r["mse"] for r in rows)
    sims = [r["sim_q"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_pqadc_rerank_consistency(spark):
    """ADC top-10 after exact re-rank: true d2 must be sorted (the
    re-rank's whole point), every row must carry a positive ADC
    estimate, and the hit flags must be 0/1. Recall itself is a
    measurement, not an invariant, on the unclustered gaussian
    fixture (module docstring) — no floor is pinned."""
    rows = registry.QUERIES["q_sim_pqadc"](spark, SF_DIR).collect()
    assert len(rows) == 10
    d2s = [r["d2"] for r in rows]
    assert d2s == sorted(d2s)
    assert all(r["adc_d2"] > 0 for r in rows)
    assert all(r["in_exact"] in (0, 1) for r in rows)


def test_survival_km_invariants(spark):
    """Kaplan-Meier structural invariants: survival is non-increasing,
    the at-risk count is strictly decreasing over t, every observed
    user appears exactly once across (d_events + c_censored), and the
    first at-risk count equals the observed-user total."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    rows = registry.QUERIES["q_evt_survival"](spark, SF_DIR).collect()
    assert rows, "non-degenerate fixture expected"
    survs = [r["surv"] for r in rows]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    risks = [r["n_risk"] for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select(F.countDistinct("user_id"))
        .first()[0]
    )
    assert sum(r["d_events"] + r["c_censored"] for r in rows) == n_users
    assert risks[0] == n_users
    assert all(0.0 <= s <= 1.0 for s in survs)


def test_sq8_mse_within_grid_bound(spark, ddb):
    """The per-dimension affine grid bounds worst-case reconstruction
    error at (range_d / 255 / 2) per component, so the corpus MSE
    cannot exceed Σ_d (range_d/510)² — a structural cap independent
    of the data distribution."""
    bound = ddb.sql(
        """
        SELECT SUM(((mx - mn) / 510.0) * ((mx - mn) / 510.0)) AS b
        FROM (
          SELECT MIN(x) AS mn, MAX(x) AS mx
          FROM (SELECT unnest(embedding::DOUBLE[]) AS x,
                       unnest(range(1, 65)) AS pos FROM embeddings)
          GROUP BY pos
        )
        """
    ).fetchone()[0]
    mse = registry.QUERIES["q_sim_sq8"](spark, SF_DIR).first()["mse"]
    assert 0.0 < mse <= bound


def test_batch_qid0_matches_single_query_topk(spark):
    """Cross-operator consistency: q_sim_batch's qid=0 ranking must be
    exactly q_sim_topk's top-5 (same corpus, same exclusion, same
    ROUND(6)+vec_id ordering convention) — the batched plan is an
    amortization, never a semantic change."""
    batch = {
        (r["rank"], r["vec_id"])
        for r in registry.QUERIES["q_sim_batch"](spark, SF_DIR)
        .filter("qid = 0")
        .collect()
    }
    single = {
        (i + 1, r["vec_id"])
        for i, r in enumerate(
            registry.QUERIES["q_sim_topk"](spark, SF_DIR).limit(5).collect()
        )
    }
    assert batch == single


def test_ivf_batch_family_consistency(spark):
    """The three r10 IVF batch queries must describe ONE index and
    ONE probe policy: q_sim_ivf_sweep's nprobe=2 row equals
    q_sim_ivfeval_batch's micro-averaged row (same candidate counts,
    same tp, same pooled recall), and q_sim_ivf_batch's returned
    top-5 per qid is a subset of the eval's candidate stream."""
    sweep = {
        r["nprobe"]: r
        for r in registry.QUERIES["q_sim_ivf_sweep"](spark, SF_DIR).collect()
    }
    ev = {
        r["qid"]: r
        for r in registry.QUERIES["q_sim_ivfeval_batch"](spark, SF_DIR).collect()
    }
    micro = ev[-1]
    p2 = sweep[2]
    assert p2["n_cand"] == micro["n_cand"]
    assert p2["tp"] == micro["tp"]
    assert p2["n_exact"] == micro["n_exact"]
    assert p2["recall10"] == micro["recall10"]
    # monotone sweep: more probes never lose candidates or hits
    for p in (2, 3, 4):
        assert sweep[p]["n_cand"] >= sweep[p - 1]["n_cand"]
        assert sweep[p]["tp"] >= sweep[p - 1]["tp"]

    from datafusion_tpc_spark.functions.ivf import ivf_batch_candidates

    top = registry.QUERIES["q_sim_ivf_batch"](spark, SF_DIR).select(
        "qid", "vec_id"
    )
    cand = ivf_batch_candidates(spark, SF_DIR).select("qid", "vec_id")
    missing = top.join(cand, ["qid", "vec_id"], "left_anti").count()
    assert missing == 0
