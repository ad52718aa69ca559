"""Statistical aggregates, round 6 — pairwise correlation matrix and
a mergeable t-digest-style quantile sketch. Extends
queries/aggregates.py (stats/regr family) and operators/sketches.py
(Misra-Gries/KMV) without touching their registration order.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


@query(
    "q_agg_corrmat",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(CORR(l_quantity, l_discount), 6) AS corr_qty_disc,
           ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_price_disc,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cov_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def q_agg_corrmat(spark, sf_dir):
    """Pairwise correlation matrix over the three lineitem measures,
    per return flag — the feature-correlation profiling pass a
    training pipeline runs before feature selection. All three
    correlations + one sample covariance come out of ONE aggregation
    (each corr keeps its own 5-number moment state; Spark and DuckDB
    both use numerically-stable one-pass updates). ROUND 6 on the
    normalized correlations / 4 on the O(10³) covariance absorbs the
    ~1e-12 relative fold-order noise of distributed sums.

    Scale: single map-side-combined shuffle of |groups| × constant
    moment state — the cheapest possible shape; at 100 TB this is a
    one-pass profile regardless of width (state grows as pairs²
    of the profiled column set, not with rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
            F.round(F.corr("l_extendedprice", "l_discount"), 6).alias(
                "corr_price_disc"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "cov_qty_price"
            ),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


_TD_CENTROIDS = 64  # per-partition and post-merge compression width
_TD_QUANTILES = (0.5, 0.9, 0.99)


@query("q_agg_tdigest")  # † rows-only: sketch (error bound pytest-pinned)
def q_agg_tdigest(spark, sf_dir):
    """Mergeable quantile sketch over o_totalprice — the t-digest
    pattern: each partition compresses its values into ≤64 weighted
    centroids (sorted equal-weight chunks → (mean, weight)), the
    centroid sets are unioned and re-compressed once, and quantiles
    are read off the cumulative-weight curve by interpolation.

    This is the streaming/distributed answer to exact percentiles
    (q_agg_median / q_agg_pctl_w sort or gather per group): state is
    O(centroids) per partition regardless of row count, merge is
    associative, and the final read is driver-trivial — exactly how
    t-digest/KLL run inside every production metrics pipeline. At
    100 TB the partial pass is embarrassing-parallel and the merge
    step sees |partitions|·64 centroids — still tiny.

    Rows-only (†): centroid boundaries depend on partition splits, so
    no SQL oracle; tests/test_extensions.py pins the rank error vs
    the exact percentile at ≤2% and the exact mergeability of the
    weighted mean/count state."""
    import pandas as pd

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = []
        for pdf in batches:
            vals.append(pdf["o_totalprice"])
        if not vals:
            return
        v = pd.concat(vals).sort_values().to_numpy()
        n = len(v)
        if n == 0:
            return
        chunks = min(_TD_CENTROIDS, n)
        # equal-weight chunking of the sorted partition
        idx = [round(i * n / chunks) for i in range(chunks + 1)]
        rows = []
        for a, b in zip(idx[:-1], idx[1:]):
            if b > a:
                rows.append((float(v[a:b].mean()), int(b - a)))
        yield pd.DataFrame(rows, columns=["mean", "weight"])

    def merge(key, pdf):
        pdf = pdf.sort_values("mean").reset_index(drop=True)
        total = int(pdf["weight"].sum())
        # re-compress to ≤_TD_CENTROIDS by cumulative-weight buckets,
        # preserving total weight and weighted mean exactly
        target = max(1, total // _TD_CENTROIDS)
        out, acc_w, acc_sum = [], 0, 0.0
        for m, w in zip(pdf["mean"], pdf["weight"]):
            acc_w += int(w)
            acc_sum += m * w
            if acc_w >= target:
                out.append((acc_sum / acc_w, acc_w))
                acc_w, acc_sum = 0, 0.0
        if acc_w:
            out.append((acc_sum / acc_w, acc_w))
        cum = 0
        centroids = []
        for m, w in out:
            centroids.append((m, w, cum + w / 2.0))
            cum += w
        rows = []
        for q in _TD_QUANTILES:
            rank = q * total
            # interpolate on the cumulative-midpoint curve
            lo = None
            est = centroids[0][0] if rank <= centroids[0][2] else centroids[-1][0]
            for m, w, mid in centroids:
                if mid >= rank:
                    if lo is None:
                        est = m
                    else:
                        lm, lmid = lo
                        frac = (rank - lmid) / (mid - lmid) if mid > lmid else 0.0
                        est = lm + frac * (m - lm)
                    break
                lo = (m, mid)
            rows.append((float(q), float(est), total))
        return pd.DataFrame(rows, columns=["q", "estimate", "n_rows"])

    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    partials = o.mapInPandas(partial, "mean double, weight long")
    return (
        partials.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge, "q double, estimate double, n_rows long")
        .orderBy(F.col("q").asc_nulls_last())
    )
