"""Sign-LSH DuckDB twins (round 10) — registration-free (the
functions/digest.py discipline): the SQL builders for the md5-derived
sign-bucket family, moved out of operators/raneval.py so
operators/similarity.py can oracle q_sim_ann without importing
raneval's query registrations (and vice versa).

The Spark side lives in similarity._sign_bucket; N_PLANES here must
equal similarity._N_PLANES (asserted by every consumer at call /
registration time), and both probe policies — Spark's explode of
qbucket + 1-bit flips and probe_flips_duck's unnest literal — are
GENERATED from the same constant so a plane-count change cannot
desync the engines (review r10).
"""

from __future__ import annotations

from datafusion_tpc_spark.functions.digest import _h60_duck

N_PLANES = 4  # 2^4 buckets — must equal similarity._N_PLANES


def bucket_duck() -> str:
    """DuckDB twin of similarity._sign_bucket for `embeddings` rows:
    per plane p the weight list w(p,d) = (h60('p|d') % 2001 − 1000) /
    1000.0 over d = 0..len−1, projected by a SEQUENTIAL left fold
    (list_reduce over a 0.0-prepended product list ≡ Spark's
    aggregate(zip_with(...), 0.0, +) — identical op sequence, so the
    projection and its sign are bit-identical, the CUSUM argument).
    Bit p set iff the projection is positive."""
    bits = []
    for p in range(N_PLANES):
        h = _h60_duck(f"concat('{p}|', CAST(d AS VARCHAR))")
        w = (
            f"list_transform(range(0, len(embedding)), "
            f"d -> CAST(({h} % 2001 - 1000) AS DOUBLE) / 1000.0)"
        )
        proj = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(list_zip(embedding::DOUBLE[], {w}), "
            f"s -> s[1] * s[2])), (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(bits)


def probe_flips_duck() -> str:
    """The multi-probe bucket list as a DuckDB unnest literal —
    qbucket + every 1-bit flip, generated from N_PLANES."""
    flips = ", ".join(f"xor(qbucket, {1 << p})" for p in range(N_PLANES))
    return f"[qbucket, {flips}]"
