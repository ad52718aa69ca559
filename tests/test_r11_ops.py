"""Round-11 operator invariants: the IVF materialized-assignment
serving path (VERDICT r10 item 3) and the trained-codebook memo
(ADVICE r10)."""

from __future__ import annotations

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_ivf_served_equals_recomputed_search(spark):
    """The materialized index is a physical change only: the served
    top-k must be ROW-IDENTICAL (values and order) to q_sim_ivf's
    recomputed-assignment search."""
    served = registry.QUERIES["q_sim_ivf_served"](spark, SF_DIR).collect()
    base = registry.QUERIES["q_sim_ivf"](spark, SF_DIR).collect()
    assert len(served) == len(base) == 20
    assert [tuple(r) for r in served] == [tuple(r) for r in base]


def test_ivf_served_reads_persisted_codebook(spark):
    """Serving probes with the WRITER'S codebook (the zorder
    grid-persistence convention): the probe selection must read
    _ivf_codebook.json, not retrain — a fresh process serving a
    cached index does zero training."""
    import json
    import os

    from datafusion_tpc_spark.operators.ivf_served import _ivf_index

    path, codebook = _ivf_index(spark, SF_DIR)
    assert os.path.exists(os.path.join(path, "_ivf_codebook.json"))
    with open(os.path.join(path, "_ivf_codebook.json")) as f:
        persisted = [(int(c), [float(x) for x in e]) for c, e in json.load(f)]
    assert codebook == persisted
    # partition layout: one directory per trained cell
    cells = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert 1 <= len(cells) <= 8
    from datafusion_tpc_spark.functions.ivf import IVF_DIM, IVF_K

    assert len(codebook) == IVF_K
    assert all(len(e) == IVF_DIM for _, e in codebook)


def test_ivf_codebook_memo_hits(spark):
    """ADVICE r10: six consumers share one training run per
    (source fingerprint, constants) — the memo must be primed after
    any ivf_model call and return the identical object on re-call."""
    from datafusion_tpc_spark.functions import ivf

    ivf.ivf_model(spark, SF_DIR)
    assert ivf._CODEBOOK_MEMO, "memo not primed by ivf_model"
    v = None  # memo hit must not need the training frame
    key_hits = ivf._trained_codebook(spark, SF_DIR, v)
    assert key_hits is ivf._trained_codebook(spark, SF_DIR, v)


def test_ivf_served_batch_equals_batched_search(spark):
    """The batched served path composes the materialized index with
    the q_sim_ivf_batch probe semantics: row-identical output."""
    served = registry.QUERIES["q_sim_ivf_served_batch"](spark, SF_DIR).collect()
    base = registry.QUERIES["q_sim_ivf_batch"](spark, SF_DIR).collect()
    assert len(served) == len(base) == 50
    assert [tuple(r) for r in served] == [tuple(r) for r in base]
