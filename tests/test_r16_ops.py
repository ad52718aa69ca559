"""Round-16 invariants (a zero-birth round — no new query ids):

1. ADVICE r15 item on the publish guards: the cleanup DROP inside the
   guard is best-effort — when the session is broken enough that the
   DROP itself raises, the ORIGINAL failure must still propagate
   (before the fix, the cleanup error replaced it and the root cause
   was lost).
2. ADVICE r15 item on _merge_ingest_batch: the batch is persisted
   across the branch probe, so the SMJ branch runs the ingest lineage
   once and probe + join see the same rows.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _decontam_upsert_name(spark):
    from datafusion_tpc_spark.catalog import sanitized_sf_tag
    from datafusion_tpc_spark.operators import decontam_served as dcs

    fp = hashlib.md5(
        f"up:{dcs._index_fingerprint(SF_DIR)}:{dcs.DCS_INGEST_LT}".encode()
    ).hexdigest()[:12]
    return f"train_spans_up_{sanitized_sf_tag(SF_DIR)}_{fp}"


def test_publish_guard_cleanup_failure_keeps_original_error(
    spark, monkeypatch
):
    """Merge fails AND the cleanup DROP fails (broken-session
    simulation): the merge's RuntimeError must propagate, not the
    cleanup's. The table stays registered (cleanup could not run) —
    that is the accepted residue of a broken session, vs the r15
    behavior of masking the root cause."""
    from datafusion_tpc_spark.operators import decontam_served as dcs

    name = _decontam_upsert_name(spark)
    spark.sql(f"DROP TABLE IF EXISTS {name}")

    def boom(*a, **k):
        raise RuntimeError("merge failed mid-flight")

    real_sql = spark.sql

    def broken_sql(stmt, *a, **k):
        if stmt.lstrip().upper().startswith("DROP TABLE"):
            raise RuntimeError("cleanup also failed: session dead")
        return real_sql(stmt, *a, **k)

    monkeypatch.setattr(dcs, "_merge_ingest_batch", boom)
    monkeypatch.setattr(spark, "sql", broken_sql)
    with pytest.raises(RuntimeError, match="mid-flight"):
        dcs._upserted_span_index(spark, SF_DIR)
    monkeypatch.undo()

    # manual cleanup (the guard could not drop), then the un-patched
    # rebuild must restore the served path end-to-end
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    rows = registry.QUERIES["q_dedup_decontam_upsert"](spark, SF_DIR).collect()
    full = registry.QUERIES["q_dedup_decontam_served"](spark, SF_DIR).collect()
    assert rows == full and len(rows) == 1


def test_lsh_guard_cleanup_failure_keeps_original_error(spark, monkeypatch):
    """Same pin for the LSH upsert guard (the two guards share the
    pattern; a regression in one is most likely a shared-edit
    regression in both)."""
    from datafusion_tpc_spark.catalog import sanitized_sf_tag
    from datafusion_tpc_spark.operators import lsh_served as lsh

    st = os.stat(os.path.join(SF_DIR, "documents.parquet"))
    fp = hashlib.md5(
        f"up:{st.st_mtime_ns}:{st.st_size}:{lsh._K}:{lsh._BANDS}:"
        f"{lsh._SRV_BUCKETS}:{lsh.BATCH_N}".encode()
    ).hexdigest()[:12]
    name = f"lsh_upsert_{sanitized_sf_tag(SF_DIR)}_{fp}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")

    def boom(*a, **k):
        raise RuntimeError("ingest append failed mid-flight")

    real_sql = spark.sql

    def broken_sql(stmt, *a, **k):
        if stmt.lstrip().upper().startswith("DROP TABLE"):
            raise RuntimeError("cleanup also failed: session dead")
        return real_sql(stmt, *a, **k)

    monkeypatch.setattr(lsh, "_ingest_projection", boom)
    monkeypatch.setattr(spark, "sql", broken_sql)
    with pytest.raises(RuntimeError, match="mid-flight"):
        lsh._upserted_index(spark, SF_DIR)
    monkeypatch.undo()

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    rows = registry.QUERIES["q_dedup_lsh_upsert"](spark, SF_DIR).collect()
    full = registry.QUERIES["q_dedup_lsh_served"](spark, SF_DIR).collect()
    assert rows == full and len(rows) > 0


def test_merge_batch_persisted_across_branch_probe(spark, monkeypatch):
    """The ADVICE r15 persist: _merge_ingest_batch must cache the batch
    before the branch probe and unpersist on exit — on the SMJ branch
    the join then reuses cached partitions instead of re-running the
    ingest windowing, and probe and join cannot diverge under a
    nondeterministic source."""
    from datafusion_tpc_spark.operators import decontam_served as dcs

    # patch the CONCRETE DataFrame class (pyspark 4 classic subclasses
    # the pyspark.sql.DataFrame ABC and overrides persist — patching
    # the base would never intercept)
    DataFrame = type(spark.range(1))
    calls = {"persist": 0, "unpersist": 0}
    real_persist, real_unpersist = DataFrame.persist, DataFrame.unpersist

    def spy_persist(self, *a, **k):
        calls["persist"] += 1
        return real_persist(self, *a, **k)

    def spy_unpersist(self, *a, **k):
        calls["unpersist"] += 1
        return real_unpersist(self, *a, **k)

    monkeypatch.setattr(DataFrame, "persist", spy_persist)
    monkeypatch.setattr(DataFrame, "unpersist", spy_unpersist)

    import shutil

    from tests.test_r15_ops import _scratch_index
    from pyspark.sql import functions as F

    name, path = "r16_persist_probe", "/tmp/r16_persist_probe"
    _scratch_index(spark, name, path, F.col("doc_id") % 2 == 0)
    try:
        batch = spark.range(0, 100).select(
            (F.col("id") * 97 % (1 << 60)).alias("h")
        )
        dcs._merge_ingest_batch(spark, name, path, batch, inlist_max=10)
        assert calls["persist"] >= 1, "batch not persisted before probe"
        assert calls["unpersist"] >= calls["persist"], (
            "persisted batch leaked past the merge"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(path, ignore_errors=True)
