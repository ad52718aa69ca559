"""Multimodal columns — north-star extension (SURVEY.md §7/M5).

Pattern for image/audio/video at 100 TB: payloads travel as opaque
`binary` columns next to a typed metadata struct; decode / feature
extraction runs as Arrow-batched Pandas UDFs (mapInPandas) so bytes
never round-trip through Python row objects.

The container has no image/audio libraries, so the decode step is a
STUB (deterministic fake features behind a clearly-marked seam —
`_decode_image_real` raises NotImplementedError); the Spark-side
plumbing (binary column, metadata struct, UDF signature, batch
iteration, partitioning) is real and oracle-/property-tested.

Scale notes: binary payloads dominate bytes — never groupBy/shuffle
the payload column; derive features first, project the payload away,
shuffle only features+keys (done below). `spark.sql.files.
maxPartitionBytes` sizes scan tasks so a partition of blobs fits
executor memory.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from datafusion_tpc_spark.catalog import load_table
from datafusion_tpc_spark.registry import query


def multimodal_table(spark, sf_dir) -> DataFrame:
    """Synthesize the multimodal shape from `documents`: payload =
    utf-8 bytes of text (stand-in for image bytes), metadata struct
    (modality, size, source)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("modality"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("source"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@query(
    "q_mm_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
           md5(text) AS payload_md5,
           'image/fake' AS modality,
           source AS meta_source
    FROM documents
    """,
)
def q_mm_meta(spark, sf_dir):
    """Binary-column metadata path: byte length + digest of the payload
    and fields projected out of the metadata struct — everything except
    decode, verified exactly. (Spark md5(binary) ≡ DuckDB md5(text):
    both hash the utf-8 bytes.)"""
    mm = multimodal_table(spark, sf_dir)
    return mm.select(
        "doc_id",
        F.octet_length("payload").cast("int").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.source").alias("meta_source"),
    )


def _decode_image_real(payload: bytes):
    """The real decode seam. Plug PIL/libvips/ffmpeg here in an
    environment that has them."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this container; "
        "use _decode_fake (deterministic) for plumbing tests"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decode': (width, height, mean_byte) derived
    from the payload digest + contents — stable across runs/engines."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mean_byte = round(sum(payload) / max(len(payload), 1), 6)
    return width, height, mean_byte


@query("q_mm_decode")  # † rows-only: fake-decode features, no SQL form
def q_mm_decode(spark, sf_dir):
    """mapInPandas decode: batches of (doc_id, payload) → per-item
    features. Batch shape + schema are the real contract; the pixel
    decode itself is the stubbed seam."""
    mm = multimodal_table(spark, sf_dir).select("doc_id", "payload")

    def decode(batches):
        for pdf in batches:
            feats = [_decode_fake(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_byte": [f[2] for f in feats],
                }
            )

    return mm.mapInPandas(
        decode, schema="doc_id long, width int, height int, mean_byte double"
    )


@query("q_mm_resize")  # † rows-only: resize runs through the stubbed decode seam
def q_mm_resize(spark, sf_dir):
    """Resize plumbing: decode (stubbed, deterministic) → target-size
    computation preserving aspect ratio → 're-encoded' digest. The
    real pipeline swaps `_decode_fake` for a PIL/libvips call; batch
    shape, schema, and the derived geometry math are exercised for
    real."""
    mm = multimodal_table(spark, sf_dir).select("doc_id", "payload")
    target = 128

    def resize(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = _decode_fake(payload)
                scale = target / max(w, h)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        max(1, round(w * scale)),
                        max(1, round(h * scale)),
                        hashlib.md5(payload + b"|resized").hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_w", "out_h", "resized_md5"],
            )

    return mm.mapInPandas(
        resize,
        schema="doc_id long, width int, height int, out_w int, out_h int, resized_md5 string",
    )


@query(
    "q_mm_frames",
    oracle="""
    WITH f AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             unnest(generate_series(0, 3)) AS frame_idx
      FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * floor(n / 4) AS BIGINT) AS frame_offset,
           CAST(floor(n / 4) AS BIGINT) AS frame_len
    FROM f
    WHERE n >= 4
    """,
)
def q_mm_frames(spark, sf_dir):
    """Frame-sampling plumbing: split each payload into 4 equal byte
    ranges (video-frame analog) — pure offset arithmetic, exact oracle.
    The per-frame decode would then run through the q_mm_decode seam."""
    mm = multimodal_table(spark, sf_dir)
    n = F.octet_length("payload")
    return (
        mm.filter(n >= 4)
        .select(
            "doc_id",
            n.alias("n"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            (F.col("frame_idx") * F.floor(F.col("n") / 4)).cast("bigint").alias("frame_offset"),
            F.floor(F.col("n") / 4).cast("bigint").alias("frame_len"),
        )
    )


@query(
    "q_mm_dedup",
    oracle="""
    WITH digests AS (
      SELECT doc_id, md5(substring(text, 1, 32)) AS phash
      FROM documents
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
    FROM digests
    GROUP BY phash
    HAVING COUNT(*) > 1
    """,
)
def q_mm_dedup(spark, sf_dir):
    """Near-dup grouping over BINARY payloads via a prefix fingerprint
    — the multimodal twin of q_dedup_exact, with the 32-byte-prefix
    digest standing in for a perceptual hash (a real pHash would slot
    into the same plan as a pandas_udf at the digest step; the decode
    seam is q_mm_decode). 23 non-trivial collision groups on this
    fixture. The load-bearing 100 TB rule: the payload column is
    NEVER shuffled — the fingerprint is derived row-local FIRST, the
    payload is projected away, and only the 16-byte digest keys the
    exchange. Canonical selection is MIN(doc_id), matching the text
    dedup convention. (Oracle slices chars where Spark slices payload
    bytes — identical only while text is single-byte, which
    tests/test_extensions.py::test_documents_text_is_single_byte_chars
    pins explicitly (octet_length(text)==length(text) over ALL docs;
    ADVICE r5 — q_mm_meta compares bytes to bytes so it does not);
    DuckDB has no BLOB substring.)"""
    mm = multimodal_table(spark, sf_dir)
    digests = mm.select(
        "doc_id",
        F.md5(F.expr("substring(payload, 1, 32)")).alias("phash"),
    )
    return (
        digests.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )
