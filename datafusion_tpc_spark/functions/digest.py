"""Deterministic cross-engine digest family (moved from
operators/dedup.py in round 5 so query modules can share it without
importing dedup's query registrations — registry.load_all order is
the driver-verification window and a transitive import would drag
dedup's 8 queries into it).

h60 is the determinism backbone of the dedup/sampling/packing layer:
every pseudo-random decision (MinHash permutations, sampling buckets,
pack shards, sign-LSH projections) derives from md5 so Spark and the
DuckDB oracle agree bit-for-bit (SURVEY §7/M5, driver seed=42
convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def h60(col):
    """Deterministic 60-bit hash shared with DuckDB: first 15 hex chars
    of md5 as integer."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _h60_duck(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def cosine(a, b):
    """Cosine similarity of two array<double> columns — sequential
    left-fold on both engines, bit-stable across Spark and DuckDB.
    (Moved from operators/dedup.py in round 7 so similarity/retrieval
    can import it without dragging dedup's query registrations into
    the driver window.)"""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)
