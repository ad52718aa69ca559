"""Digest helpers beyond Spark's built-ins — SURVEY.md §2.8.

The reference links blake2/blake3 into datafusion-physical-expr via
its `digest` scalar function (reference Cargo.lock:1222-1223). Spark
ships md5/sha1/sha2 natively (covered by q_fn_hash); blake2b comes
from Python stdlib hashlib wrapped in an Arrow-vectorized pandas_udf
here. blake3 has no stdlib implementation and its wheel is not in
this container, so it gates behind an import probe and degrades to a
clear error instead of an ImportError mid-query.

Scale note: a pandas_udf digest is the documented slow path vs JVM
md5/sha2 (one Arrow hop per batch) — use it only for the algorithms
Spark lacks; the per-batch loop itself is C-speed hashlib.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("string")
def blake2b_hex(s: pd.Series) -> pd.Series:  # type: ignore[misc]
    """64-hex-char BLAKE2b-256 digest of a string column (stdlib
    hashlib — no extra dependency), NULL-preserving."""
    return s.map(
        lambda v: None
        if v is None
        else hashlib.blake2b(v.encode("utf-8"), digest_size=32).hexdigest()
    )


def blake3_hex():
    """BLAKE3 digest UDF. Prefers the `blake3` wheel (Rust-speed) when
    importable; otherwise falls back to the pure-Python spec
    implementation in functions/blake3_py.py (bit-exact, Python-speed
    — the documented slow seam; ship the wheel in production)."""
    try:
        import blake3

        def _digest(v: str) -> str:
            return blake3.blake3(v.encode("utf-8")).hexdigest()
    except ImportError:
        from datafusion_tpc_spark.functions.blake3_py import (
            blake3_hex as _py_blake3,
        )

        def _digest(v: str) -> str:
            return _py_blake3(v.encode("utf-8"))

    @F.pandas_udf("string")
    def _blake3_hex(s: pd.Series) -> pd.Series:  # type: ignore[misc]
        return s.map(lambda v: None if v is None else _digest(v))

    return _blake3_hex
