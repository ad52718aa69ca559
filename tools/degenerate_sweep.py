"""Degenerate-input smoke sweep: run EVERY registered query against a
tiny fixture that includes the document shapes the driver testdata
never ships — empty text, one-word and two-word docs, a language
slice with no words — and report anything that THROWS.

Spark 4 runs with ANSI mode on, so expressions that silently returned
NULL/garbage in Spark 3 now raise (INVALID_ARRAY_INDEX,
DIVIDE_BY_ZERO, CAST_OVERFLOW). The r11 sweep caught four real
latent crashes this way: bracket indexing in the shingle transforms
(q_dedup_winnow*/q_text_fingerprint/every SHINGLES consumer) and
unguarded ratio divisions (q_text_stats punct_ratio, q_text_compress
ratio, q_text_readability syls_per_word/flesch).

Usage: python tools/degenerate_sweep.py
Exit code = number of crashing queries. Correctness of VALUES is the
oracle mirror's job — this sweep only asserts "executes without
throwing on inputs a real corpus will contain".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.degenerate import ensure_degenerate_fixture  # noqa: E402

from datafusion_tpc_spark import registry  # noqa: E402
from datafusion_tpc_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = ensure_degenerate_fixture()
    spark = get_spark()
    registry.load_all()
    errs = 0
    for name, fn in sorted(registry.QUERIES.items()):
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — smoke sweep
            errs += 1
            print(f"ERR {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
    print(f"degenerate sweep: {len(registry.QUERIES)} queries, {errs} crashes")
    return errs


if __name__ == "__main__":
    raise SystemExit(main())
