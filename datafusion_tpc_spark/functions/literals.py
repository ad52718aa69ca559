"""JVM-side literal DataFrames for bounded collected scalars.

`spark.createDataFrame(list_of_rows)` parallelizes a Python RDD, so
the literal side of a serving plan executes as `Scan ExistingRDD` —
outside whole-stage codegen and with ~0.2-0.4 s of per-action RDD
scheduling overhead (measured r13 on q_dedup_decontam_served: the two
RDD-backed literals were 0.72 → 0.24 s of the serving read, 3×,
row-identical; queries/sql_shapes.py's q_join_fuzzy found the same
overhead in r10 and inlined VALUES by hand). A SQL VALUES relation is
a pure-JVM LocalTableScan — this helper is the shared form of that
idiom for the probe/base frames every serving path collects.

Registration-free module on purpose (the functions/digest.py
precedent): operators import it without dragging query registrations.
"""

from __future__ import annotations


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(int(v))
    if isinstance(v, float):
        # D suffix forces a DOUBLE literal (bare decimals parse as
        # DECIMAL in Spark SQL — the 0.5D gotcha); repr of the
        # normalized builtin float is the shortest round-trip
        # decimal, so the value is bit-exact. float(v) strips float
        # subclasses (np.float64 passes isinstance but its repr is
        # 'np.float64(1.5)' under numpy>=2 — a parse error waiting
        # for an env bump).
        v = float(v)
        if v != v or v in (float("inf"), float("-inf")):
            return f"CAST('{v}' AS DOUBLE)"
        return repr(v) + "D"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_lit(x) for x in v) + ")"
    # Escape backslashes BEFORE quote-doubling: Spark's default parser
    # (escapedStringLiterals off) treats backslash as a C-style escape,
    # so an unescaped '\' corrupts the cell ('back\slash'→'backslash')
    # and a trailing '\' escapes the closing quote (ParseException).
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return f"'{s}'"


def values_df(spark, rows, schema: str):
    """LocalTableScan literal frame from bounded collected rows.

    ``rows``: non-empty sequence of tuples (int/float/str/bool/None/
    flat list cells). ``schema``: the createDataFrame-style DDL
    string it replaces, e.g. ``"doc_id long, h long, cnt long"`` —
    every column is CAST to its declared type so join/agg typing is
    identical to the createDataFrame form (float cells are emitted as
    DOUBLE literals and narrowed by that CAST when the declared type
    is FLOAT — round-to-nearest, same as createDataFrame). The parser
    splits each field on its LAST space, so types containing spaces
    (``decimal(10, 2)``) must be written spaceless
    (``decimal(10,2)``) — ENFORCED below, a space-containing type
    would otherwise silently mis-split into a bogus name/type pair.
    Raises on empty input (VALUES has no empty form; callers guard
    the no-rows case already)."""
    rows = list(rows)
    if not rows:
        raise ValueError("values_df requires at least one row")
    # Depth-aware field split: commas inside type parens/brackets
    # (decimal(10,2), map<string,int>) are NOT field separators.
    parts, depth, buf = [], 0, []
    for ch in schema:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    fields = [f.strip().rsplit(" ", 1) for f in parts]
    for nt in fields:
        if len(nt) != 2 or " " in nt[1] or not nt[0].replace("_", "a").isalnum():
            raise ValueError(
                f"values_df schema field {' '.join(nt)!r}: write types "
                "spaceless (decimal(10,2), not decimal(10, 2))"
            )
    names = ", ".join(n for n, _ in fields)
    proj = ", ".join(f"CAST({n} AS {t.upper()}) AS {n}" for n, t in fields)
    vals = ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    return spark.sql(
        f"SELECT {proj} FROM (VALUES {vals}) AS t({names})"
    )
