"""values_df / _sql_lit edge hardening (VERDICT r13 item 5, ADVICE r13).

values_df is load-bearing shared infrastructure in ~10 serving/query
paths; these pin the documented edges the callers do not currently
hit: string escaping (backslash/quote/tab), NULL, bool, non-finite
floats, list cells, float-subclass normalization, FLOAT narrowing,
paren-aware schema splitting, and the loud failures (empty rows,
space-containing types).
"""

from __future__ import annotations

import math

import pytest

from datafusion_tpc_spark.functions.literals import _sql_lit, values_df


def test_string_escapes_round_trip(spark):
    # The r13 ADVICE case: Spark's default parser treats backslash as
    # a C-style escape, so an unescaped '\' silently corrupts the cell
    # and a trailing '\' escapes the closing quote (ParseException).
    cells = [
        "back\\slash",
        "trailing\\",
        "it's",
        "tab\there",
        "new\nline",
        "quote'and\\both''",
        "\\",
    ]
    df = values_df(spark, [(i, s) for i, s in enumerate(cells)], "i int, s string")
    got = {r.i: r.s for r in df.collect()}
    assert got == dict(enumerate(cells))


def test_null_bool_and_nonfinite_floats(spark):
    rows = [
        (1, None, True, float("nan")),
        (2, "x", False, float("inf")),
        (3, None, None, float("-inf")),
        (4, "y", True, 0.1),
    ]
    df = values_df(spark, rows, "i int, s string, b boolean, d double")
    got = {r.i: (r.s, r.b, r.d) for r in df.collect()}
    assert got[1][0] is None and got[1][1] is True and math.isnan(got[1][2])
    assert got[2] == ("x", False, float("inf"))
    assert got[3][1] is None and got[3][2] == float("-inf")
    assert got[4] == ("y", True, 0.1)  # repr round-trip is bit-exact


def test_list_cells_and_double_bit_exactness(spark):
    vec = [0.1, -2.5e-17, 3.0, float(2**53 + 1)]
    df = values_df(spark, [(7, vec)], "k int, v array<double>")
    row = df.collect()[0]
    assert row.k == 7 and list(row.v) == vec


def test_float_subclass_normalized(spark):
    # np.float64 subclasses float; under numpy>=2 its repr is
    # 'np.float64(1.5)' — _sql_lit must normalize via float() first.
    class F(float):
        def __repr__(self):
            return f"weird({float(self)})"

    assert _sql_lit(F(1.5)) == "1.5D"

    class I(int):
        def __repr__(self):
            return f"weird({int(self)})"

    assert _sql_lit(I(42)) == "42"
    df = values_df(spark, [(F(2.25), I(3))], "x double, y long")
    assert df.collect()[0] == (2.25, 3)


def test_float_column_narrowing(spark):
    # Declared FLOAT narrows the DOUBLE literal by CAST —
    # round-to-nearest, identical to the createDataFrame form.
    df = values_df(spark, [(0.1,)], "x float")
    assert df.schema["x"].dataType.simpleString() == "float"
    import struct

    expected = struct.unpack("f", struct.pack("f", 0.1))[0]
    assert df.collect()[0].x == pytest.approx(expected, abs=0.0)


def test_paren_aware_schema_split(spark):
    # decimal(10,2) contains a comma; map<string,int> too — neither
    # is a field separator.
    df = values_df(
        spark, [("9.50", 1)], "amt decimal(10,2), k int"
    )
    assert df.schema["amt"].dataType.simpleString() == "decimal(10,2)"
    assert str(df.collect()[0].amt) == "9.50"


def test_space_containing_type_is_loud():
    with pytest.raises(ValueError, match="spaceless"):
        values_df(None, [(1,)], "amt decimal(10, 2)")


def test_empty_rows_is_loud():
    with pytest.raises(ValueError, match="at least one row"):
        values_df(None, [], "x int")


def test_plan_is_local_table_scan(spark):
    # The whole point of the helper: a pure-JVM LocalTableScan, not a
    # Python-RDD `Scan ExistingRDD`.
    plan = values_df(spark, [(1, "a")], "i int, s string")._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
