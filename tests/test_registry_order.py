"""Registration-order invariants (ADVICE r2, registry.py).

The external driver verifies queries in dict-insertion order with a
bounded window (50 rows in rounds 1-2). load_all() deliberately points
that window at the modules changed this round — but nothing enforced
the ordering, so a query added to an earlier-imported module silently
shifted the window. This pins the window contents: adding/moving a
query now fails HERE, prompting a deliberate re-point instead of a
silent coverage hole.
"""

from __future__ import annotations

from datafusion_tpc_spark import registry

registry.load_all()

# The round-4 driver window (VERDICT r3 items 3+6): the 9
# never-driver-verified ids first via their modules (tpch incl. NEW
# q4/q6, udfs, scalar_functions, events, stream_queries — the latter
# carrying the r4 ts-unit fix), then the stalest r1-only green
# modules (joins, windows, sorts) to fill exactly 50.
EXPECTED_WINDOW_50 = [
    "q_tpch_q1",
    "q_tpch_q10",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q18",
    "q_udf",
    "q_udf_iter",
    "q_udf_grouped_map",
    "q_udtf",
    "q_fn_math",
    "q_fn_string",
    "q_fn_regex",
    "q_fn_hash",
    "q_fn_nondet",
    "q_explode",
    "q_fn_struct",
    "q_fn_blake",
    "q_fn_blake3",
    "q_fn_json",
    "q_agg_avg",
    "q_fn_date",
    "q_fn_datebin",
    "q_evt_tumble",
    "q_evt_session",
    "q_evt_hop",
    "q_stream_tumble",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_stateful",
    "q_stream_join",
    "q_stream_enrich",
    "q_stream_hop",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_join_residual",
    "q_join_salted",
    "q_win_rank",
    "q_win_lag",
    "q_win_movavg",
    "q_win_range",
    "q_win_dist",
]


def test_driver_window_contents():
    assert list(registry.QUERIES)[:50] == EXPECTED_WINDOW_50


def test_every_query_has_callable_and_oracle_subset():
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    assert set(registry.ORACLE) <= set(registry.QUERIES)
