"""Algorithm-level property tests (hypothesis) for the r5 operator
batch — engine-free invariants that hold for ANY data, complementing
the fixture-bound oracle tests:

- skyline local-prune losslessness: partition the points arbitrarily,
  local-skyline each partition, global-skyline the union — must equal
  the brute-force skyline of all points (the dominance-transitivity
  argument operators/skyline.py relies on).
- bloom no-false-negative: every inserted key probes positive under
  the exact bit arithmetic both engines execute (word packing at 32
  bits, h60-derived positions).
- Efraimidis-Spirakis invariance: the selected sample is a pure
  function of (keys, weights) — independent of input order.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from datafusion_tpc_spark.operators.skyline import _local_skyline


def _brute_skyline(m: np.ndarray) -> set[int]:
    keep = set()
    for i in range(len(m)):
        dominated = ((m >= m[i]).all(axis=1) & (m > m[i]).any(axis=1)).any()
        if not dominated:
            keep.add(i)
    return keep


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.integers(1, 5),
)
def test_skyline_local_prune_is_lossless(pts, n_parts):
    df = pd.DataFrame(pts, columns=["n_parts", "n_orders", "n_items"])
    df.insert(0, "suppkey", range(len(df)))
    # arbitrary partitioning
    parts = [df.iloc[i::n_parts] for i in range(n_parts)]
    local = pd.concat(list(_local_skyline(iter(parts))), ignore_index=True)
    # global pass over the pruned candidates
    glob = pd.concat(list(_local_skyline(iter([local]))), ignore_index=True)
    got = set(glob["suppkey"])
    m = df[["n_parts", "n_orders", "n_items"]].to_numpy()
    expected_rows = _brute_skyline(m)
    # brute skyline keeps every non-dominated ROW; dedupe identical
    # points the same way the pipeline does (all copies survive —
    # dominance is strict).
    expected = set(df.iloc[list(expected_rows)]["suppkey"])
    assert got == expected


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bloom_words(keys, m=4096, word=32):
    words: dict[int, int] = {}
    for k in keys:
        for j in range(3):
            pos = _h60(f"bloom{j}:{k}") % m
            words[pos // word] = words.get(pos // word, 0) | (1 << (pos % word))
    return words


@settings(max_examples=40, deadline=None, derandomize=True)
@given(keys=st.sets(st.integers(0, 10**9), min_size=1, max_size=500))
def test_bloom_never_false_negative(keys):
    words = _bloom_words(keys)
    for k in keys:
        for j in range(3):
            pos = _h60(f"bloom{j}:{k}") % 4096
            assert words.get(pos // 32, 0) & (1 << (pos % 32)), (k, j)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    items=st.dictionaries(
        st.integers(0, 10**6), st.integers(1, 10**4), min_size=1, max_size=200
    ),
    seed=st.integers(0, 5),
)
def test_weighted_sample_order_invariant(items, seed):
    import math

    def select(pairs, k=10):
        pri = []
        for key, w in pairs:
            u = (_h60(f"ws:{key}") + 1) / float(1 << 60)
            pri.append((round(-math.log(u) / max(w, 1), 6), key))
        pri.sort()
        return [k2 for _, k2 in pri[:k]]

    pairs = list(items.items())
    rng = np.random.default_rng(seed)
    shuffled = list(pairs)
    rng.shuffle(shuffled)
    assert select(pairs) == select(shuffled)


# ---- Schank-Wagner degree orientation (r8, graph.py) -----------------
#
# q_graph_triangles orients each undirected edge from its (degree,
# id)-smaller endpoint to the larger and enumerates wedges as directed
# paths a→b→c. Engine-free invariants for ANY graph:
#   1. exactness — the oriented path-wedge enumeration closed by the
#      (a,c) edge finds every triangle exactly once;
#   2. the Schank-Wagner bound — every out-degree d satisfies
#      d·(d−1) ≤ 2m (each out-neighbor of v has (deg,id) ≥ v's, so v's
#      degree-many edges are matched by ≥ d(v)−1 edges at each of its
#      d(v) out-neighbors), the guarantee that kills hub-skew wedge
#      blowup regardless of id assignment.


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=80,
    )
)
def test_degree_orientation_triangles_exact_and_bounded(raw):
    from collections import Counter
    from itertools import combinations

    edges = {(min(u, v), max(u, v)) for u, v in raw if u != v}
    m = len(edges)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    key = lambda n: (deg[n], n)  # noqa: E731 — strict total order
    oriented = {(u, v) if key(u) < key(v) else (v, u) for u, v in edges}
    out = Counter(s for s, _ in oriented)
    # 2. Schank-Wagner out-degree bound
    for n, d in out.items():
        assert d * (d - 1) <= 2 * m, (n, d, m)
    # 1. path wedges a→b→c closed by (a,c), each triangle once
    found = Counter()
    for a, b in oriented:
        for b2, c in oriented:
            if b2 == b and (a, c) in oriented:
                found[frozenset((a, b, c))] += 1
    nodes = {n for e in edges for n in e}
    brute = {
        frozenset(t)
        for t in combinations(sorted(nodes), 3)
        if all(
            (min(x, y), max(x, y)) in edges for x, y in combinations(t, 2)
        )
    }
    assert set(found) == brute
    assert all(c == 1 for c in found.values()), found
