"""Property-based tests (hypothesis) for the engine's core algebra.

The reference has no property tests (SURVEY §5); these pin the invariants
parallel execution depends on: aggregation ≡ pandas groupby regardless of
partitioning, union-find ≡ connected components regardless of edge order,
fuzzy-ratio metric axioms.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raykg.functions import textnorm
from raykg.stages.components import union_find

_small = st.integers(min_value=0, max_value=9)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_small, _small), max_size=40),
       st.randoms(use_true_random=False))
def test_union_find_matches_bfs_components(edges, rnd):
    # same partition as BFS connected components, for ANY edge order
    shuffled = list(edges)
    rnd.shuffle(shuffled)
    rep = union_find([(f"n{a}", f"n{b}") for a, b in shuffled])
    # brute-force components
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
        adj.setdefault(f"n{b}", set()).add(f"n{a}")
    seen: dict[str, int] = {}
    comp = 0
    for start in sorted(adj):
        if start in seen:
            continue
        stack = [start]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen[n] = comp
            stack.extend(adj[n])
        comp += 1
    for a in adj:
        for b in adj:
            assert (seen[a] == seen[b]) == \
                (rep.get(a, a) == rep.get(b, b)), (a, b)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_small, _small), min_size=1, max_size=40))
def test_union_find_representative_is_min(edges):
    # deterministic representative = lexicographic min of the component
    rep = union_find([(f"n{a}", f"n{b}") for a, b in edges])
    groups: dict[str, list[str]] = {}
    for node, r in rep.items():
        groups.setdefault(r, []).append(node)
    for r, members in groups.items():
        assert r == min(members + [r])


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="abcdef ", max_size=12),
       st.text(alphabet="abcdef ", max_size=12))
def test_fuzzy_ratio_axioms(a, b):
    s = textnorm.fuzzy_ratio(a, b)
    assert 0.0 <= s <= 100.0
    assert s == textnorm.fuzzy_ratio(b, a)          # symmetric
    assert textnorm.fuzzy_ratio(a, a) == (100.0 if a else
                                          textnorm.fuzzy_ratio("", ""))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(1, 5)),
                min_size=1, max_size=300),
       st.integers(min_value=1, max_value=5))
def test_hashagg_equals_pandas_groupby(ray_session, rows, nparts):
    # bucketed two-phase sum ≡ pandas groupby sum, for ANY partitioning
    import ray.data as rd
    from raykg.functions import hashagg
    df = pd.DataFrame(rows, columns=["k", "v"])
    ds = rd.from_pandas(df).repartition(nparts)
    got = (hashagg.sum_col(ds, ["k"], "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = (df.groupby("k", as_index=False)["v"].sum()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "v": "int64"}),
        want.astype({"k": "int64", "v": "int64"}))
