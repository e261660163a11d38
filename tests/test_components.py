"""Union-find / connected-components tests (canonicalize C4-C6)."""

import pandas as pd

from raykg.stages import components


def test_union_find_chain():
    rep = components.union_find([("b", "c"), ("a", "b"), ("d", "e")])
    assert rep["b"] == "a" and rep["c"] == "a"
    assert rep["e"] == "d"


def test_union_find_deterministic_under_order():
    pairs = [("x", "y"), ("y", "z"), ("w", "x")]
    r1 = components.union_find(pairs)
    r2 = components.union_find(list(reversed(pairs)))
    assert r1 == r2
    assert all(v == "w" for v in r1.values())


def test_union_find_key_priority():
    # seed-known id wins over lexicographically smaller unknown id
    known = {"zed"}
    rep = components.union_find(
        [("alpha", "zed")], key=lambda x: (0 if x in known else 1, x))
    assert rep["alpha"] == "zed"


def test_components_driver(ray_session):
    import ray.data as rd
    edges = rd.from_pandas(pd.DataFrame(
        {"u": ["b", "c", "e", "b"], "v": ["a", "b", "f", "a"]}))
    rep = components.components_driver(edges)
    assert rep["b"] == "a" and rep["c"] == "a"
    assert rep["f"] == "e"


def test_components_distributed(ray_session):
    import ray.data as rd
    edges = rd.from_pandas(pd.DataFrame(
        {"u": ["b", "c", "d"], "v": ["a", "b", "c"]}))   # chain depth 3
    labels = components.components_distributed(edges, num_partitions=2)
    got = {r["node"]: r["rep"] for r in labels.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_graph_assembly_merge():
    # A1 merge semantics (models/relationships.py:114-125):
    # k candidates with same (s,p,o) → mention_count=k, passage set-union
    from raykg.pipelines.kg import triples_bucket
    # partial rows keyed (s,p,o,unit) — u1 seen by two batches (dup row)
    g = pd.DataFrame({
        "subj_id": ["a"] * 4, "pred": ["MET"] * 4, "obj_id": ["b"] * 4,
        "unit_id": ["u1", "u1", "u2", "u3"],
        "cnt": [1, 1, 1, 1], "confidence": [0.7, 0.9, 0.9, 0.8],
    })
    out = triples_bucket(g)
    assert out["mention_count"].iloc[0] == 4
    assert out["passage_ids_str"].iloc[0] == "u1\x1fu2\x1fu3"
    assert out["n_units"].iloc[0] == 3
    assert out["confidence"].iloc[0] == 0.9


def test_hashagg_extreme_skew(ray_session):
    # hot-key skew (north-rule salting obligation): one key owning 90% of
    # rows must still aggregate exactly — combiners compress it to one row
    # per batch before the shuffle
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from raykg.functions import hashagg
    n = 200_000
    keys = np.where(np.arange(n) % 10 < 9, "self",
                    np.char.add("k", (np.arange(n) % 997).astype(str)))
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": 1})).repartition(16)
    out = hashagg.sum_col(ds, ["k"], "v").to_pandas()
    assert int(out.loc[out["k"] == "self", "v"].iloc[0]) == (n // 10) * 9
    assert int(out["v"].sum()) == n
    assert out["k"].nunique() == len(out)


def test_components_distributed_nonconvergence_raises(ray_session):
    import ray.data as rd
    import pytest as pt
    edges = rd.from_pandas(pd.DataFrame(
        {"u": ["b", "c", "d", "e"], "v": ["a", "b", "c", "d"]}))  # diam 4
    with pt.raises(RuntimeError, match="did not converge"):
        components.components_distributed(edges, max_iter=1)


def test_components_distributed_long_chain(ray_session):
    """VERDICT r3 item 1: a single chain component whose diameter (1199)
    far exceeds the round budget must converge — pointer doubling makes
    rounds O(log diameter), so ~13 rounds instead of ~1200.  Labels must
    equal the driver union_find exactly, and the min id sits at one END
    of the chain so reach must genuinely span the full diameter."""
    import numpy as np
    import ray.data as rd
    n = 1_200
    ids = [f"c{i:05d}" for i in range(n)]        # path order == id order
    df = pd.DataFrame({"u": ids[:-1], "v": ids[1:]})
    # shuffle edge order so convergence can't lean on block locality
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    edges = rd.from_pandas(df).repartition(8)
    labels = components.components_distributed(edges, num_partitions=4)
    got = labels.to_pandas()
    assert len(got) == n
    assert (got["rep"] == "c00000").all()


def test_components_distributed_1m_edges(ray_session):
    # round-2 item 7: large-edge-set clustering on the hashagg primitives
    # must match driver union_find exactly, within a time budget
    import time
    import numpy as np
    import ray.data as rd
    n = 1_000_000
    rng = np.random.RandomState(7)
    # 100k star components of ~10 edges each (diameter 2) + some chains
    centers = rng.randint(0, 100_000, size=n)
    leaves = np.arange(n) + 100_000
    df = pd.DataFrame({"u": np.char.add("n", centers.astype(str)),
                       "v": np.char.add("n", leaves.astype(str))})
    edges = rd.from_pandas(df).repartition(16)
    t0 = time.time()
    labels = components.components_distributed(edges, num_partitions=16)
    got = labels.to_pandas()
    elapsed = time.time() - t0
    expect = components.union_find(list(zip(df["u"], df["v"])))
    exp_df = pd.DataFrame({"node": list(expect), "rep_exp":
                           list(expect.values())})
    merged = got.merge(exp_df, on="node", how="inner")
    assert len(merged) == len(exp_df)
    assert (merged["rep"] == merged["rep_exp"]).all()
    # time budget: 38 s at 16 CPUs; generous margin for the 4-CPU fixture
    assert elapsed < 420, f"1M-edge clustering took {elapsed:.0f}s"


def test_sum_col_contiguous_boundary_repair(ray_session):
    """sum_col_contiguous == global groupby-sum when contig-key runs
    straddle block boundaries (a unit spanning 1, 2 and 3+ blocks, a unit
    occupying an entire middle block, and in-block duplicate keys)."""
    import pyarrow as pa
    import ray.data as rd
    from raykg.functions import hashagg

    # file order: u1 u1 | u1 u2 u2 | u2 | u2 u3 | u3 u3 u3 u3 (5 blocks)
    blocks = [
        [("e1", "u1", 1), ("e2", "u1", 2)],
        [("e1", "u1", 4), ("e1", "u2", 1), ("e1", "u2", 1)],
        [("e1", "u2", 8)],                      # whole block one unit
        [("e3", "u2", 16), ("e1", "u3", 1)],
        [("e1", "u3", 2), ("e2", "u3", 1), ("e1", "u3", 4), ("e4", "u3", 8)],
    ]
    refs = [pa.table({"entity_id": [r[0] for r in b],
                      "unit_id": [r[1] for r in b],
                      "n_occurrences": [r[2] for r in b]}) for b in blocks]
    ds = rd.from_arrow(refs)
    out = (hashagg.sum_col_contiguous(ds, ["entity_id", "unit_id"],
                                      "n_occurrences", contig_key="unit_id",
                                      name="mention_count")
           .to_pandas().sort_values(["entity_id", "unit_id"])
           .reset_index(drop=True))
    expect = (pd.DataFrame(
        [r for b in blocks for r in b],
        columns=["entity_id", "unit_id", "n_occurrences"])
        .groupby(["entity_id", "unit_id"], as_index=False)["n_occurrences"]
        .sum().rename(columns={"n_occurrences": "mention_count"})
        .sort_values(["entity_id", "unit_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, expect)
    assert len(out) == out[["entity_id", "unit_id"]].drop_duplicates().shape[0]


def test_range_grouped_apply_sorted_and_exact(ray_session):
    """range_grouped_apply must (a) aggregate exactly per key like
    grouped_apply, and (b) emit a globally key-sorted stream when the
    bucket fn sorts, with keys split across blocks and duplicate keys."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from raykg.functions import hashagg

    rng = np.random.default_rng(7)
    n = 5_000
    ks = np.char.add("k", rng.integers(0, 400, n).astype(str))
    df = pd.DataFrame({"k": ks, "v": rng.integers(1, 5, n)})
    ds = rd.from_pandas(df).repartition(13)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("k", as_index=False)["v"].sum()
                .sort_values("k").reset_index(drop=True))

    out = hashagg.range_grouped_apply(ds, ["k"], bucket_sum,
                                      num_buckets=8).to_pandas()
    out = out[out["k"].notna()].reset_index(drop=True)
    expect = (df.groupby("k", as_index=False)["v"].sum()
              .sort_values("k").reset_index(drop=True))
    # exactness: same rows regardless of order
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True), expect)
    # global order: the emitted stream is already sorted by key
    assert list(out["k"]) == sorted(out["k"])


def test_drop_empty_blocks(ray_session):
    """drop_empty_blocks removes zero-row (incl. zero-COLUMN) blocks while
    preserving rows exactly, across mixed arrow/pandas block types; a
    clean dataset passes through; an all-empty dataset is returned as-is
    (callers handle schema)."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd
    from raykg.functions import hashagg

    def n_empty(ds):
        return sum(1 for b in ds.materialize().iter_internal_ref_bundles()
                   for _, m in b.blocks if not m.num_rows)

    # mixed: schema'd arrow + ZERO-COLUMN arrow empty + pandas blocks
    mixed = rd.from_arrow(
        [pa.table({"u": pa.array([1, 2], pa.int64())}), pa.table({})]
    ).union(rd.from_pandas([pd.DataFrame({"u": [3]}),
                            pd.DataFrame({"u": pd.Series([], dtype="int64")})]))
    assert n_empty(mixed) == 2
    clean = hashagg.drop_empty_blocks(mixed)
    assert n_empty(clean) == 0
    assert sorted(clean.to_pandas()["u"]) == [1, 2, 3]

    # clean dataset: no rebuild, same rows
    ds = rd.from_pandas(pd.DataFrame({"u": [5, 6]}))
    out = hashagg.drop_empty_blocks(ds)
    assert n_empty(out) == 0 and sorted(out.to_pandas()["u"]) == [5, 6]

    # all-empty: returned materialized, still count()==0
    empty = rd.from_arrow(pa.table({}))
    assert hashagg.drop_empty_blocks(empty).count() == 0
