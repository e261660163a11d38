"""Connected components over an edge Dataset — the canonicalize merge.

Replaces the reference's order-dependent in-memory cluster merging
(``extract/dynamic_resolver.py:299-309``, ``corpus/resolver.py:341-442``)
with an order-independent union-find: the representative of every component
is the lexicographic-minimum node id (SURVEY.md C4), deterministic under any
parallelism / partitioning.

Two execution paths:

* ``components_driver`` — the distinct edge set is first reduced
  distributed (``groupby`` dedup) and, when small (vocabulary-sized — alias
  pairs are bounded by the surface vocabulary, not the corpus size), pulled
  to the driver for a classic union-find.  This is the default path.
* ``components_distributed`` — iterative min-label propagation entirely in
  Ray Data (hash ``join`` between the edge table and the label table per
  round) for edge sets too large to collect.  Converges in O(diameter)
  rounds.  Used by near-dup clustering where candidate-pair sets can be
  huge.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _dedup_edges(edges_ds: rd.Dataset) -> rd.Dataset:
    """Canonical undirected distinct edges (u < v), distributed dedup."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        u = df[["u", "v"]].min(axis=1)
        v = df[["u", "v"]].max(axis=1)
        out = pd.DataFrame({"u": u, "v": v})
        out = out[out["u"] != out["v"]]
        return out.drop_duplicates()

    canon_ds = edges_ds.map_batches(canon, batch_format="pandas")
    return canon_ds.groupby(["u", "v"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def union_find(pairs: list[tuple[str, str]], key=None) -> dict[str, str]:
    """In-memory union-find; representative = min-by-``key`` of component
    (default: lexicographic min node id).  ``key`` lets canonicalize prefer
    seed-known entity ids over freshly slugged ones when an alias statement
    bridges the two (reference behavior: the seed cluster absorbs,
    dynamic_resolver.py:299-309)."""
    key = key or (lambda x: x)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if key(ra) <= key(rb) else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def components_driver(edges_ds: rd.Dataset) -> dict[str, str]:
    """Distributed dedup → driver union-find. Returns {node: representative}
    for every node whose representative differs from itself is included too
    (full map over all touched nodes)."""
    pairs = [(r["u"], r["v"]) for r in _dedup_edges(edges_ds).take_all()]
    return union_find(pairs)


def components_distributed(edges_ds: rd.Dataset, max_iter: int = 20,
                           num_partitions: int = 16) -> rd.Dataset:
    """Min-label propagation over Ray Data only: returns Dataset(node, rep).

    Each round: labels(node) = min(labels(node), min over neighbors'
    labels).  Converges when no label changes; bounded by ``max_iter``.
    """
    edges = _dedup_edges(edges_ds).materialize()

    def explode_sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([df["u"], df["v"]], ignore_index=True),
            "nbr": pd.concat([df["v"], df["u"]], ignore_index=True),
        })

    sym = edges.map_batches(explode_sym, batch_format="pandas").materialize()
    labels = sym.groupby("node").map_groups(
        lambda g: pd.DataFrame({"node": [g["node"].iloc[0]],
                                "rep": [g["node"].iloc[0]]}),
        batch_format="pandas").materialize()

    for _ in range(max_iter):
        # nbr-side labels: join sym(node,nbr) with labels on nbr
        nbr_lab = sym.join(labels.map_batches(
            lambda df: df.rename(columns={"node": "nbr"}),
            batch_format="pandas"), join_type="inner",
            num_partitions=num_partitions, on=("nbr",))
        cand = nbr_lab.map_batches(
            lambda df: df[["node", "rep"]], batch_format="pandas")
        new_labels = cand.union(labels).groupby("node").map_groups(
            lambda g: pd.DataFrame({"node": [g["node"].iloc[0]],
                                    "rep": [g["rep"].min()]}),
            batch_format="pandas").materialize()
        # convergence check: any change?
        joined = new_labels.join(labels, join_type="inner",
                                 num_partitions=num_partitions,
                                 on=("node",), right_suffix="_old")
        changed = joined.map_batches(
            lambda df: pd.DataFrame(
                {"c": [int((df["rep"] != df["rep_old"]).sum())]}),
            batch_format="pandas").sum("c")
        labels = new_labels
        if not changed:
            break
    return labels
