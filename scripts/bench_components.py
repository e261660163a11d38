"""Round-1/2 follow-up: demonstrate ``components_distributed`` at the 1M-edge
mark (VERDICT r2 item 8) — near-dup-shaped synthetic edge set, wall-time
budget, and label parity vs the driver ``union_find`` oracle.

Edge shape mirrors near-dup clustering output (the consumer of this
primitive): a long tail of small clusters (pairs/triples/short paths — the
typical near-duplicate group) plus a few 20k-node hot stars (one viral
document duplicated across the corpus — the skew case the north rule warns
about).  Stars have diameter 2, paths ≤ 4, so min-label propagation
converges in a handful of rounds; the per-round cost is the bucketed
hashagg exchange, which is what this benchmark times.

Usage: python scripts/bench_components.py [n_edges]
Prints one JSON line; recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_edges(target_edges: int) -> pd.DataFrame:
    """Deterministic near-dup-shaped edge list (~target_edges rows)."""
    frames = []
    total = 0
    # 2 hot stars of 20k leaves each (skew case): hub = min id in cluster
    for s in range(2):
        hub = f"star{s}_0000000"
        leaves = [f"star{s}_{i:07d}" for i in range(1, 20_001)]
        frames.append(pd.DataFrame({"u": hub, "v": leaves}))
        total += len(leaves)
    # small path clusters of size 2-5 until the edge target is met
    sizes = np.tile([2, 3, 2, 5, 2, 4, 3, 2], 65_536)
    cid = 0
    chunk_u, chunk_v = [], []
    for size in sizes:
        if total >= target_edges:
            break
        ids = [f"c{cid:07d}_{j}" for j in range(size)]
        chunk_u.extend(ids[:-1])
        chunk_v.extend(ids[1:])
        total += size - 1
        cid += 1
    frames.append(pd.DataFrame({"u": chunk_u, "v": chunk_v}))
    return pd.concat(frames, ignore_index=True)


def make_chain(n: int):
    """Single path component of diameter n-1 with the min id at one end —
    the transitive-chain shape (A≈B≈C≈… templated-doc families) that
    defeats plain O(diameter) label propagation.  Pointer doubling
    (components.DOUBLE_FROM onward) converges it in ~log2(n) rounds."""
    import pandas as pd
    ids = [f"c{i:07d}" for i in range(n)]
    return (pd.DataFrame({"u": ids[:-1], "v": ids[1:]})
            .sample(frac=1.0, random_state=11).reset_index(drop=True))


def main() -> None:
    chain = "--chain" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    target = int(args[0]) if args else (5_000 if chain else 1_000_000)
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from raykg.stages import components as comp

    df = make_chain(target) if chain else make_edges(target)
    n_edges = len(df)
    # split into blocks so the pipeline starts parallel (as a real
    # near-dup candidate stage would deliver them)
    parts = np.array_split(df, 64)
    ds = rd.from_pandas(list(parts))

    t0 = time.time()
    labels = comp.components_distributed(ds, num_partitions=32)
    out = labels.to_pandas()
    wall = time.time() - t0

    # oracle: driver union-find over the same edges
    t1 = time.time()
    expect = comp.union_find(list(zip(df["u"], df["v"])))
    uf_wall = time.time() - t1
    got = dict(zip(out["node"], out["rep"]))
    # union_find omits self-representative nodes from its map
    mismatch = sum(1 for k, v in got.items() if expect.get(k, k) != v)
    assert len(got) == len(set(df["u"]) | set(df["v"])), "node set mismatch"
    assert mismatch == 0, f"{mismatch} label mismatches vs union_find"

    print(json.dumps({
        "metric": ("components_chain_sec" if chain
                   else "components_1m_sec"), "value": round(wall, 2),
        "unit": "sec", "n_edges": n_edges, "n_nodes": len(got),
        "parity_vs_union_find": "exact",
        "union_find_driver_sec": round(uf_wall, 2),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
