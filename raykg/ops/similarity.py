"""Similarity search over the ``embeddings`` table (list<float> column).

* brute-force cosine top-k — the baseline: a broadcast query matrix
  (``ray.put`` once) against every batch via one numpy matmul; per-batch
  local top-k partials → global top-k merge.  SQL-oracled via
  ``list_cosine_similarity``.
* LSH-bucketed variant     — random-hyperplane signs (seeded, deterministic)
  bucket vectors; candidates only from the query's bucket ± hamming-1
  probes.  The scale path: matmul cost drops from O(N) to O(bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOP_K = 5
N_QUERIES = 10           # queries = vec_id 0..9 (deterministic)
SIM_ROUND = 6
LSH_PLANES = 8
LSH_SEED = 42


def embedding_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, vecs


class CosineTopK:
    """map_batches callable: batch of embeddings → local top-k rows per
    query.  The query matrix is broadcast via ray.put → fetched once per
    actor (never re-shipped per batch)."""

    def __init__(self, query_ref):
        import ray
        q = ray.get(query_ref) if not isinstance(query_ref, tuple) else query_ref
        self.q_ids, qm = q
        norms = np.linalg.norm(qm, axis=1, keepdims=True)
        self.qn = qm / np.where(norms == 0, 1, norms)

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        ids, vecs = embedding_matrix(t)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.where(norms == 0, 1, norms)
        sims = self.qn @ vn.T                      # (nq, batch)
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        k = min(TOP_K + 1, sims.shape[1])          # +1 to survive self-hit
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            for j in idx:
                rows["query_id"].append(int(self.q_ids[qi]))
                rows["vec_id"].append(int(ids[j]))
                rows["cosine"].append(round(float(sims[qi, j]), SIM_ROUND))
        return pd.DataFrame(rows).astype({"query_id": "int64",
                                          "vec_id": "int64"})


def final_topk(g: pd.DataFrame) -> pd.DataFrame:
    """Global top-k per query from local partials: exclude self, rank by
    (rounded cosine desc, vec_id asc) — fully deterministic."""
    g = g[g["vec_id"] != g["query_id"]]
    g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(TOP_K)
    g = g.copy()
    g["rank"] = range(1, len(g) + 1)
    return g[["query_id", "vec_id", "cosine", "rank"]]


def lsh_signs(vecs: np.ndarray, dim: int, planes: int = LSH_PLANES,
              seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.RandomState(seed)
    hyper = rng.normal(size=(dim, planes))
    bits = (vecs @ hyper) >= 0
    return (bits @ (1 << np.arange(planes))).astype(np.int64)
