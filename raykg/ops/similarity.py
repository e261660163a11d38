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


# Multi-table multiprobe LSH: a single hyperplane table has recall
# P(hamming<=r) per neighbor, which collapses on weakly-similar data (the
# measured single-table recall on the sf0.01 embeddings was 0.10 at
# top-5 cosine ~0.3).  L independent tables with radius-2 probes push
# recall to 1 - (1 - p_table)^L — measured 1.00 on the same data
# (scripts/measure_recall.py; tests assert >= 0.9 every run).
LSH_TABLES = 8
LSH_PROBE_RADIUS = 2


def lsh_planes_for(n_rows: int) -> int:
    """Bits per table sized to the corpus: ~64 vectors per bucket keeps
    per-probe candidate lists O(1) as N grows (at 500 rows -> 8 bits; at
    1e9 rows -> 24 bits, i.e. buckets stay ~64 wide while the probed
    fraction of the corpus shrinks as N grows)."""
    return max(LSH_PLANES, int(np.ceil(np.log2(max(2, n_rows / 64)))))


def probe_codes(code: int, planes: int,
                radius: int = LSH_PROBE_RADIUS) -> set[int]:
    """All bucket codes within Hamming ``radius`` of ``code`` —
    1 + k + k(k-1)/2 codes at radius 2 (37 at k=8, 301 at k=24)."""
    out = {code}
    for i in range(planes):
        out.add(code ^ (1 << i))
    if radius >= 2:
        for i in range(planes):
            for j in range(i + 1, planes):
                out.add(code ^ (1 << i) ^ (1 << j))
    return out


def lsh_plan(qm: np.ndarray, dim: int, n_rows: int
             ) -> tuple[int, list[dict[int, list[int]]]]:
    """Driver-side probe plan: per table, bucket code -> query positions
    probing it.  Size O(n_queries × probes × tables) — broadcast once."""
    planes = lsh_planes_for(n_rows)
    tables: list[dict[int, list[int]]] = []
    for table in range(LSH_TABLES):
        codes = lsh_signs(qm, dim, planes=planes, seed=LSH_SEED + table)
        probes: dict[int, list[int]] = {}
        for qpos, c in enumerate(codes):
            for b in probe_codes(int(c), planes):
                probes.setdefault(b, []).append(qpos)
        tables.append(probes)
    return planes, tables


class LshTopK:
    """map_batches callable for the multi-table LSH candidate scorer: per
    batch, union each query's candidates across all L tables (boolean
    mask — a vector is scored once however many tables surface it), then
    one matmul per query over only its candidates.  The probe plan is
    broadcast via ray.put → fetched once per actor."""

    def __init__(self, state_ref):
        from raykg.functions.broadcast import get_cached
        self.planes, self.tables, self.q_ids, self.qn, self.dim = \
            get_cached(state_ref)

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        ids, vecs = embedding_matrix(t)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.where(norms == 0, 1, norms)
        nq = len(self.q_ids)
        cand = np.zeros((nq, len(ids)), dtype=bool)
        for table, probes in enumerate(self.tables):
            codes = lsh_signs(vecs, self.dim, planes=self.planes,
                              seed=LSH_SEED + table)
            for b in np.unique(codes):
                qlist = probes.get(int(b))
                if qlist:
                    m = codes == b
                    for qpos in qlist:
                        cand[qpos] |= m
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        for qpos in range(nq):
            js = np.nonzero(cand[qpos])[0]
            if js.size == 0:
                continue
            sims = self.qn[qpos] @ vn[js].T
            k = min(TOP_K + 1, js.size)            # +1 to survive self-hit
            idx = np.argpartition(-sims, k - 1)[:k]
            for j in idx:
                rows["query_id"].append(int(self.q_ids[qpos]))
                rows["vec_id"].append(int(ids[js[j]]))
                rows["cosine"].append(round(float(sims[j]), SIM_ROUND))
        return pd.DataFrame(rows).astype({"query_id": "int64",
                                          "vec_id": "int64"})


# ------------------------------------------------------------- IVF ANN
# The other classic ANN scale path (complement to LSH): a coarse
# quantizer (k-means centroids) partitions the vector space into nlist
# inverted lists; each query probes only its NPROBE nearest lists, so
# scored candidates drop from O(N) to O(N * nprobe / nlist).  Centroids
# train on a deterministic hash-strided SAMPLE (distributed scan that
# ships only the sample to the driver — never the full table), the same
# pattern a 100 TB run would use.  Like the LSH path, scoring is a
# stateless broadcast map: assignment is one matmul per batch against
# the broadcast centroid matrix, so there is NO shuffle — only the final
# per-query top-k merge groups.
IVF_SAMPLE = 2048          # training-sample size (driver-side k-means)
IVF_ITERS = 10             # Lloyd iterations (deterministic init)
# Operating point tuned on the synthetic embeddings — deliberately
# HOSTILE data for IVF (top-5 neighbor cosine ~0.3, nearly unclustered),
# so the probe budget is generous: probe the nearest HALF of the lists
# and assign each vector to its top-IVF_ASSIGN lists (multi-assignment —
# a neighbor is found if ANY of its lists is probed).  Measured recall
# 0.25/single-assign 0.66 → 0.5/assign-2 0.94+ at sf0.01.  On genuinely
# clustered corpora the same code runs at a far smaller frac; candidates
# per query stay O(N·frac) with the constant shrinking as nlist ~ sqrt(N).
IVF_NPROBE_FRAC = 0.5
IVF_MIN_NPROBE = 4
IVF_ASSIGN = 2             # index-side multi-assignment width


def ivf_nlist(n_rows: int) -> int:
    """~sqrt(N) lists, clamped: candidate work per query is
    O(N * nprobe / nlist) = O(sqrt(N) * const) — the standard IVF
    operating point."""
    return int(np.clip(int(np.sqrt(max(4, n_rows))), 4, 4096))


def ivf_train(sample: np.ndarray, nlist: int,
              iters: int = IVF_ITERS) -> np.ndarray:
    """Deterministic Lloyd's k-means over the (normalized) sample.
    Init = evenly strided sample rows (a deterministic spread over the
    id-strided sample); empty lists re-seed to the point farthest from
    its centroid, so no list dies."""
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    x = sample / np.where(norms == 0, 1, norms)
    nlist = min(nlist, len(x))
    cent = x[np.linspace(0, len(x) - 1, nlist).astype(int)].copy()
    for _ in range(iters):
        sims = x @ cent.T                          # cosine == dot (unit)
        assign = np.argmax(sims, axis=1)
        for li in range(nlist):
            m = assign == li
            if m.any():
                c = x[m].mean(axis=0)
                n = np.linalg.norm(c)
                cent[li] = c / (n if n else 1)
            else:                                  # re-seed a dead list
                worst = int(np.argmin(sims[np.arange(len(x)), assign]))
                cent[li] = x[worst]
    return cent


def ivf_plan(qn: np.ndarray, cent: np.ndarray
             ) -> dict[int, list[int]]:
    """Driver-side probe plan: list_id -> query positions probing it
    (each query probes its NPROBE nearest centroids).  Size
    O(n_queries * nprobe) — broadcast once."""
    nlist = len(cent)
    nprobe = max(IVF_MIN_NPROBE, int(np.ceil(nlist * IVF_NPROBE_FRAC)))
    nprobe = min(nprobe, nlist)
    sims = qn @ cent.T                             # (nq, nlist)
    plan: dict[int, list[int]] = {}
    for qpos in range(len(qn)):
        idx = np.argpartition(-sims[qpos], nprobe - 1)[:nprobe]
        for li in idx:
            plan.setdefault(int(li), []).append(qpos)
    return plan


class IvfTopK:
    """map_batches callable for the IVF candidate scorer: assign the
    batch's vectors to their IVF_ASSIGN nearest centroids (one matmul
    against the broadcast centroid matrix), union each query's
    candidates across its probed lists (boolean mask — a vector in two
    probed lists is scored once), then one matmul per query over only
    its candidates.  State (centroids + plan + query matrix) is
    broadcast via ray.put -> fetched once per worker process."""

    def __init__(self, state_ref):
        from raykg.functions.broadcast import get_cached
        self.cent, self.plan, self.q_ids, self.qn = get_cached(state_ref)

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        ids, vecs = embedding_matrix(t)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.where(norms == 0, 1, norms)
        csims = vn @ self.cent.T                   # (batch, nlist)
        w = min(IVF_ASSIGN, csims.shape[1])
        assign = np.argpartition(-csims, w - 1, axis=1)[:, :w]
        nq = len(self.q_ids)
        cand = np.zeros((nq, len(ids)), dtype=bool)
        for li in np.unique(assign):
            qlist = self.plan.get(int(li))
            if qlist:
                m = (assign == li).any(axis=1)
                for qpos in qlist:
                    cand[qpos] |= m
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        for qpos in range(nq):
            js = np.nonzero(cand[qpos])[0]
            if js.size == 0:
                continue
            sims = self.qn[qpos] @ vn[js].T
            k = min(TOP_K + 1, js.size)            # +1 to survive self-hit
            idx = np.argpartition(-sims, k - 1)[:k]
            for j in idx:
                rows["query_id"].append(int(self.q_ids[qpos]))
                rows["vec_id"].append(int(ids[js[j]]))
                rows["cosine"].append(round(float(sims[j]), SIM_ROUND))
        return pd.DataFrame(rows).astype({"query_id": "int64",
                                          "vec_id": "int64"})
