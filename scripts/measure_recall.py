"""Quantitative recall for the LSH family (VERDICT r3 item 4).

The three rows-only near-dup queries are candidate GENERATORS whose
correctness is recall against the exact method, not a SQL oracle:

* ``dedup_minhash_pairs`` recall vs the exact prefix-filter Jaccard join
  (``dedup_jaccard_pairs`` — lossless candidate generation + exact
  verify, itself oracle-checked);
* ``ann_lsh`` recall vs the brute-force cosine top-k (``ann_topk``,
  oracle-checked);
* ``simhash`` separation: mean Hamming distance over TRUE near-dup pairs
  must sit far below the distance over random non-dup pairs.

Usage: python scripts/measure_recall.py [sf_dir]   (default sf0.01)
Prints one JSON line; recorded in BASELINE.md; tests/test_breadth_ops.py
asserts the bounds every run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(sf_dir: str) -> dict:
    import numpy as np

    from raykg.pipelines import queries as Q

    jac = Q.q_dedup_jaccard_pairs(sf_dir).to_pandas()
    truth = {(int(a), int(b)) for a, b in zip(jac["doc_a"], jac["doc_b"])}
    mh = Q.q_dedup_minhash_pairs(sf_dir).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(mh["doc_a"], mh["doc_b"])}
    minhash_recall = (len(truth & got) / len(truth)) if truth else 1.0

    topk = Q.q_ann_topk(sf_dir).to_pandas()
    ann_truth = {(int(q), int(v)) for q, v in
                 zip(topk["query_id"], topk["vec_id"])}
    lsh = Q.q_ann_lsh(sf_dir).to_pandas()
    ann_got = {(int(q), int(v)) for q, v in
               zip(lsh["query_id"], lsh["vec_id"])}
    ann_recall = (len(ann_truth & ann_got) / len(ann_truth)) if ann_truth \
        else 1.0

    ivf = Q.q_ann_ivf(sf_dir).to_pandas()
    ivf_got = {(int(q), int(v)) for q, v in
               zip(ivf["query_id"], ivf["vec_id"])}
    ivf_recall = (len(ann_truth & ivf_got) / len(ann_truth)) if ann_truth \
        else 1.0

    # simhash separation: near-dup pairs vs random non-dup pairs
    sh = Q.q_simhash(sf_dir).to_pandas()
    fp = {int(d): int(h, 16) for d, h in zip(sh["doc_id"],
                                             sh["simhash_hex"])}

    def ham(a: int, b: int) -> int:
        return bin(fp[a] ^ fp[b]).count("1")

    dup_d = [ham(a, b) for a, b in truth if a in fp and b in fp]
    rng = np.random.RandomState(5)
    ids = sorted(fp)
    rand_pairs = set()
    # cap the target at the number of distinct non-dup pairs that actually
    # exist — on a tiny corpus (or one that is mostly duplicates) the
    # uncapped target exceeds C(n,2) − |truth| and the loop never ends
    n_non_dup = len(ids) * (len(ids) - 1) // 2 - len(truth)
    target = min(max(200, len(truth) * 4), max(n_non_dup, 0))
    while len(rand_pairs) < target:
        a, b = rng.choice(len(ids), 2, replace=False)
        p = (ids[min(a, b)], ids[max(a, b)])
        if p not in truth:
            rand_pairs.add(p)
    rand_d = [ham(a, b) for a, b in rand_pairs]
    return {
        "metric": "lsh_recall",
        "sf_dir": sf_dir,
        "n_true_jaccard_pairs": len(truth),
        "minhash_recall": round(minhash_recall, 4),
        "n_true_topk": len(ann_truth),
        "ann_lsh_recall": round(ann_recall, 4),
        "ann_ivf_recall": round(ivf_recall, 4),
        "simhash_mean_hamming_dup": round(float(np.mean(dup_d)), 2)
        if dup_d else None,
        "simhash_mean_hamming_random": round(float(np.mean(rand_d)), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    print(json.dumps(measure(sf_dir)))
    ray.shutdown()


if __name__ == "__main__":
    main()
