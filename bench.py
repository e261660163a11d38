#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline KG pipeline (corpus → units → extract → link →
canonicalize → materialize) over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line.

``--scaling``: run the same bench in two fresh processes at two CPU counts
(default 4 and 16 — the rule's N and 4N; override with GRAFT_SCALING_LO/HI)
on the same input and report both throughputs plus scaling
efficiency = (thr_hi / thr_lo) / (hi / lo)  (sandbox evidence for the
N→4N-nodes criterion; see BASELINE.md).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

# dedup_minhash_pairs is the scale path for near-dup (the exact
# prefix-filter Jaccard join stays oracle-checked at sf0.01; on the
# synthetic corpus's tiny shingle vocabulary its candidate set grows
# quadratically, so the bench exercises LSH — same verified output).
QUERY_SET = ["style_vocab", "style_fingerprint", "dedup_minhash_pairs",
             "ann_topk", "event_order", "kg_cooccurrence",
             "style_similarity", "lore_check", "voice_profiles",
             "kg_fuzzy_links", "style_chunks", "corpus_curation"]


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # map_groups legitimately emits zero-column blocks for empty sort
    # partitions; ray.data's executor warns on every one — noise, not
    # signal, in bench output
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from raykg.pipelines import kg
    from raykg.pipelines import queries as Q
    from raykg.sources import synthetic_corpus as sc

    # untimed: deterministic corpus generation + OS page-cache warm
    data_dir = sc.generate(sf_dir)
    import pyarrow.parquet as pq
    pq.read_table(os.path.join(data_dir, "corpus.parquet"))

    out_root = os.path.join("/tmp/raykg_bench",
                            f"{sc.sf_tag_of(sf_dir)}_cpus{ncpu}")
    shutil.rmtree(out_root, ignore_errors=True)
    # the dedup/curation chain persists its verified-pair stage for
    # cross-process resume (queries._dedup_ckpt_root); a bench must time
    # the COMPUTE, not a parquet re-read of the previous run's checkpoint
    os.environ["RAYKG_DEDUP_CKPT"] = os.path.join(out_root, "dedup_ckpt")

    queries: dict[str, float] = {}
    t0 = time.time()
    # stateless-task extract (worker singletons): regex extractors carry no
    # heavy model, so actor-pool startup (~3 s) is pure overhead here; pass
    # extract_concurrency=(1, N) when the extractor loads real models.
    paths = kg.build_kg(sf_dir, out_root=out_root, force=True)
    kg_sec = time.time() - t0
    queries["kg_pipeline"] = round(kg_sec, 3)

    import pyarrow.dataset as pads
    n_triples = pads.dataset(
        glob.glob(os.path.join(paths["triples"], "*.parquet"))).count_rows()

    # point the query cache at the freshly built pipeline outputs
    Q._KG_CACHE[sf_dir] = paths
    query_set = [] if os.environ.get("GRAFT_KG_ONLY") else QUERY_SET
    for name in query_set:
        t0 = time.time()
        res = Q.QUERY_FNS[name](sf_dir)
        if hasattr(res, "count"):
            res.count()          # consume: triggers full execution
        queries[name] = round(time.time() - t0, 3)

    sf_tag = sc.sf_tag_of(sf_dir)
    result = {
        "metric": "kg_e2e_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf_tag[2:]) if sf_tag.startswith("sf") else sf_tag,
        "num_cpus": ncpu,
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / kg_sec, 1),
    }
    ray.shutdown()
    return result


def run_child(ncpu: int, sf_dir: str | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    if sf_dir:
        env["GRAFT_SF_DIR"] = sf_dir
        env["GRAFT_KG_ONLY"] = "1"
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    if "--scaling" in sys.argv:
        # Scaling evidence must be measured where compute dominates the
        # fixed per-stage scheduling cost (~10 s total): at sf0.1 the whole
        # job runs in ~20 s and the two cluster sizes tie on overhead.  Use
        # a 5x synthetic corpus (the generator is a pure function of the sf
        # tag; the KG pipeline reads only the generated corpus).
        # sf4 (80k files): large enough that per-stage scheduling constants
        # (~13 s total, independent of data size) amortize into the
        # parallel work — the regime a real multi-node run lives in
        sf_dir = os.environ.get("GRAFT_SCALING_SF_DIR",
                                "/tmp/raykg_scaling/sf4")
        # DEFAULT: measure BOTH N→4N pairs — 4→16 (the half of this box
        # where CPUs, not the one shared memory bus, are the scaled
        # resource) AND 8→32 (which runs into the box's ~16-core
        # memory-bus knee; the r3 doubling curve at sf8 is
        # 1.12 / 0.88 / 0.73 per doubling 4→8→16→32).  Reporting only the
        # favorable pair would select the measurement that passes by
        # construction (ADVICE r3) — so both are always in the output;
        # the headline `scaling_efficiency` is the literal-rule 4→16
        # number, `scaling_efficiency_8_32` sits beside it, and
        # BASELINE.md carries the full analysis.  Setting
        # GRAFT_SCALING_LO / GRAFT_SCALING_HI measures just that pair.
        env_lo, env_hi = (os.environ.get("GRAFT_SCALING_LO"),
                          os.environ.get("GRAFT_SCALING_HI"))
        if env_lo or env_hi:
            pairs = [(int(env_lo or "4"), int(env_hi or "16"))]
        else:
            pairs = [(4, 16), (8, 32)]
        cpu_levels = sorted({c for p in pairs for c in p})
        run_child(cpu_levels[-1], sf_dir)   # generates corpus + warms cache
        legs: dict[int, dict] = {}
        for ncpu in cpu_levels:
            # sync + cooldown between legs: each leg writes ~GBs of
            # parquet to /tmp and the next leg's writes stall behind the
            # previous leg's writeback (measured ~30% inflation of the
            # short 32-CPU legs)
            os.sync(); time.sleep(30)
            legs[ncpu] = run_child(ncpu, sf_dir)
        out: dict = {"sf": legs[cpu_levels[0]]["sf"], "pairs": []}
        for lo, hi in pairs:
            thr_lo = legs[lo]["triples_per_sec"]
            thr_hi = legs[hi]["triples_per_sec"]
            eff = round((thr_hi / thr_lo) / (hi / lo), 3)
            out["pairs"].append({
                "cpus_lo": lo, "cpus_hi": hi,
                f"sec_{lo}": legs[lo]["value"],
                f"sec_{hi}": legs[hi]["value"],
                f"triples_per_sec_{lo}": thr_lo,
                f"triples_per_sec_{hi}": thr_hi,
                "scaling_efficiency": eff,
            })
            key = ("scaling_efficiency" if (lo, hi) == pairs[0]
                   else f"scaling_efficiency_{lo}_{hi}")
            out[key] = eff
        for lo, hi in pairs:
            out.update({f"sec_{lo}": legs[lo]["value"],
                        f"sec_{hi}": legs[hi]["value"],
                        f"triples_per_sec_{lo}": legs[lo]["triples_per_sec"],
                        f"triples_per_sec_{hi}": legs[hi]["triples_per_sec"]})
        out["cpus_lo"], out["cpus_hi"] = pairs[0]
        print(json.dumps(out))
    else:
        print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
