#!/usr/bin/env python
"""Median-of-3 scaling measurement + per-stage 8-vs-32 breakdown at HEAD.

Runs the KG pipeline (GRAFT_KG_ONLY) in fresh processes at num_cpus=8 and
num_cpus=32 over the same sf4 input, three leg-pairs with cooldowns, and
reports:
  - per-leg wall time / triples-per-sec,
  - median-of-3 scaling efficiency (thr_32/thr_8)/(32/8),
  - per-stage wall_sec at each CPU count (from the lineage manifests of the
    LAST leg at each count) with the per-stage speedup.

Must run machine-exclusive: concurrent CPU load corrupts the legs.
Usage: python scripts/scaling_profile.py [out.json]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import run_child  # noqa: E402

SF_DIR = os.environ.get("GRAFT_SCALING_SF_DIR", "/tmp/raykg_scaling/sf4")
LO = int(os.environ.get("GRAFT_SCALING_LO", "8"))
HI = int(os.environ.get("GRAFT_SCALING_HI", "32"))
PAIRS = 3
COOLDOWN = 30


def drain():
    """Flush dirty pages before the next timed leg.  Each leg writes ~GBs
    of parquet to /tmp; without an explicit sync the NEXT leg's writes
    stall behind the previous leg's writeback, which measured as a ~30%
    inflation of the (shorter) 32-CPU legs vs fresh isolated runs —
    corrupting the efficiency ratio in either direction."""
    os.sync()
    time.sleep(COOLDOWN)


def stage_walls(ncpu: int) -> dict[str, float]:
    from raykg.sources import synthetic_corpus as sc
    out_root = os.path.join("/tmp/raykg_bench",
                            f"{sc.sf_tag_of(SF_DIR)}_cpus{ncpu}")
    walls = {}
    for mf in glob.glob(os.path.join(out_root, "*.lineage.json")):
        with open(mf) as f:
            m = json.load(f)
        walls[m["stage"]] = m["wall_sec"]
    return walls


def main():
    # PAIRED design: the sandbox VM's throughput drifts ±20% over tens of
    # minutes (shared host), so single-leg medians across the whole run
    # confound drift with CPU count.  Each (LO, HI) pair runs back-to-back
    # within a few minutes — shared host conditions — and contributes ONE
    # efficiency sample; pair order alternates so drift direction cancels;
    # the reported number is the median of pair efficiencies.
    legs = {LO: [], HI: []}
    pair_effs = []
    run_child(HI, SF_DIR)            # untimed: generate corpus + warm cache
    drain()
    for i in range(PAIRS):
        order = (LO, HI) if i % 2 == 0 else (HI, LO)
        pair = {}
        for ncpu in order:
            r = run_child(ncpu, SF_DIR)
            legs[ncpu].append(r)
            pair[ncpu] = r
            drain()
        pair_effs.append(round(
            (pair[HI]["triples_per_sec"] / pair[LO]["triples_per_sec"])
            / (HI / LO), 3))

    thr_lo = statistics.median(r["triples_per_sec"] for r in legs[LO])
    thr_hi = statistics.median(r["triples_per_sec"] for r in legs[HI])
    eff = statistics.median(pair_effs)
    # saturation point: one mid-size (2×LO) leg — if throughput there is
    # close to the HI legs, the all-to-all stages have hit the single-box
    # memory-bus ceiling
    mid_cpu = LO * 2
    mid = run_child(mid_cpu, SF_DIR)

    walls_lo, walls_hi = stage_walls(LO), stage_walls(HI)
    stages = {
        s: {f"sec_{LO}": walls_lo.get(s), f"sec_{HI}": walls_hi.get(s),
            "speedup": (round(walls_lo[s] / walls_hi[s], 2)
                        if walls_hi.get(s) and walls_lo.get(s) else None)}
        for s in sorted(set(walls_lo) | set(walls_hi))}

    out = {
        "sf_dir": SF_DIR,
        "cpus_lo": LO,
        "cpus_hi": HI,
        f"legs_sec_{LO}": [r["value"] for r in legs[LO]],
        f"legs_sec_{HI}": [r["value"] for r in legs[HI]],
        f"legs_tps_{LO}": [r["triples_per_sec"] for r in legs[LO]],
        f"legs_tps_{HI}": [r["triples_per_sec"] for r in legs[HI]],
        f"median_tps_{LO}": thr_lo,
        f"median_tps_{HI}": thr_hi,
        f"tps_{mid_cpu}_saturation_leg": mid["triples_per_sec"],
        "pair_efficiencies": pair_effs,
        "scaling_efficiency": round(eff, 3),
        "stages": stages,
    }
    print(json.dumps(out, indent=2))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
