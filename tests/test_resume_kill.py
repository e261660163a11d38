"""Mid-pipeline failure → resume (north-rule obligation, SURVEY §4.4).

Kills a real build_kg subprocess part-way with SIGKILL, then re-runs and
checks (a) completed stages were skipped, (b) the final triples match a
clean build, (c) the sha256 invariant holds.
"""

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pytest

OUT = "/tmp/raykg_killtest"

_CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raykg.pipelines import kg
kg.build_kg("/root/testdata/sf0.001", out_root=sys.argv[1], force=False)
print("DONE")
"""


def _manifests(out_root):
    return sorted(os.path.basename(p) for p in
                  glob.glob(os.path.join(out_root, "*.lineage.json")))


@pytest.mark.slow
def test_kill_and_resume():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)

    # run 1: kill MID-UNITS — after at least one partition marker commits
    # but before the stage manifest (per-partition resume, north rule)
    pmdir = os.path.join(OUT, "units.partmarkers")
    p = subprocess.Popen([sys.executable, "-c", _CHILD, OUT],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    deadline = time.time() + 180
    while time.time() < deadline:
        markers = glob.glob(os.path.join(pmdir, "part-*.json"))
        if len(markers) >= 1 and "units.lineage.json" not in _manifests(OUT):
            break
        if p.poll() is not None or "units.lineage.json" in _manifests(OUT):
            break
        time.sleep(0.02)
    p.send_signal(signal.SIGKILL)
    p.wait()
    part_markers = sorted(glob.glob(os.path.join(pmdir, "part-*.json")))
    killed_mid_units = "units.lineage.json" not in _manifests(OUT)
    part_mtimes = {m: os.path.getmtime(m) for m in part_markers}

    # run 1b (only if run 1 finished units before the kill landed):
    # kill after units committed, before triples
    if not killed_mid_units:
        p = subprocess.Popen([sys.executable, "-c", _CHILD, OUT],
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
        deadline = time.time() + 180
        while time.time() < deadline:
            if "units.lineage.json" in _manifests(OUT):
                break
            if p.poll() is not None:
                break
            time.sleep(0.05)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait()
    survived = _manifests(OUT)
    assert "triples.lineage.json" not in survived, "killed too late"
    units_manifest = os.path.join(OUT, "units.lineage.json")
    units_mtime = (os.path.getmtime(units_manifest)
                   if os.path.exists(units_manifest) else None)

    # run 2: must complete, skipping the committed stages
    out = subprocess.run([sys.executable, "-c", _CHILD, OUT],
                         capture_output=True, text=True, timeout=300)
    assert "DONE" in out.stdout, out.stderr[-2000:]
    if units_mtime is not None:
        assert os.path.getmtime(units_manifest) == units_mtime, \
            "completed stage was re-run"
    # per-partition resume: every units partition that committed before
    # the kill must NOT have been recomputed (marker untouched)
    for m, t in part_mtimes.items():
        assert os.path.getmtime(m) == t, f"completed partition re-run: {m}"
    if killed_mid_units:
        assert part_mtimes, "kill landed before any partition committed"
    assert "triples.lineage.json" in _manifests(OUT)

    # equivalence with a clean build + invariant
    import duckdb
    from raykg.sources import synthetic_corpus as sc
    from raykg.pipelines import kg as kgm
    from raykg.state import lineage
    clean = kgm.default_out_root("/root/testdata/sf0.001")
    data_dir = sc.corpus_dir("/root/testdata/sf0.001")
    if os.path.exists(os.path.join(clean, "triples.lineage.json")):
        n = duckdb.sql(f"""
            select count(*) from
              (select * from read_parquet('{OUT}/triples/*.parquet')
               except
               select * from read_parquet('{clean}/triples/*.parquet'))
        """).fetchone()[0]
        assert n == 0, f"{n} triples differ from clean build"
    assert lineage.sha_invariant_ok(
        os.path.join(data_dir, "corpus.parquet"),
        os.path.join(OUT, "units"))


CUR_OUT = "/tmp/raykg_curation_killtest"

_CUR_CHILD = r"""
import hashlib
import os
import sys
os.environ["RAYKG_DEDUP_CKPT"] = sys.argv[1]
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raykg.pipelines import queries as Q
res = Q.q_corpus_curation("/root/testdata/sf0.001")
df = res.to_pandas() if hasattr(res, "to_pandas") else res
cols = sorted(df.columns)
df = df[cols].sort_values(cols).reset_index(drop=True)
print("ROWS", len(df))
print("SHA", hashlib.sha1(df.to_csv(index=False).encode()).hexdigest())
print("DONE")
"""


@pytest.mark.slow
def test_curation_kill_and_resume():
    """VERDICT r4 #8: the dedup/curation chain's verified-pair table is a
    lineage-checkpointed stage — a curation run killed after the Jaccard
    join commits must resume PAST the join (manifest untouched on re-run)
    and produce the same curated corpus as an independent fresh run."""
    shutil.rmtree(CUR_OUT, ignore_errors=True)
    os.makedirs(CUR_OUT, exist_ok=True)

    def manifest_paths(root):
        return glob.glob(os.path.join(root, "*", "jaccard_pairs.lineage.json"))

    # run 1: kill after the jaccard_pairs stage commits, mid-curation
    p = subprocess.Popen([sys.executable, "-c", _CUR_CHILD, CUR_OUT],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    deadline = time.time() + 240
    while time.time() < deadline:
        if manifest_paths(CUR_OUT) or p.poll() is not None:
            break
        time.sleep(0.02)
    p.send_signal(signal.SIGKILL)
    p.wait()
    manifests = manifest_paths(CUR_OUT)
    assert manifests, "jaccard_pairs stage never committed in run 1"
    mf = manifests[0]
    mf_mtime = os.path.getmtime(mf)

    # run 2: must complete, resuming past the committed Jaccard join
    out = subprocess.run([sys.executable, "-c", _CUR_CHILD, CUR_OUT],
                         capture_output=True, text=True, timeout=420)
    assert "DONE" in out.stdout, out.stderr[-2000:]
    assert os.path.getmtime(mf) == mf_mtime, \
        "committed jaccard_pairs stage was re-run"

    # equivalence: an INDEPENDENT fresh compute (separate checkpoint root,
    # in-process Ray session) must produce the identical curated corpus
    import hashlib
    from raykg.pipelines import queries as Q
    fresh_root = CUR_OUT + "_fresh"
    shutil.rmtree(fresh_root, ignore_errors=True)
    old_env = os.environ.get("RAYKG_DEDUP_CKPT")
    saved = Q._JACC_PAIRS_CACHE.pop("/root/testdata/sf0.001", None)
    try:
        os.environ["RAYKG_DEDUP_CKPT"] = fresh_root
        res = Q.q_corpus_curation("/root/testdata/sf0.001")
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        cols = sorted(df.columns)
        df = df[cols].sort_values(cols).reset_index(drop=True)
        sha = hashlib.sha1(df.to_csv(index=False).encode()).hexdigest()
    finally:
        if old_env is None:
            os.environ.pop("RAYKG_DEDUP_CKPT", None)
        else:
            os.environ["RAYKG_DEDUP_CKPT"] = old_env
        Q._JACC_PAIRS_CACHE.pop("/root/testdata/sf0.001", None)
        if saved is not None:
            Q._JACC_PAIRS_CACHE["/root/testdata/sf0.001"] = saved
    assert f"SHA {sha}" in out.stdout, \
        "resumed curation output differs from an independent fresh run"
