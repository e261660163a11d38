"""Checkpointed stage execution + per-partition lineage records.

Modeled on the reference's chunk checkpoints (``lore/events.py:397-431``)
but Ray-Data-native (SURVEY.md §4.4): every stage writes its output Parquet
atomically (tmp dir → rename) together with a ``_lineage.json`` manifest
recording per-part row counts, byte sizes and wall time.  On re-run a stage
whose manifest exists is skipped — that is "resumes mid-pipeline after
failure" for a batch pipeline.  The per-row ``doc_sha256`` carried by every
table is the content-sha256 invariant the north rule requires;
``sha_invariant_ok`` verifies it end-to-end.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Callable

import pyarrow.parquet as pq

MANIFEST = "_lineage.json"


def stage_manifest_path(out_root: str, name: str) -> str:
    # Next to (not inside) the output dir so read_parquet(dir) sees only
    # parquet part files.  Written only after the atomic rename → acts as
    # the stage-completion marker.
    return os.path.join(out_root, name + ".lineage.json")


def stage_done(out_root: str, name: str) -> bool:
    return os.path.exists(stage_manifest_path(out_root, name))


def run_stage(out_root: str, name: str,
              write_fn: Callable[[str], dict | None],
              force: bool = False) -> str:
    """Run ``write_fn(tmp_dir)`` (which must write parquet into tmp_dir),
    then atomically promote to ``{out_root}/{name}`` with a lineage manifest.
    Returns the final directory; skips the stage when already completed."""
    final_dir = os.path.join(out_root, name)
    if stage_done(out_root, name) and not force:
        return final_dir
    os.makedirs(out_root, exist_ok=True)
    marker = stage_manifest_path(out_root, name)
    if os.path.exists(marker):
        os.remove(marker)
    shutil.rmtree(final_dir, ignore_errors=True)
    tmp_dir = final_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    t0 = time.time()
    info = write_fn(tmp_dir) or {}
    # Dataset/plan objects are cyclic, so the MaterializedDatasets a stage
    # held (shuffle barriers) survive write_fn's return until a cycle
    # collection runs — keeping their object-store blocks (and spill
    # files) alive into the NEXT stage's exchanges.  Collect now so each
    # stage starts against a drained store.
    import gc
    gc.collect()
    wall = time.time() - t0

    # per-file footer reads parallelized — file counts scale with data and
    # worker count, and a serial driver-side scan was measurable at sf8
    from concurrent.futures import ThreadPoolExecutor
    files = sorted(glob.glob(os.path.join(tmp_dir, "**", "*.parquet"),
                             recursive=True))

    def _part(f: str) -> dict:
        return {"file": os.path.relpath(f, tmp_dir),
                "rows": pq.ParquetFile(f).metadata.num_rows,
                "bytes": os.path.getsize(f)}

    with ThreadPoolExecutor(max_workers=16) as ex:
        parts = list(ex.map(_part, files))
    total_rows = sum(p["rows"] for p in parts)
    manifest = {"stage": name, "wall_sec": round(wall, 3),
                "total_rows": total_rows, "partitions": parts, "info": info}
    os.rename(tmp_dir, final_dir)
    with open(marker, "w") as fh:
        json.dump(manifest, fh, indent=1)
    return final_dir


def read_manifest(out_root: str, name: str) -> dict:
    with open(stage_manifest_path(out_root, name)) as fh:
        return json.load(fh)


def sha_invariant_ok(corpus_path: str, downstream_parquet_dir: str) -> bool:
    """North-rule invariant: the distinct ``doc_sha256`` set of a downstream
    stage equals the sha256 set of the corpus ``content`` column."""
    import duckdb
    con = duckdb.connect()
    n = con.sql(f"""
        with c as (select distinct sha256(content) s
                   from read_parquet('{corpus_path}/*.parquet')),
             d as (select distinct doc_sha256 s
                   from read_parquet('{downstream_parquet_dir}/**/*.parquet'))
        select (select count(*) from c where s not in (select s from d))
             + (select count(*) from d where s not in (select s from c))
    """).fetchone()[0]
    con.close()
    return n == 0


def _part_marker_dir(out_root: str, name: str) -> str:
    return os.path.join(out_root, name + ".partmarkers")


def partition_done(out_root: str, name: str, pid: str) -> bool:
    return os.path.exists(os.path.join(_part_marker_dir(out_root, name),
                                       f"part-{pid}.json"))


def run_partitioned_stage(out_root: str, name: str, partition_ids,
                          write_partition: Callable[[str, str], dict | None],
                          force: bool = False,
                          max_workers: int = 1) -> str:
    """Stage execution with PER-PARTITION completion markers (north rule:
    "checkpoints partition state so the job resumes mid-pipeline").

    ``write_partition(pid, tmp_dir)`` writes one partition's parquet into
    ``tmp_dir``; each finished partition is atomically promoted to
    ``{out_root}/{name}.parts/part-{pid}`` and marked with a JSON record
    (rows, bytes, wall seconds).  A re-run after a mid-stage kill SKIPS
    partitions whose markers exist and computes only the rest.  When every
    partition is complete the parts tree is renamed to the final stage dir
    and the stage-level manifest is written (aggregating the per-partition
    lineage records).

    ``max_workers > 1`` runs partitions as CONCURRENT Ray Data executions
    (driver threads): each execution still commits its own marker, so
    resume granularity is unchanged, but the per-execution scheduling
    floor (~0.9 s each, measured at sf0.01) overlaps instead of summing —
    8 sequential executions cost ~7 s of pure floor.  On a real cluster
    this is the moral equivalent of submitting independent partition jobs
    that share the cluster."""
    final_dir = os.path.join(out_root, name)
    if stage_done(out_root, name) and not force:
        return final_dir
    os.makedirs(out_root, exist_ok=True)
    marker = stage_manifest_path(out_root, name)
    if os.path.exists(marker):
        os.remove(marker)
    shutil.rmtree(final_dir, ignore_errors=True)
    parts_root = final_dir + ".parts"
    mdir = _part_marker_dir(out_root, name)
    if force:
        shutil.rmtree(parts_root, ignore_errors=True)
        shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(parts_root, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    def run_one(pid: str) -> dict:
        pdir = os.path.join(parts_root, f"part-{pid}")
        pmarker = os.path.join(mdir, f"part-{pid}.json")
        if os.path.exists(pmarker) and os.path.isdir(pdir):
            with open(pmarker) as fh:
                return json.load(fh)
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.time()
        info = write_partition(pid, tmp) or {}
        wall = time.time() - t0
        files = sorted(glob.glob(os.path.join(tmp, "**", "*.parquet"),
                                 recursive=True))
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        nbytes = sum(os.path.getsize(f) for f in files)
        os.rename(tmp, pdir)
        rec = {"partition": pid, "rows": rows, "bytes": nbytes,
               "wall_sec": round(wall, 3), "info": info}
        with open(pmarker + ".tmp", "w") as fh:
            json.dump(rec, fh)
        os.replace(pmarker + ".tmp", pmarker)
        return rec

    t_stage = time.time()
    if max_workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            part_infos = list(ex.map(run_one, partition_ids))
    else:
        part_infos = [run_one(pid) for pid in partition_ids]

    os.rename(parts_root, final_dir)
    # wall_sec = stage ELAPSED time (concurrent partitions overlap);
    # partition_wall_sum = the old pre-v2 semantics (sum of per-partition
    # walls).  manifest_version marks which semantics wall_sec carries so
    # downstream status/scaling comparisons never mix the two: absent
    # (v1) = sum-of-partition-walls, 2 = elapsed.
    manifest = {"stage": name,
                "manifest_version": 2,
                "wall_sec": round(time.time() - t_stage, 3),
                "partition_wall_sum": round(
                    sum(p["wall_sec"] for p in part_infos), 3),
                "total_rows": sum(p["rows"] for p in part_infos),
                "partitions": part_infos,
                "partitioned": True}
    with open(marker, "w") as fh:
        json.dump(manifest, fh, indent=1)
    return final_dir
