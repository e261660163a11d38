"""End-to-end pipeline tests at sf0.001 (smoke scale)."""

import glob
import os

import duckdb
import pytest

from raykg.pipelines import kg
from raykg.state import lineage


@pytest.fixture(scope="module")
def kg_paths(ray_session, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("kgout"))
    return kg.build_kg("/root/testdata/sf0.001", out_root=out_root)


def test_triple_pr_exact(kg_paths):
    # north-star gate: triple P/R >= 0.95 (we hit 1.0 with exact counts)
    con = duckdb.connect()
    n_eng, n_truth, exact = con.sql(f"""
        with truth as (select subj, pred, obj, count(*) cnt
                       from read_parquet('{kg_paths["data_dir"]}/truth_triples.parquet')
                       group by 1,2,3),
             eng as (select subj, pred, obj, mention_count cnt
                     from read_parquet('{kg_paths["triples"]}/*.parquet'))
        select (select count(*) from eng), (select count(*) from truth),
               (select count(*) from eng join truth using(subj,pred,obj)
                where eng.cnt = truth.cnt)
    """).fetchone()
    con.close()
    assert n_eng == n_truth == exact
    assert n_truth > 100


def test_sha_invariant(kg_paths):
    assert lineage.sha_invariant_ok(kg_paths["corpus"], kg_paths["units"])


def test_triples_sorted_by_subject(kg_paths):
    con = duckdb.connect()
    rows = con.sql(f"""
        select subj from read_parquet('{kg_paths["triples"]}/*.parquet')
    """).fetchall()
    con.close()
    subjects = [r[0] for r in rows]
    assert subjects == sorted(subjects)


def test_nodes_known_entities(kg_paths):
    con = duckdb.connect()
    df = con.sql(f"""
        select * from read_parquet('{kg_paths["nodes"]}/*.parquet')
        where entity_id = 'aldric'
    """).df()
    con.close()
    assert len(df) == 1
    assert df["canonical_name"].iloc[0] == "Aldric"
    assert df["entity_type"].iloc[0] == "character"
    assert df["mention_count"].iloc[0] > 0


def test_resume_skips_completed(kg_paths):
    # deleting one stage + manifest and re-running rebuilds only that stage
    out_root = kg_paths["out_root"]
    mf = lineage.stage_manifest_path(out_root, "nodes")
    mtime_units = os.path.getmtime(
        lineage.stage_manifest_path(out_root, "units"))
    os.remove(mf)
    import shutil
    shutil.rmtree(os.path.join(out_root, "nodes"))
    paths2 = kg.build_kg("/root/testdata/sf0.001", out_root=out_root)
    assert os.path.exists(mf)
    assert os.path.getmtime(
        lineage.stage_manifest_path(out_root, "units")) == mtime_units
    assert glob.glob(paths2["nodes"] + "/*.parquet")


def test_lineage_manifests(kg_paths):
    m = lineage.read_manifest(kg_paths["out_root"], "triples")
    assert m["total_rows"] > 0
    assert all(p["rows"] >= 0 for p in m["partitions"])
    assert m["wall_sec"] > 0


def test_gen_scenes_golden(kg_paths):
    """VERDICT r3 item 5: gen_scenes is the only registry query with
    neither an oracle nor a pin — the stub generation path is fully
    deterministic (model server absent -> the reference's degradation
    contract, generate/generator.py:242-252), so pin the whole table by
    content hash.  Regenerate the constant ONLY after an intentional
    change to the generator, scorer, or the sf0.001 corpus
    (GEN_VERSION bump): run q_gen_scenes at sf0.001 and paste the new
    sha256 of the concatenated content_sha256 column."""
    import hashlib
    from raykg.pipelines import queries as Q

    Q._KG_CACHE["/root/testdata/sf0.001"] = kg_paths
    t = Q.q_gen_scenes("/root/testdata/sf0.001")
    hashes = t.column("content_sha256").to_pylist()
    assert len(hashes) == 5
    table_hash = hashlib.sha256("".join(hashes).encode()).hexdigest()
    assert table_hash == ("1e09f744eba0678e34b9504924c66b5e"
                          "bde8f38739441932f6e639cba7158341")
