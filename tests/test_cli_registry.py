"""Tests for the §2.9 extension surface: per-language extractor registry,
seeds re-export (extract/resolver.py:310-344 export_seeds), and the CLI
composition layer (reference cli.py's command groups)."""

import json
import os

import pyarrow as pa
import pytest

from raykg.stages import extract as ex
from raykg.stages import registry


def _corpus_batch(rows):
    return pa.table({
        "doc_sha256": [r[0] for r in rows],
        "repo": ["r"] * len(rows),
        "path": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
        "content": [r[3] for r in rows],
    })


def test_dispatch_skips_unregistered_lang():
    d = registry.DispatchCodeExtractor()
    batch = _corpus_batch([
        ("sha1", "a.py", "py", "import os\ndef foo():\n    pass\n"),
        ("sha2", "b.zig", "zig", "const std = @import(\"std\");\n"),
    ])
    out = d(batch)
    # py rows extracted, zig rows silently skipped
    assert out.num_rows > 0
    assert set(out["path"].to_pylist()) == {"a.py"}


def test_dispatch_routes_registered_lang():
    calls = []

    class FakeExtractor:
        def __call__(self, batch: pa.Table) -> pa.Table:
            calls.append(batch.num_rows)
            return ex._rows_to_table([])

    registry.register_code_extractor("zig", FakeExtractor)
    try:
        d = registry.DispatchCodeExtractor()
        batch = _corpus_batch([
            ("sha2", "b.zig", "zig", "const x = 1;\n"),
            ("sha3", "c.zig", "zig", "const y = 2;\n"),
        ])
        d(batch)
        assert calls == [2]
        assert "zig" in registry.registered_langs()["code"]
    finally:
        registry._CODE_EXTRACTORS.pop("zig", None)


def test_dispatch_builds_extractor_once_per_actor():
    built = []

    class CountingExtractor:
        def __init__(self):
            built.append(1)

        def __call__(self, batch):
            return ex._rows_to_table([])

    registry.register_code_extractor("zig", CountingExtractor)
    try:
        d = registry.DispatchCodeExtractor()
        b = _corpus_batch([("s", "x.zig", "zig", "a\n")])
        d(b)
        d(b)
        d(b)
        assert built == [1]  # per-actor singleton (ST1)
    finally:
        registry._CODE_EXTRACTORS.pop("zig", None)


@pytest.fixture(scope="module")
def built(ray_session):
    from raykg.pipelines import queries as Q
    return Q.kg_paths("/root/testdata/sf0.001")


def test_seeds_dataset_matches_duckdb(built):
    import duckdb

    from raykg.ops import seeds
    df = seeds.seeds_dataset(built).to_pandas()
    assert len(df) > 0
    con = duckdb.connect()
    truth = con.sql(f"""
        with m as (select distinct entity_id, mention_text
                   from read_parquet('{built["mentions"]}/*.parquet')
                   where lang='txt'),
             n as (select * from read_parquet('{built["nodes"]}/*.parquet')
                   where entity_type in
                         ('character','place','object','unknown'))
        select n.entity_id, count(*) n_aliases,
               string_agg(m.mention_text, '|' order by m.mention_text)
                   aliases_str
        from n join m using (entity_id) group by 1
    """).df()
    got = df.set_index("entity_id")
    want = truth.set_index("entity_id")
    assert set(got.index) == set(want.index)
    merged = got.join(want, rsuffix="_t")
    assert (merged["n_aliases"] == merged["n_aliases_t"]).all()
    assert (merged["aliases_str"] == merged["aliases_str_t"]).all()


def test_export_seeds_roundtrip(built, tmp_path):
    from raykg.ops import seeds
    written = seeds.export_seeds(built, str(tmp_path))
    assert written, "no seed files written"
    for etype, path in written.items():
        with open(path) as f:
            payload = json.load(f)
        assert payload and all(
            {"id", "canonical_name", "aliases"} <= set(p) for p in payload)
        names = [p["id"] for p in payload]
        assert names == sorted(names)


def test_cli_help_and_queries_list():
    from click.testing import CliRunner

    from raykg import cli
    r = CliRunner().invoke(cli.main, ["--help"])
    assert r.exit_code == 0
    for grp in ("build", "graph", "extract", "style", "voice", "lore",
                "worldbible", "generate"):
        assert grp in r.output
    r = CliRunner().invoke(cli.main, ["queries"])
    assert r.exit_code == 0
    assert "kg_triples" in r.output and "oracled" in r.output


def test_cli_extract_test_offline():
    from click.testing import CliRunner

    from raykg import cli
    r = CliRunner().invoke(cli.main, [
        "extract", "test", "--text",
        "Lord Aldric slew the dragon. Mira of Thornwood knows Aldric."])
    assert r.exit_code == 0, r.output
    assert "PERSON" in r.output


def test_show_honors_out_for_dataframe_and_table(tmp_path):
    """--out must write parquet for pandas/pyarrow results too, not just
    ray Datasets (advisory fix): the fallback writes via pyarrow."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads

    from raykg import cli
    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    out1 = str(tmp_path / "df_out")
    cli._show(df, limit=None, out=out1)
    assert pads.dataset(out1).to_table().num_rows == 2
    out2 = str(tmp_path / "tbl_out")
    cli._show(pa.table({"a": [3]}), limit=None, out=out2)
    assert pads.dataset(out2).to_table().num_rows == 1


def test_cli_lore_check_single_claim():
    from click.testing import CliRunner

    from raykg import cli
    r = CliRunner().invoke(cli.main, [
        "lore", "check", "/root/testdata/sf0.001",
        "--claim", "Aldric knows Mira"])
    assert r.exit_code == 0, r.output
    assert "type=" in r.output


def test_cli_query_and_search(ray_session, built):
    from click.testing import CliRunner

    from raykg import cli
    r = CliRunner().invoke(
        cli.main, ["query", "kg_top_entities", "/root/testdata/sf0.001",
                   "--limit", "5"])
    assert r.exit_code == 0, r.output
    assert "entity_id" in r.output
