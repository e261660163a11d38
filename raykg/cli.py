"""CLI composition surface — the engine analog of the reference's 51
click subcommands in 9 groups (``cli.py``, §2.9 "CLI as composition
surface").

Every command is a thin shell over the same registered operators the
driver contract exposes (``raykg.pipelines.queries.QUERY_FNS``), so a user
of the reference can run each workflow they run today against the Ray
engine:

    python -m raykg build /root/testdata/sf0.001
    python -m raykg query kg_top_entities /root/testdata/sf0.001
    python -m raykg graph stats <sf_dir>
    python -m raykg extract test --text "Lord Aldric the Bold slew ..."
    python -m raykg extract seeds <sf_dir> --out /tmp/seeds
    python -m raykg style analyze <sf_dir> / style compare <sf_dir> A B
    python -m raykg voice quotes <sf_dir> <speaker>
    python -m raykg lore check <sf_dir> --claim "Aldric knows Mira"
    python -m raykg worldbible show <sf_dir> --category cultures
    python -m raykg generate scene <sf_dir> --character <id>

The CLI owns its Ray session (init guarded, shutdown at exit) — library
code never calls ``ray.init()``.
"""

from __future__ import annotations

import json
import os
import sys

import click


# --------------------------------------------------------------- session

def _ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "0")) or None,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
    return ray


def _to_pandas(res):
    import pandas as pd
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):           # Dataset / pyarrow.Table
        return res.to_pandas()
    return pd.DataFrame(res)


def _show(res, limit: int | None, out: str | None) -> None:
    """Print head of a query result; optionally write full result parquet."""
    if out is not None:
        if hasattr(res, "write_parquet"):   # ray.data.Dataset
            res.write_parquet(out)          # streamed, never collected
        else:                               # pandas DataFrame / pyarrow Table
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            tbl = res if isinstance(res, pa.Table) else \
                pa.Table.from_pandas(_to_pandas(res), preserve_index=False)
            os.makedirs(out, exist_ok=True)
            pq.write_table(tbl, os.path.join(out, "part-0.parquet"))
        click.echo(f"wrote {out}")
        return
    df = _to_pandas(res.limit(limit) if limit and hasattr(res, "limit")
                    else res)
    if limit:
        df = df.head(limit)
    with __import__("pandas").option_context(
            "display.width", 200, "display.max_columns", 50):
        click.echo(df.to_string(index=False))


def _q(name: str, sf_dir: str):
    from raykg.pipelines import queries as Q
    _ray()
    return Q.QUERY_FNS[name](sf_dir)


@click.group()
def main() -> None:
    """raykg — Ray-Data knowledge-graph & corpus-analysis engine."""


# ------------------------------------------------------------ top level

@main.command()
@click.argument("sf_dir")
@click.option("--force", is_flag=True, help="rebuild all stages")
@click.option("--llm", is_flag=True, help="enable the LLM extraction tier")
@click.option("--out-root", default=None)
def build(sf_dir: str, force: bool, llm: bool, out_root: str | None) -> None:
    """Run the full KG pipeline (reference `pipeline full` / `analyze`)."""
    from raykg.pipelines import kg
    _ray()
    backend = None
    if llm:
        from raykg.state.llm import OllamaBackend
        backend = OllamaBackend()
    paths = kg.build_kg(sf_dir, out_root=out_root, force=force,
                        llm_backend=backend)
    for k, v in paths.items():
        click.echo(f"{k:16s} {v}")


@main.command()
@click.argument("sf_dir")
def status(sf_dir: str) -> None:
    """Show per-stage checkpoint status (reference `status`)."""
    import glob
    from raykg.pipelines import kg
    root = kg.default_out_root(sf_dir)
    manifests = sorted(glob.glob(os.path.join(root, "*.lineage.json")))
    if not manifests:
        click.echo(f"no completed stages under {root}")
        return
    for mf in manifests:
        with open(mf) as f:
            m = json.load(f)
        click.echo(f"{m['stage']:16s} rows={m.get('total_rows', '?'):>9} "
                   f"wall={m.get('wall_sec', 0.0):7.2f}s "
                   f"parts={len(m.get('partitions', []))}")


@main.command(name="queries")
def list_queries() -> None:
    """List every registered operator (driver-contract registry)."""
    from raykg.pipelines import queries as Q
    for name in sorted(Q.QUERY_FNS):
        mark = "rows-only" if name in Q.NO_ORACLE else "oracled"
        click.echo(f"{name:24s} {mark}")


@main.command()
@click.argument("name")
@click.argument("sf_dir")
@click.option("--limit", default=20, show_default=True)
@click.option("--out", default=None, help="write full result to parquet dir")
def query(name: str, sf_dir: str, limit: int, out: str | None) -> None:
    """Run any registered query by name."""
    from raykg.pipelines import queries as Q
    if name not in Q.QUERY_FNS:
        raise click.BadParameter(
            f"unknown query {name!r} — see `raykg queries`")
    _show(_q(name, sf_dir), limit, out)


@main.command()
@click.argument("sf_dir")
@click.argument("term")
@click.option("--limit", default=10, show_default=True)
def search(sf_dir: str, term: str, limit: int) -> None:
    """Entity search by name/alias substring (reference `search`)."""
    ds = _q("kg_seeds", sf_dir)
    t = term.lower()
    hits = ds.filter(
        lambda r: t in r["canonical_name"].lower()
        or t in r["aliases_str"].lower())
    _show(hits, limit, None)


# ------------------------------------------------------------ graph

@main.group()
def graph() -> None:
    """Graph statistics and exports."""


@graph.command(name="stats")
@click.argument("sf_dir")
def graph_stats(sf_dir: str) -> None:
    """Node/edge counts by type (reference `graph stats`)."""
    _show(_q("kg_graph_stats", sf_dir), 50, None)


@graph.command(name="top")
@click.argument("sf_dir")
@click.option("--by-type", is_flag=True)
def graph_top(sf_dir: str, by_type: bool) -> None:
    _show(_q("kg_top_by_type" if by_type else "kg_top_entities", sf_dir),
          25, None)


# ------------------------------------------------------------ extract

@main.group()
def extract() -> None:
    """Entity / relationship extraction."""


@extract.command(name="entities")
@click.argument("sf_dir")
@click.option("--limit", default=20, show_default=True)
@click.option("--show-new", is_flag=True,
              help="only unresolved (new-entity) suggestions")
def extract_entities(sf_dir: str, limit: int, show_new: bool) -> None:
    """Mentions / new-entity suggestions (reference `extract entities`)."""
    _show(_q("kg_suggestions" if show_new else "kg_mentions", sf_dir),
          limit, None)


def _extract_one(text: str):
    """Run the REAL UnitExtractor over a one-row unit table."""
    import pyarrow as pa
    from raykg.stages import extract as ex
    t = pa.table({"unit_id": ["cli_c001_p00001_s001"],
                  "doc_sha256": ["cli"], "repo": ["cli"],
                  "path": ["cli.txt"], "lang": ["txt"], "text": [text]})
    return ex.UnitExtractor()(t).to_pandas()


@extract.command(name="test")
@click.option("--text", required=True)
def extract_test(text: str) -> None:
    """Run the NER tiers on one text snippet (reference `extract test`)."""
    from raykg.stages import extract as ex
    df = _extract_one(text)
    for r in df[df["kind"] == ex.KIND_MENTION].itertuples():
        click.echo(f"{r.label:8s} conf={r.confidence:.2f} "
                   f"{r.method:9s} {r.subj!r}")


@extract.command(name="rel-test")
@click.option("--text", required=True)
def extract_rel_test(text: str) -> None:
    """Run SVO relation extraction on one snippet (`extract rel-test`)."""
    from raykg.stages import extract as ex
    df = _extract_one(text)
    for r in df[df["kind"].isin([ex.KIND_REL, ex.KIND_ALIAS])].itertuples():
        click.echo(f"{r.subj} -[{r.pred}]-> {r.obj}  conf={r.confidence:.2f}")


@extract.command(name="seeds")
@click.argument("sf_dir")
@click.option("--out", "out_dir", required=True)
def extract_seeds(sf_dir: str, out_dir: str) -> None:
    """Export entity DB to seed JSON files (reference `extract seeds`)."""
    from raykg.ops import seeds
    from raykg.pipelines import queries as Q
    _ray()
    written = seeds.export_seeds(Q.kg_paths(sf_dir), out_dir)
    for etype, path in written.items():
        click.echo(f"{etype:10s} {path}")


# ------------------------------------------------------------ style

@main.group()
def style() -> None:
    """Author style fingerprinting."""


@style.command(name="analyze")
@click.argument("sf_dir")
def style_analyze(sf_dir: str) -> None:
    _show(_q("style_fingerprint", sf_dir), 20, None)


@style.command(name="compare")
@click.argument("sf_dir")
@click.argument("group_a")
@click.argument("group_b")
def style_compare(sf_dir: str, group_a: str, group_b: str) -> None:
    """Burrows' Delta + composite similarity between two repo groups."""
    df = _to_pandas(_q("style_similarity", sf_dir))
    pair = df[((df["repo_a"] == group_a) & (df["repo_b"] == group_b))
              | ((df["repo_a"] == group_b) & (df["repo_b"] == group_a))]
    click.echo(pair.to_string(index=False) if len(pair)
               else f"no pair ({group_a}, {group_b}) — groups: "
                    f"{sorted(set(df['repo_a']) | set(df['repo_b']))}")


@style.command(name="report")
@click.argument("sf_dir")
def style_report(sf_dir: str) -> None:
    """Readability + vocabulary summary (reference `style report`)."""
    for name in ("style_readability", "style_vocab", "style_distribution"):
        click.echo(f"== {name} ==")
        _show(_q(name, sf_dir), 20, None)


# ------------------------------------------------------------ voice

@main.group()
def voice() -> None:
    """Character voice profiles."""


@voice.command(name="analyze")
@click.argument("sf_dir")
@click.option("--min-lines", default=3, show_default=True)
def voice_analyze(sf_dir: str, min_lines: int) -> None:
    df = _to_pandas(_q("voice_profiles", sf_dir))
    click.echo(df[df["n_lines"] >= min_lines].to_string(index=False))


@voice.command(name="profile")
@click.argument("sf_dir")
@click.argument("speaker")
def voice_profile(sf_dir: str, speaker: str) -> None:
    df = _to_pandas(_q("voice_profiles", sf_dir))
    row = df[df["speaker"].str.lower() == speaker.lower()]
    click.echo(row.T.to_string() if len(row)
               else f"speaker {speaker!r} not found")


@voice.command(name="quotes")
@click.argument("sf_dir")
@click.argument("speaker")
@click.option("--limit", default=10, show_default=True)
def voice_quotes(sf_dir: str, speaker: str, limit: int) -> None:
    ds = _q("dialogue_spans", sf_dir)
    hits = ds.filter(lambda r: r["speaker"].lower() == speaker.lower())
    _show(hits, limit, None)


@voice.command(name="compare")
@click.argument("sf_dir")
@click.argument("char1")
@click.argument("char2")
def voice_compare(sf_dir: str, char1: str, char2: str) -> None:
    df = _to_pandas(_q("voice_profiles", sf_dir))
    rows = df[df["speaker"].str.lower().isin(
        {char1.lower(), char2.lower()})]
    click.echo(rows.T.to_string())


# ------------------------------------------------------------ lore

@main.group()
def lore() -> None:
    """Claim checking, events, timelines."""


@lore.command(name="check")
@click.argument("sf_dir")
@click.option("--claim", "claim_text", default=None,
              help="single claim; default runs the registered batch")
def lore_check(sf_dir: str, claim_text: str | None) -> None:
    if claim_text is None:
        _show(_q("lore_check", sf_dir), 50, None)
        return
    from raykg.ops import claims as cl
    c = cl.parse_claim(claim_text)
    click.echo(f"type={c.claim_type} subject={c.subject!r} "
               f"object={c.obj!r} predicate={c.predicate!r} "
               f"negated={c.negated} uncertain={c.uncertain}")


@lore.command(name="events")
@click.argument("sf_dir")
@click.option("--limit", default=20, show_default=True)
def lore_events(sf_dir: str, limit: int) -> None:
    _show(_q("events_dedup", sf_dir), limit, None)


@lore.command(name="timeline")
@click.argument("sf_dir")
@click.option("--entity", default=None)
def lore_timeline(sf_dir: str, entity: str | None) -> None:
    ds = _q("timeline_entities", sf_dir)
    if entity:
        e = entity.lower()
        ds = ds.filter(lambda r: e in r["entity_id"].lower())
    _show(ds, 50, None)


@lore.command(name="query-events")
@click.argument("sf_dir")
@click.option("--agent", default=None)
@click.option("--action", default=None)
def lore_query_events(sf_dir: str, agent: str | None,
                      action: str | None) -> None:
    """Fuzzy event filter (reference EventGraph.find_events)."""
    ds = _q("events_dedup", sf_dir)
    if agent:
        a = agent.lower()
        ds = ds.filter(lambda r: a in r["agent"].lower())
    if action:
        v = action.lower()
        ds = ds.filter(lambda r: v in r["action"].lower())
    _show(ds, 50, None)


# ------------------------------------------------------------ worldbible

@main.group()
def worldbible() -> None:
    """World-bible rules and groupings."""


@worldbible.command(name="show")
@click.argument("sf_dir")
@click.option("--category",
              type=click.Choice(["rules", "cultures", "magic",
                                 "geography", "passages"]),
              default="rules", show_default=True)
def worldbible_show(sf_dir: str, category: str) -> None:
    _show(_q(f"wb_{category}", sf_dir), 30, None)


# ------------------------------------------------------------ generate

@main.group()
def generate() -> None:
    """Style-conditioned scene generation (LLM-gated)."""


@generate.command(name="scene")
@click.argument("sf_dir")
@click.option("--character", "characters", multiple=True)
def generate_scene(sf_dir: str, characters: tuple[str, ...]) -> None:
    df = _to_pandas(_q("gen_scenes", sf_dir))
    if characters:
        want = {c.lower() for c in characters}
        df = df[df["characters"].str.lower().apply(
            lambda s: bool(want & set(s.split(","))))]
    click.echo(df.drop(columns=["text"]).to_string(index=False))


@generate.command(name="flagged")
@click.argument("sf_dir")
def generate_flagged(sf_dir: str) -> None:
    """Flagged scenes, worst first (reference `generate flagged`)."""
    import pyarrow as pa
    from raykg.ops import generate as gen
    res = _q("gen_scenes", sf_dir)
    t = res if isinstance(res, pa.Table) else pa.table(_to_pandas(res))
    click.echo(gen.flagged_scenes(t).to_pandas()
               .drop(columns=["text"]).to_string(index=False))


def entrypoint() -> None:
    try:
        main(standalone_mode=True)
    finally:
        import ray
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    entrypoint()
