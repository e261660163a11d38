"""Flagship KG pipeline: extract → link → canonicalize → materialize.

Ray-Data-first composition (SURVEY.md §7.0, reference EP1 ``cli.py:1188-1386``):

    read_parquet(corpus, override_num_blocks≈2×CPUs)
      → map_batches(split)                 # stage "units"   (wide explode)
      → map_batches(unit/code extractors)  # stage "extract"
      → broadcast alias resolve (J1)       # stage "mentions"
      → union-find over alias edges        # canonicalize (C4)
      → groupby(entity) nodes              # stage "nodes"   (S6 analog)
      → groupby(s,p,o) triple merge        # stage "triples" (A1/S7 analog)
      → sort(subj) → write_parquet

Every stage streams blocks and checkpoints its output parquet atomically
with a lineage manifest (resume = skip completed stages).

Performance notes (measured via the lineage wall clocks):

* Extractors run as STATELESS TASK functions with worker-process singletons
  (regexes compile once per worker) — actor pools added seconds of startup
  per stage at this state size.  Heavyweight per-language models would flip
  back to ``map_batches(Cls, concurrency=...)`` (the extractor classes are
  kept callable for exactly that).
* Broadcast sides (alias index, union-find rep map) are vocabulary-bounded
  and ``ray.put`` once, memoized per worker (``functions.broadcast``).  The
  node-type side is NOT vocabulary-bounded (every defined code symbol is a
  node), so triple typing is a bucketed hash join against the nodes table.
* Every aggregation goes through ``functions.hashagg`` (polars combiners →
  bucket shuffle → vectorized finals) — Ray's native per-group aggregate
  and pandas object-dtype string groupbys were both measured order-of-
  magnitude slower (see hashagg module docstring).
* The distinct alias-edge set is vocabulary-sized (pairs of surface forms,
  not corpus-sized) → collected to the driver for union-find; the fully
  distributed min-label propagation lives in ``stages.components`` for
  edge sets that cannot be collected (used by near-dup clustering).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raykg.functions import hashagg
from raykg.functions.broadcast import get_cached
from raykg.sources import synthetic_corpus as sc
from raykg.stages import components, extract, link, split
from raykg.state import lineage

TYPE_PRIORITY = ("character", "place", "object", "module", "function",
                 "unknown")

# Size gate for broadcast-vs-shuffle join sides (rows).  Below this a
# lookup side is ray.put once and applied per batch (no shuffle); above
# it the stage falls back to a bucketed hash join.  2M string→string rows
# ≈ 200 MB in a worker heap — comfortably broadcastable; code-symbol node
# tables at corpus scale blow past it and take the join path.
BROADCAST_MAX_ROWS = int(os.environ.get("RAYKG_BROADCAST_MAX_ROWS",
                                        2_000_000))

# Floor on rows per written parquet file for the big intermediate tables.
# Wide compute stages (64+ blocks) otherwise write one sub-MB file per
# block, and every DOWNSTREAM read then pays per-file task overhead plus a
# degenerate many-partition shuffle (measured: the 8x64-block units write
# produced 512 files and slowed extract+mentions by ~5 s at sf4).  Still
# many files per stage — resumable, partitioned output, never one giant
# file.
WRITE_MIN_ROWS = 64_000

_WORKER_STATE: dict[str, object] = {}


def _singleton(key: str, factory):
    if key not in _WORKER_STATE:
        _WORKER_STATE[key] = factory()
    return _WORKER_STATE[key]


def extract_units_fn(batch: pa.Table) -> pa.Table:
    return _singleton("unit_extractor", extract.UnitExtractor)(batch)


def extract_code_fn(batch: pa.Table) -> pa.Table:
    # per-language dispatch via the §2.9 registry (raykg.stages.registry):
    # 'py' routes to CodeExtractor; user-registered languages route to
    # their own extractor; unregistered ones are skipped with a warning
    from raykg.stages import registry
    return _singleton("code_extractor", registry.DispatchCodeExtractor)(batch)


def _ncpu() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level key-value metadata before a parquet sink.

    Blocks converted from pandas carry a ``pandas`` metadata dict;
    ``pyarrow.Schema.__hash__`` raises on dict metadata, which makes every
    downstream Ray hash-shuffle of the re-read file log a spurious
    "Failed to hash the schemas" warning from internal aggregator actors
    (which never import raykg, so the raykg.__init__ log filter can't
    reach them).  Metadata-only op — zero-copy."""
    return t.replace_schema_metadata(None)


def read_extract_kind(extract_dir: str, kind: str) -> rd.Dataset:
    """Scan one hive partition (``kind=<value>``) of the extract output —
    partition pruning at the read, per the prune-at-the-read rule."""
    return rd.read_parquet(os.path.join(extract_dir, f"kind={kind}"))


def nodes_bucket(g: pd.DataFrame,
                 seed_map: dict[str, tuple[str, str]] | None = None
                 ) -> pd.DataFrame:
    """Entity name/type selection (S6/A2 analog) for ALL entities in one
    hashagg bucket, vectorized.  Input = per-surface partial sums
    ``(entity_id, mention_text, entity_type, is_new, resolved_name,
    n_occurrences)`` — combiner-compressed, so hot entities arrive as a few
    rows per surface, not per occurrence.  canonical name/type ladder:
    the REPRESENTATIVE's own seed attributes (``seed_map[entity_id]`` —
    union-find prefers seed ids as reps, so a merged component carries the
    rep seed's name/type, never a lexicographic max over merged seeds),
    else seed attrs observed on any known row, else most-frequent surface
    (ties → name asc) / highest-priority observed type."""
    surf = (g.groupby(["entity_id", "mention_text", "entity_type", "is_new",
                       "resolved_name"], sort=False)["n_occurrences"].sum()
            .reset_index())
    known = (surf[~surf["is_new"]].groupby("entity_id", sort=False)
             .agg(known_name=("resolved_name", "max"),
                  known_type=("entity_type", "max")))
    seed_map = seed_map or {}
    seed_name = {e: nt[0] for e, nt in seed_map.items()}
    seed_type = {e: nt[1] for e, nt in seed_map.items()}
    per_surface = (surf.groupby(["entity_id", "mention_text"], sort=False)
                   ["n_occurrences"].sum().reset_index()
                   .sort_values(["entity_id", "n_occurrences",
                                 "mention_text"],
                                ascending=[True, False, True],
                                kind="mergesort"))
    top_surface = (per_surface.drop_duplicates("entity_id")
                   .set_index("entity_id")["mention_text"])
    prio = {t: i for i, t in enumerate(TYPE_PRIORITY)}
    inv = dict(enumerate(TYPE_PRIORITY))
    best_rank = (surf.assign(_r=surf["entity_type"].map(prio)
                             .fillna(len(TYPE_PRIORITY)))
                 .groupby("entity_id", sort=False)["_r"].min())
    fallback_type = best_rank.map(lambda r: inv.get(int(r), "unknown"))
    n_types = surf.groupby("entity_id", sort=False)["entity_type"].nunique()

    out = pd.DataFrame({"entity_id": best_rank.index})
    out["canonical_name"] = (out["entity_id"].map(seed_name)
                             .fillna(out["entity_id"].map(known["known_name"]))
                             .fillna(out["entity_id"].map(top_surface)))
    out["entity_type"] = (out["entity_id"].map(seed_type)
                          .fillna(out["entity_id"].map(known["known_type"]))
                          .fillna(out["entity_id"].map(fallback_type)))
    out["n_types"] = out["entity_id"].map(n_types)
    return out[["entity_id", "canonical_name", "entity_type", "n_types"]]


def triples_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """A1 triple merge (``RelationshipTriple.merge_with``,
    models/relationships.py:114-125) for ALL (s,p,o) keys in one hashagg
    bucket.  Input = partial rows keyed (s,p,o,unit): mention_count = sum of
    partial counts, passage_ids = sorted distinct units, confidence = max —
    all via vectorized polars groupbys (the unique-unit pass collapses
    duplicate (s,p,o,unit) rows arriving from different batches first).
    Entity types are attached AFTER this aggregation by a hash join against
    the nodes table (code-symbol nodes scale with the corpus — never a
    driver broadcast)."""
    import polars as pl
    keys = ["subj_id", "pred", "obj_id"]
    d = pl.from_pandas(g)
    per_unit = (d.group_by(keys + ["unit_id"])
                .agg(cnt=pl.col("cnt").sum(),
                     confidence=pl.col("confidence").max())
                .sort(keys + ["unit_id"]))
    base = (per_unit.group_by(keys, maintain_order=True)
            .agg(mention_count=pl.col("cnt").sum().cast(pl.Int64),
                 n_units=pl.len().cast(pl.Int64),
                 passage_ids=pl.col("unit_id"),   # sorted (per_unit sort)
                 confidence=pl.col("confidence").max()))
    out = base.rename({"subj_id": "subj", "obj_id": "obj"}).to_pandas()
    # list columns are not joinable payloads in Acero — carry the sorted
    # unit-id list as a joined string through the node-type hash joins and
    # split it back in the finishing map
    out["passage_ids_str"] = out["passage_ids"].map(
        lambda ids: "\x1f".join(ids))
    out["confidence"] = out["confidence"].astype("float64")
    return out[["subj", "pred", "obj", "mention_count", "n_units",
                "passage_ids_str", "confidence"]]


# bump when the on-disk stage layout changes — stale checkpoints from an
# older layout must not be resumed into
PIPE_LAYOUT_VERSION = 6


def default_out_root(sf_dir: str) -> str:
    return os.path.join("/tmp/raykg_out",
                        f"v{sc.GEN_VERSION}p{PIPE_LAYOUT_VERSION}",
                        sc.sf_tag_of(sf_dir))


def build_kg(sf_dir: str, out_root: str | None = None, force: bool = False,
             extract_concurrency=None, batch_size: int = 1024,
             llm_backend=None) -> dict:
    """Run the full pipeline for one sf dir; returns dict of output paths.

    Idempotent/resumable: completed stages (lineage manifest present) are
    skipped unless ``force``.  ``extract_concurrency``: pass an int/tuple to
    run extractors as an actor pool (heavy-model path); default None runs
    them as stateless tasks.

    ``llm_backend`` enables the LLM extraction tier (M7/R3/R5 — the
    reference's ``use_llm`` gate, ``extract/extractor.py:44-54``): the
    prose extractor runs as an ACTOR POOL (client built once per actor)
    and LLM mentions/relations/events merge into the extract stream with
    method='llm'.  Default None = pattern-only, byte-identical output.
    Pass a distinct ``out_root`` (or rely on the automatic ``_llm``
    suffix) so LLM and non-LLM runs never share stage checkpoints.
    """
    data_dir = sc.generate(sf_dir)
    corpus_path = os.path.join(data_dir, "corpus.parquet")
    alias_path = os.path.join(data_dir, "alias_table.parquet")
    if out_root is None:
        out_root = default_out_root(sf_dir)
        if llm_backend is not None:
            out_root += "_llm"
    os.makedirs(out_root, exist_ok=True)
    n_blocks = _ncpu() * 2

    def read_corpus():
        return rd.read_parquet(corpus_path, override_num_blocks=n_blocks)

    # ---- stage: units (corpus → unit explode) ----
    # PER-PARTITION checkpoints (north rule): the corpus part files are
    # hashed into K partitions; each writes + commits independently, so a
    # mid-stage kill resumes at the partition level (only unfinished
    # partitions recompute — tests/test_resume_kill.py kills mid-units).
    import glob as glob_
    corpus_files = sorted(glob_.glob(os.path.join(corpus_path,
                                                  "*.parquet")))
    n_parts = max(1, min(8, len(corpus_files)))
    file_groups = [corpus_files[i::n_parts] for i in range(n_parts)]

    def write_units_partition(pid: str, tmp: str):
        files = file_groups[int(pid)]
        # each partition still fans out to the FULL cpu budget — the
        # CONCURRENT executions (max_workers below) interleave on the
        # shared task pool, so any one of them can soak idle CPUs when the
        # others stall on I/O.  row_group_size=256 in the corpus files
        # lets the read split far below file granularity.
        ds = rd.read_parquet(files, override_num_blocks=max(2, n_blocks))
        # repartition before the sink: compute stays n_blocks-wide, the
        # write emits ~8 well-sized files per partition (NOT
        # min_rows_per_file, which serialized this write: 15 s -> 157 s)
        (split.units_dataset(ds).repartition(8)
         .write_parquet(tmp))
        return {"n_input_files": len(files)}

    # concurrent executions overlap the ~0.9 s/execution scheduling floor
    # (8 sequential executions paid ~7 s of pure floor at sf0.01) while
    # keeping per-partition resume markers
    units_dir = lineage.run_partitioned_stage(
        out_root, "units", [str(i) for i in range(n_parts)],
        write_units_partition, force, max_workers=n_parts)

    # ---- stage: extract (prose units + code files, one pass each) ----
    def write_extract(tmp: str):
        units = rd.read_parquet(
            units_dir,
            columns=["unit_id", "doc_sha256", "repo", "path", "lang", "text"])
        if extract_concurrency is not None or llm_backend is not None:
            # actor pool: model/client state built once per actor (ST1/ST4)
            conc = extract_concurrency if extract_concurrency is not None \
                else (1, max(2, _ncpu() // 2))
            # max_restarts=0 on every actor-pool stage: Ray Data 2.49
            # ships the transformer via the object store (ray#53727), so
            # actor RESTART (vs replacement) could never succeed after
            # arg loss anyway; recovery = lineage stage resume
            prose = units.map_batches(
                extract.UnitExtractor, batch_format="pyarrow",
                batch_size=batch_size, zero_copy_batch=True,
                concurrency=conc, max_restarts=0,
                fn_constructor_kwargs={"llm_backend": llm_backend})
            from raykg.stages import registry
            code = read_corpus().map_batches(
                registry.DispatchCodeExtractor, batch_format="pyarrow",
                batch_size=64, concurrency=conc, max_restarts=0)
        else:
            prose = units.map_batches(
                extract_units_fn, batch_format="pyarrow",
                batch_size=batch_size, zero_copy_batch=True)
            code = read_corpus().map_batches(
                extract_code_fn, batch_format="pyarrow", batch_size=64)
        # one execution for both branches (identical row schema) — two
        # sequential write_parquet calls pay Ray's per-execution startup
        # twice.  Hive-partition by kind so each downstream stage scans ONLY
        # its slice (mention/rel/alias_pair/event) instead of filtering a
        # full-table read.
        prose.union(code).write_parquet(tmp, partition_cols=["kind"],
                                        min_rows_per_file=WRITE_MIN_ROWS)

    extract_dir = lineage.run_stage(out_root, "extract", write_extract, force)

    # ---- canonicalize: alias-pair edges → union-find rep map (C4) ----
    # The distinct alias-pair vocabulary is bounded by the surface
    # vocabulary (not the corpus): dedup distributed (hashagg.distinct), then
    # collect the vocabulary-sized distinct pairs for driver union-find.
    alias_index = link.load_alias_index(alias_path)
    known_ids = {v[0] for v in alias_index.values()}

    def pairs_to_edges(t: pa.Table) -> pa.Table:
        # alias-pair slice is vocabulary-bounded; the fuzzy index is
        # memoized per process and hoisted out of the row loop
        fz = link.fuzzy_index_for(alias_index)
        us, vs = [], []
        for x, y in zip(t["subj"].to_pylist(), t["obj"].to_pylist()):
            us.append(link.resolve_key(link.norm_key(x), alias_index,
                                       fz)[0])
            vs.append(link.resolve_key(link.norm_key(y), alias_index,
                                       fz)[0])
        return pa.table({"u": pa.array(us, pa.string()),
                         "v": pa.array(vs, pa.string())})

    edges = read_extract_kind(extract_dir, extract.KIND_ALIAS).map_batches(
        pairs_to_edges, batch_format="pyarrow")
    edge_rows = hashagg.distinct(edges, ["u", "v"]).take_all()
    rep = components.union_find(
        [(r["u"], r["v"]) for r in edge_rows],
        key=lambda x: (0 if x in known_ids else 1, x))

    alias_ref = ray.put(alias_index)
    rep_ref = ray.put(rep)

    # ---- stage: mentions (resolved, final canonical ids) ----
    def resolve_mentions_fn(batch: pd.DataFrame) -> pd.DataFrame:
        # resolver is a worker-process singleton so its per-surface memo
        # cache survives across batches (prose surfaces repeat heavily)
        resolver = _singleton(
            f"resolver_{alias_ref.hex() if hasattr(alias_ref, 'hex') else id(alias_ref)}",
            lambda: link.ResolveMentions(get_cached(alias_ref)))
        rep_map = get_cached(rep_ref)
        out = resolver(batch)
        out["entity_id"] = [rep_map.get(e, e) for e in out["entity_id"]]
        return out[["unit_id", "doc_sha256", "repo", "path", "lang", "subj",
                    "label", "confidence", "start_char", "end_char",
                    "n_occurrences", "entity_id", "entity_type",
                    "link_confidence", "is_new", "resolved_name"]].rename(
            columns={"subj": "mention_text"})

    def write_mentions(tmp: str):
        (read_extract_kind(extract_dir, extract.KIND_MENTION)
         .map_batches(resolve_mentions_fn, batch_format="pandas",
                      batch_size=4096)
         .map_batches(strip_meta, batch_format="pyarrow")
         .write_parquet(tmp, min_rows_per_file=WRITE_MIN_ROWS))

    mentions_dir = lineage.run_stage(out_root, "mentions", write_mentions,
                                     force)

    # ---- stage: mention_edges (entity↔unit, S9 analog) ----
    # a unit's mention rows are written contiguously by one task, so the
    # (entity, unit) aggregation needs no global shuffle — per-block
    # groupby + boundary-unit repair (hashagg.sum_col_contiguous)
    def write_mention_edges(tmp: str):
        (hashagg.sum_col_contiguous(
            rd.read_parquet(mentions_dir,
                            columns=["entity_id", "unit_id",
                                     "n_occurrences"]),
            ["entity_id", "unit_id"], "n_occurrences",
            contig_key="unit_id", name="mention_count")
         .map_batches(strip_meta, batch_format="pyarrow")
         .write_parquet(tmp, min_rows_per_file=WRITE_MIN_ROWS))

    mention_edges_dir = lineage.run_stage(out_root, "mention_edges",
                                          write_mention_edges, force)

    # ---- stage: nodes (entity aggregation, S6/A2 analog) ----
    # Split into two combiner-compressed aggregations joined per entity —
    # the single-pass version shipped every raw mention row of a hot entity
    # into one bucket (skew straggler); here both shuffles move per-batch
    # partial sums only.
    def write_nodes(tmp: str):
        surf_partial_cols = ["entity_id", "mention_text", "entity_type",
                             "is_new", "resolved_name"]

        def surf_partial(df: pd.DataFrame) -> pd.DataFrame:
            import polars as pl
            return (pl.from_pandas(df).group_by(surf_partial_cols)
                    .agg(n_occurrences=pl.col("n_occurrences").sum())
                    .to_pandas())

        def nodes_bucket_seeded(g: pd.DataFrame) -> pd.DataFrame:
            # seed attrs of the union-find REPRESENTATIVE (ADVICE: never a
            # max() over merged seeds); alias index is the already-broadcast
            # vocabulary-bounded seed table, read once per worker
            idx = get_cached(alias_ref)
            seeds = {eid: (name, etype)
                     for eid, etype, name in idx.values()}
            return nodes_bucket(g, seed_map=seeds)

        # mention_edges rows are globally DISTINCT (entity, unit) pairs, so
        # per-batch counts are a valid combiner — the shuffle ships partial
        # sums, not the 1-row-per-pair table
        def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
            import polars as pl
            return (pl.from_pandas(df).group_by("entity_id")
                    .agg(mention_count=pl.col("mention_count").sum()
                         .cast(pl.Int64),
                         n_units=pl.len().cast(pl.Int64),
                         first_seen_unit=pl.col("unit_id").min())
                    .to_pandas())

        def stats_final(g: pd.DataFrame) -> pd.DataFrame:
            import polars as pl
            return (pl.from_pandas(g).group_by("entity_id")
                    .agg(mention_count=pl.col("mention_count").sum(),
                         n_units=pl.col("n_units").sum(),
                         first_seen_unit=pl.col("first_seen_unit").min())
                    .to_pandas())

        # ONE bucketed shuffle co-locates both aggregations by entity_id;
        # the surface/name rollup and the unit stats merge in-bucket — no
        # Dataset.join (its aggregator-actor pool costs ~4 s of fixed
        # startup per join regardless of data size)
        def nodes_final(frames: list[pd.DataFrame]) -> pd.DataFrame:
            names_df = nodes_bucket_seeded(frames[0])
            stats_df = stats_final(frames[1])
            out = names_df.merge(stats_df, on="entity_id", how="inner")
            return out[["entity_id", "canonical_name", "entity_type",
                        "mention_count", "n_units", "n_types",
                        "first_seen_unit"]]

        (hashagg.cogroup_apply(
            [(rd.read_parquet(mentions_dir,
                              columns=surf_partial_cols + ["n_occurrences"]),
              surf_partial,
              {"entity_id": "object", "mention_text": "object",
               "entity_type": "object", "is_new": "boolean",
               "resolved_name": "object", "n_occurrences": "Int64"}),
             (rd.read_parquet(mention_edges_dir), stats_partial,
              {"entity_id": "object", "mention_count": "Int64",
               "n_units": "Int64", "first_seen_unit": "object"})],
            ["entity_id"], nodes_final)
         .map_batches(strip_meta, batch_format="pyarrow")
         .write_parquet(tmp))

    nodes_dir = lineage.run_stage(out_root, "nodes", write_nodes, force)

    # ---- stage: triples (A1 merge: partial per-batch → groupby final) ----
    def resolve_triples_fn(batch: pd.DataFrame) -> pd.DataFrame:
        aidx = get_cached(alias_ref)
        rep_map = get_cached(rep_ref)

        def rid(text: str, method: str) -> str:
            if method == "code":
                return text
            eid = link.resolve_key(link.norm_key(text), aidx,
                                   link.fuzzy_index_for(aidx))[0]
            return rep_map.get(eid, eid)

        import polars as pl
        batch = batch.copy()
        # resolve per UNIQUE surface (prose surfaces repeat heavily), then
        # vectorized .map back onto the rows
        uniq = pd.unique(pd.concat([batch["subj"], batch["obj"]]))
        is_code = batch["method"] == "code"
        rmap = {t: rid(t, "x") for t in uniq}
        batch["subj_id"] = batch["subj"].map(rmap).where(~is_code,
                                                         batch["subj"])
        batch["obj_id"] = batch["obj"].map(rmap).where(~is_code,
                                                       batch["obj"])
        # partial aggregation inside the batch (combiner before shuffle):
        # one row per (s,p,o,unit) — polars group_by (string keys are 20×
        # slower through pandas object dtype)
        return (pl.from_pandas(batch[["subj_id", "pred", "obj_id", "unit_id",
                                      "confidence"]])
                .group_by(["subj_id", "pred", "obj_id", "unit_id"])
                .agg(cnt=pl.len().cast(pl.Int64),
                     confidence=pl.col("confidence").max())
                .to_pandas())

    def write_triples(tmp: str):
        partials = (read_extract_kind(extract_dir, extract.KIND_REL)
                    .map_batches(resolve_triples_fn, batch_format="pandas",
                                 batch_size=8192))
        # coalesce merges map_groups' zero-column empty blocks away (join
        # schema safety) — but its count also caps downstream parallelism
        # (typing map + final sort run one task per block), so size it to
        # the cpu budget, not a constant 8 (measured: the final sort ran
        # 8-wide on 32 cpus).
        merged = hashagg.grouped_apply(partials,
                                       ["subj_id", "pred", "obj_id"],
                                       triples_bucket,
                                       coalesce=max(8, _ncpu()))

        # entity typing against the nodes table — SIZE-GATED strategy:
        # prose entity vocabularies are bounded (thousands), but
        # code-symbol nodes scale WITH the corpus (every defined function),
        # so neither "always broadcast" nor "always shuffle-join" is right.
        # Below the threshold the (entity_id → type) map is ray.put once
        # and applied as a vectorized per-batch .map (zero shuffle, zero
        # join-actor startup); above it, two bucketed hash joins.  The
        # parquet row count comes from file metadata — no scan.
        import pyarrow.dataset as pads
        n_nodes = pads.dataset(
            glob_.glob(os.path.join(nodes_dir, "*.parquet"))).count_rows()
        if n_nodes <= BROADCAST_MAX_ROWS:
            ntbl = pq.read_table(nodes_dir,
                                 columns=["entity_id", "entity_type"])
            type_ref = ray.put(dict(zip(
                ntbl["entity_id"].to_pylist(),
                ntbl["entity_type"].to_pylist())))

            def finish(df: pd.DataFrame) -> pd.DataFrame:
                tmap = get_cached(type_ref)
                df = df.copy()
                df["subj_type"] = df["subj"].map(tmap).fillna("unknown")
                df["obj_type"] = df["obj"].map(tmap).fillna("unknown")
                return df[["subj", "pred", "obj", "subj_type", "obj_type",
                           "mention_count", "n_units", "passage_ids_str",
                           "confidence"]]

            typed = merged.map_batches(finish, batch_format="pandas")
        else:
            nodes_s = rd.read_parquet(
                nodes_dir, columns=["entity_id", "entity_type"]).map_batches(
                lambda df: df.rename(columns={"entity_id": "subj",
                                              "entity_type": "subj_type"}),
                batch_format="pandas")
            nodes_o = rd.read_parquet(
                nodes_dir, columns=["entity_id", "entity_type"]).map_batches(
                lambda df: df.rename(columns={"entity_id": "obj",
                                              "entity_type": "obj_type"}),
                batch_format="pandas")

            def finish(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["subj_type"] = df["subj_type"].fillna("unknown")
                df["obj_type"] = df["obj_type"].fillna("unknown")
                return df[["subj", "pred", "obj", "subj_type", "obj_type",
                           "mention_count", "n_units", "passage_ids_str",
                           "confidence"]]

            typed = (hashagg.coalesced_join(merged, nodes_s, on=("subj",),
                                            join_type="left_outer",
                                            num_partitions=max(8, _ncpu()))
                     .join(hashagg.arrow_clean(nodes_o), join_type="left_outer",
                           num_partitions=max(8, _ncpu()), on=("obj",))
                     .map_batches(finish, batch_format="pandas"))

        # the unit-id payload traverses the final sort exchange as ONE
        # joined string per triple; the list<string> split happens in a
        # local map AFTER the sort — list offsets/objects never ride the
        # all-to-all (VERDICT r3 item 2: shrink exchanged bytes)
        def split_passages(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["passage_ids"] = df["passage_ids_str"].str.split("\x1f")
            return df[["subj", "pred", "obj", "subj_type", "obj_type",
                       "mention_count", "n_units", "passage_ids",
                       "confidence"]]

        (typed.sort(["subj", "pred", "obj"])
         .map_batches(split_passages, batch_format="pandas")
         .map_batches(strip_meta, batch_format="pyarrow")
         .write_parquet(tmp))

    triples_dir = lineage.run_stage(out_root, "triples", write_triples, force)

    return {
        "data_dir": data_dir, "out_root": out_root,
        "corpus": corpus_path, "alias_table": alias_path,
        "units": units_dir, "extract": extract_dir,
        "mentions": mentions_dir,
        "nodes": nodes_dir, "triples": triples_dir,
        "mention_edges": mention_edges_dir,
    }
