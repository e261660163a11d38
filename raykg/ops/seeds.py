"""Seeds re-export — §2.9 pluggable-vocabulary surface.

The reference's resolver can dump its accumulated entity database back to
seed files (``extract/resolver.py:310-344`` ``export_seeds`` writes
``characters.json`` / ``places.json`` / ``objects.json``; the ``analyze``
command re-exports discovered entities as re-usable seeds,
``cli.py:652-675``).  Round-tripping matters: seeds exported from book 1
become the resolver input for book 2.

Engine shape: one distributed ``seeds`` table — per canonical entity, its
attributes plus the sorted distinct set of surface forms that resolved to
it (the reference's ``aliases`` list) — computed with ONE bucketed shuffle
(:func:`raykg.functions.hashagg.cogroup_apply` over mentions + nodes), then
an optional driver-side JSON dump per entity type.  The JSON dump collects
only the seeds table itself (vocabulary-bounded for prose: entities, not
mentions), never the mentions stream.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import ray.data as rd

from raykg.functions import hashagg

PROSE_TYPES = ("character", "place", "object", "unknown")

# reference export file per entity type (resolver.py:319-344)
SEED_FILES = {"character": "characters.json", "place": "places.json",
              "object": "objects.json"}


def seeds_dataset(paths: dict) -> rd.Dataset:
    """Per-entity seed rows: attributes + '|'-joined sorted alias surfaces.

    ``paths``: the dict returned by :func:`raykg.pipelines.kg.build_kg`.
    Mentions (the corpus-scaling side) are combined per batch to distinct
    ``(entity_id, mention_text)`` before the shuffle; nodes ride the same
    shuffle, so no join operator or second pass is needed.
    """
    mentions = rd.read_parquet(
        paths["mentions"], columns=["entity_id", "mention_text", "lang"])
    nodes = rd.read_parquet(
        paths["nodes"], columns=["entity_id", "canonical_name",
                                 "entity_type", "mention_count"])

    def mention_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"] == "txt"]
        return (df[["entity_id", "mention_text"]]
                .drop_duplicates())

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["entity_type"].isin(PROSE_TYPES)]

    def final(frames: list[pd.DataFrame]) -> pd.DataFrame:
        m, n = frames
        if len(n) == 0:
            return pd.DataFrame({
                "entity_id": pd.Series([], dtype="string"),
                "canonical_name": pd.Series([], dtype="string"),
                "entity_type": pd.Series([], dtype="string"),
                "mention_count": pd.Series([], dtype="int64"),
                "n_aliases": pd.Series([], dtype="int64"),
                "aliases_str": pd.Series([], dtype="string")})
        al = (m.drop_duplicates()
               .sort_values(["entity_id", "mention_text"])
               .groupby("entity_id")["mention_text"]
               .agg(lambda s: "|".join(s))
               .rename("aliases_str"))
        cnt = (m.drop_duplicates().groupby("entity_id")["mention_text"]
                .size().rename("n_aliases"))
        out = n.merge(al, on="entity_id", how="inner") \
               .merge(cnt, on="entity_id", how="inner")
        out["mention_count"] = out["mention_count"].astype("int64")
        out["n_aliases"] = out["n_aliases"].astype("int64")
        return out[["entity_id", "canonical_name", "entity_type",
                    "mention_count", "n_aliases", "aliases_str"]]

    return hashagg.cogroup_apply(
        [(mentions, mention_partial,
          {"entity_id": "string", "mention_text": "string"}),
         (nodes, node_partial,
          {"entity_id": "string", "canonical_name": "string",
           "entity_type": "string", "mention_count": "int64"})],
        keys=["entity_id"], final_fn=final, coalesce=4)


def export_seeds(paths: dict, out_dir: str) -> dict[str, str]:
    """Write reference-shaped seed JSON files (one per entity type).

    Row shape mirrors the shipped seeds (``data/seeds/characters.json``):
    ``{id, canonical_name, aliases:[...]}`` plus engine provenance fields.
    The collected data is the seeds TABLE (one row per canonical entity),
    not the mention stream — safe to take to the driver.
    """
    os.makedirs(out_dir, exist_ok=True)
    df = seeds_dataset(paths).to_pandas()
    written: dict[str, str] = {}
    for etype, fname in SEED_FILES.items():
        rows = df[df["entity_type"] == etype].sort_values("entity_id")
        if len(rows) == 0:
            continue
        payload = [
            {"id": r.entity_id,
             "canonical_name": r.canonical_name,
             "aliases": r.aliases_str.split("|"),
             "mention_count": int(r.mention_count)}
            for r in rows.itertuples()
        ]
        path = os.path.join(out_dir, fname)
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        written[etype] = path
    return written
