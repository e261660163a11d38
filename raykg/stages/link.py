"""Link stage: mention → candidate entity via broadcast alias table.

Reference semantics:

* J1 exact lookup (``extract/resolver.py:72-89``): lowercase exact match →
  conf 1.0; leading-article strip → conf 0.95.
* J2 fuzzy lookup (``extract/resolver.py:91-106``): rapidfuzz ``fuzz.ratio``
  ≥ 85 over alias keys.  At scale an O(n·m) scan is replaced by character
  3-gram inverted-index candidate generation (MinHash/Jaccard family,
  SURVEY.md J2) + exact ratio verification of survivors.
* ST2: the alias index is built once on the driver, ``ray.put`` once, and
  read in each actor's ``__init__`` — a broadcast join, never a shuffle of
  the mention table (SURVEY.md §2.4 skew note).

The resolver actor adds ``entity_id / entity_type / link_confidence /
is_new`` columns to mention rows.  Unknown mentions get the deterministic
slug id (stable under any parallelism — unlike the reference's
``len(self.clusters)`` counter, ``dynamic_resolver.py:160``).
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq
import ray

from raykg.functions.textnorm import (char_ngrams, fuzzy_ratio, norm_key,
                                      slugify, strip_article)

FUZZY_THRESHOLD = 85.0       # reference config: fuzzy_threshold=85


def load_alias_index(alias_table_path: str) -> dict[str, tuple[str, str, str]]:
    """alias_table.parquet → {norm_key: (entity_id, entity_type, canonical_name)}.

    Keys: canonical name + every alias, normalized (lowercase, ws-collapsed,
    possessive-stripped) — reference ``EntityDatabase`` (resolver.py:32-70).
    """
    tbl = pq.read_table(alias_table_path)
    index: dict[str, tuple[str, str, str]] = {}
    for eid, name, aliases, etype in zip(
            tbl["entity_id"].to_pylist(), tbl["canonical_name"].to_pylist(),
            tbl["aliases"].to_pylist(), tbl["entity_type"].to_pylist()):
        index[norm_key(name)] = (eid, etype, name)
        for a in aliases or []:
            index[norm_key(a)] = (eid, etype, name)
    return index


class FuzzyIndex:
    """J2 scale path for the reference's fuzzy tier
    (``extract/resolver.py:91-106``: ``process.extractOne(key, aliases,
    scorer=fuzz.ratio)`` ≥ 85): a character-3-gram inverted index over the
    alias keys generates candidates; survivors are verified with the exact
    Indel ratio (== rapidfuzz ``fuzz.ratio``).  Built once per actor /
    worker from the broadcast alias index — never per batch."""

    def __init__(self, alias_index: dict[str, tuple[str, str, str]],
                 threshold: float = None, ngram: int = 3):
        self.threshold = FUZZY_THRESHOLD if threshold is None else threshold
        self.ngram = ngram
        self.keys = sorted(alias_index)
        self.inv: dict[str, list[int]] = defaultdict(list)
        for j, k in enumerate(self.keys):
            for sh in char_ngrams(k, ngram):
                self.inv[sh].append(j)

    def best(self, key: str) -> tuple[str, float] | None:
        """Best alias key with Indel ratio ≥ threshold, or None.  Ties
        break by (score desc, key asc) — deterministic, unlike the
        reference's dict-iteration-order extractOne."""
        cand: set[int] = set()
        for sh in char_ngrams(key, self.ngram):
            cand.update(self.inv.get(sh, ()))
        best: tuple[float, str] | None = None
        for j in sorted(cand):
            score = fuzzy_ratio(key, self.keys[j])
            if score >= self.threshold and (
                    best is None or score > best[0]):
                best = (score, self.keys[j])
        return (best[1], best[0]) if best is not None else None


_FUZZY_CACHE: dict[int, FuzzyIndex] = {}


def fuzzy_index_for(alias_index: dict) -> FuzzyIndex:
    """Per-process memoized FuzzyIndex keyed by the alias dict identity
    (the broadcast object is fetched once per worker, so id() is stable)."""
    fi = _FUZZY_CACHE.get(id(alias_index))
    if fi is None:
        fi = FuzzyIndex(alias_index)
        _FUZZY_CACHE[id(alias_index)] = fi
    return fi


def resolve_key(key: str, alias_index: dict[str, tuple[str, str, str]],
                fuzzy: FuzzyIndex | None = None
                ) -> tuple[str, str, float, bool, str | None]:
    """Resolve a normalized key — the reference's full lookup ladder
    (``extract/resolver.py:72-106``): exact → article-strip → fuzzy ≥ 85
    (conf = score/100) → new entity with deterministic slug.  Returns
    (entity_id, entity_type, confidence, is_new, canonical_name|None)."""
    hit = alias_index.get(key)
    if hit is not None:
        return hit[0], hit[1], 1.0, False, hit[2]
    stripped = strip_article(key)
    if stripped != key:
        hit = alias_index.get(stripped)
        if hit is not None:
            return hit[0], hit[1], 0.95, False, hit[2]
    if fuzzy is not None:
        m = fuzzy.best(key)
        if m is not None:
            hit = alias_index[m[0]]
            return hit[0], hit[1], m[1] / 100.0, False, hit[2]
    return slugify(key), infer_new_type(key), 0.7, True, None


# M10 keyword type inference for new entities — the reference's
# pattern-based branch of ``_infer_type`` (extract/resolver.py:237-257):
# place indicators first, then object indicators, substring semantics.
PLACE_INDICATORS = [
    "mountain", "forest", "river", "lake", "sea", "land",
    "realm", "kingdom", "city", "tower", "hall", "gate",
    "pass", "valley", "plain", "wood", "dale", "shire",
]
OBJECT_INDICATORS = [
    "ring", "sword", "staff", "jewel", "stone", "gem",
    "crown", "armor", "helm", "blade", "bow", "arrow",
]


def infer_new_type(key: str) -> str:
    """``_infer_type``'s keyword ladder over the normalized (lowercase)
    key; the label branch (PERSON → character) is applied per sighting in
    ResolveMentions, mirroring the reference's label_map precedence."""
    if any(ind in key for ind in PLACE_INDICATORS):
        return "place"
    if any(ind in key for ind in OBJECT_INDICATORS):
        return "object"
    return "unknown"


_CODE_TYPE = {"MODULE": "module", "FUNCTION": "function", "CALL": "function"}


class ResolveMentions:
    """Actor-pool callable: mention rows → + entity columns.

    ``alias_ref`` is a ``ray.put`` handle of the alias index — fetched once
    per actor (broadcast, zero per-batch shipping).
    """

    def __init__(self, alias_ref):
        self.alias_index = ray.get(alias_ref) if isinstance(
            alias_ref, ray.ObjectRef) else alias_ref
        self._cache: dict[str, tuple] = {}

    def _resolve(self, text: str, label: str, method: str) -> tuple:
        if method == "code":
            # code ids are already canonical (module / qualified def names)
            return text, _CODE_TYPE.get(label, "unknown"), 1.0, False, text
        got = self._cache.get(text)
        if got is None:
            eid, etype, conf, is_new, canon = resolve_key(
                norm_key(text), self.alias_index,
                fuzzy_index_for(self.alias_index))
            got = (eid, etype, conf, is_new, canon if canon else text)
            self._cache[text] = got
        # per-ROW typing for unknowns: a PERSON-labelled sighting is a
        # character sighting; the cache keeps the label-independent base so
        # the result never depends on which label a worker saw first
        if got[3] and label == "PERSON" and got[1] != "character":
            return got[0], "character", got[2], True, got[4]
        return got

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        resolved = [self._resolve(t, l, m) for t, l, m in zip(
            batch["subj"], batch["label"], batch["method"])]
        batch = batch.copy()
        batch["entity_id"] = [r[0] for r in resolved]
        batch["entity_type"] = [r[1] for r in resolved]
        batch["link_confidence"] = [r[2] for r in resolved]
        batch["is_new"] = [r[3] for r in resolved]
        batch["resolved_name"] = [r[4] for r in resolved]
        return batch


def fuzzy_candidates(new_keys: list[str], alias_keys: list[str],
                     threshold: float = FUZZY_THRESHOLD,
                     ngram: int = 3) -> list[tuple[str, str, float]]:
    """J2 scale path: 3-gram inverted index over alias keys → candidate
    pairs sharing ≥1 shingle → verify with Indel ratio ≥ threshold.
    Returns (new_key, alias_key, score) best-match-per-new-key."""
    inv: dict[str, list[int]] = defaultdict(list)
    alias_grams = []
    for j, ak in enumerate(alias_keys):
        g = char_ngrams(ak, ngram)
        alias_grams.append(g)
        for sh in g:
            inv[sh].append(j)
    out: list[tuple[str, str, float]] = []
    for nk in new_keys:
        grams = char_ngrams(nk, ngram)
        cand: set[int] = set()
        for sh in grams:
            cand.update(inv.get(sh, ()))
        best: tuple[float, str] | None = None
        for j in cand:
            score = fuzzy_ratio(nk, alias_keys[j])
            if score >= threshold and (best is None or score > best[0]):
                best = (score, alias_keys[j])
        if best is not None:
            out.append((nk, best[1], best[0]))
    return out
