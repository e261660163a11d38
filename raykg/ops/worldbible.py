"""World-bible categorizer (reference ``worldbible/patterns.py:107-239``).

Deterministic transposition of the reference's per-passage category scoring:
each category has a keyword list (``vocab.WB_CATEGORIES``) scored at
``WB_KEYWORD_WEIGHT`` per occurrence, plus rule-shaped sentence patterns
(``vocab.WB_RULE_PATTERNS``, the "Only X can Y" / "X must never Y" family,
reference :90-105) that add ``WB_RULE_WEIGHT`` — applied only when the
category also has keyword evidence, mirroring the reference's boost-not-
standalone behavior.  Units scoring ≥ ``WB_THRESHOLD`` in a category become
world-building passages for that category (``is_world_building_passage``
:205-208 analog).

Pure per-batch transform — shares every constant with the DuckDB oracle.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from raykg import vocab

_KW_RES = {
    cat: re.compile(r"\b(" + "|".join(kws) + r")\b")
    for cat, kws in vocab.WB_CATEGORIES.items()
}
_RULE_RES = [re.compile(p) for p in vocab.WB_RULE_PATTERNS]


def first_rule_match(text: str) -> str:
    for rx in _RULE_RES:
        m = rx.search(text)
        if m:
            return m.group(0)
    return ""


def categorize_batch(t: pa.Table) -> pd.DataFrame:
    unit_ids, cats, scores, rules = [], [], [], []
    for uid, lang, text in zip(t["unit_id"].to_pylist(),
                               t["lang"].to_pylist(),
                               t["text"].to_pylist()):
        if lang != "txt":
            continue
        low = text.lower()
        rule = first_rule_match(text)
        for cat in sorted(_KW_RES):
            hits = len(_KW_RES[cat].findall(low))
            if hits == 0:
                continue
            score = vocab.WB_KEYWORD_WEIGHT * hits
            if rule:
                score += vocab.WB_RULE_WEIGHT
            if score >= vocab.WB_THRESHOLD:
                unit_ids.append(uid)
                cats.append(cat)
                scores.append(round(score, 6))
                rules.append(rule)
    return pd.DataFrame({
        "unit_id": pd.Series(unit_ids, dtype=str),
        "category": pd.Series(cats, dtype=str),
        "score": pd.Series(scores, dtype="float64"),
        "rule_text": pd.Series(rules, dtype=str),
    })


def _unit_category_rows(t: pa.Table):
    """Yield (unit_id, text, category) for every categorized prose unit —
    shared by the A16 grouping extractors."""
    for uid, lang, text in zip(t["unit_id"].to_pylist(),
                               t["lang"].to_pylist(),
                               t["text"].to_pylist()):
        if lang != "txt":
            continue
        low = text.lower()
        rule = first_rule_match(text)
        for cat in sorted(_KW_RES):
            hits = len(_KW_RES[cat].findall(low))
            if hits == 0:
                continue
            score = vocab.WB_KEYWORD_WEIGHT * hits
            if rule:
                score += vocab.WB_RULE_WEIGHT
            if score >= vocab.WB_THRESHOLD:
                yield uid, text, cat


_FOLK_RE = re.compile(vocab.WB_FOLK_PATTERN)
_LOC_RE = re.compile(vocab.WB_LOC_PATTERN, re.IGNORECASE)


def cultures_partial_batch(t: pa.Table) -> pd.DataFrame:
    """A16 cultures (worldbible/extractor.py:302-349): culture passages
    grouped by folk — emits (people, unit_id) rows; the query aggregates
    groups with >= 2 passages into profiles."""
    peoples, uids = [], []
    for uid, text, cat in _unit_category_rows(t):
        if cat != "culture":
            continue
        m = _FOLK_RE.search(text)
        if m:
            peoples.append(m.group(1).lower())
            uids.append(uid)
    return pd.DataFrame({"people": pd.Series(peoples, dtype=str),
                         "unit_id": pd.Series(uids, dtype=str)})


def magic_rows_batch(t: pa.Table) -> pd.DataFrame:
    """A16 magic system (extractor.py:352-382): magic passages become
    limitations (cannot/forbidden substrings) or abilities
    (can/able/power substrings, reference's elif order)."""
    kinds, uids, snippets = [], [], []
    for uid, text, cat in _unit_category_rows(t):
        if cat != "magic":
            continue
        low = text.lower()
        if any(w in low for w in vocab.WB_MAGIC_LIMIT_WORDS):
            kind = "limitation"
        elif any(w in low for w in vocab.WB_MAGIC_ABILITY_WORDS):
            kind = "ability"
        else:
            continue
        kinds.append(kind)
        uids.append(uid)
        snippets.append(text[:100])
    return pd.DataFrame({"kind": pd.Series(kinds, dtype=str),
                         "unit_id": pd.Series(uids, dtype=str),
                         "snippet": pd.Series(snippets, dtype=str)})


def geography_rows_batch(t: pa.Table) -> pd.DataFrame:
    """A16 geography (extractor.py:385-416): named-location pattern over
    geography passages — first match per unit (units are sentences),
    capitalized names longer than 2 chars."""
    names, uids = [], []
    for uid, text, cat in _unit_category_rows(t):
        if cat != "geography":
            continue
        m = _LOC_RE.search(text)
        if m:
            name = m.group(2).strip()
            if len(name) > 2 and name[:1].isupper():
                names.append(name)
                uids.append(uid)
    return pd.DataFrame({"name": pd.Series(names, dtype=str),
                         "unit_id": pd.Series(uids, dtype=str)})
