"""Unit-type classifier (reference ``style/classifier.py:85-136`` M13).

Deterministic transposition of the reference's passage-type scorers:
per-category pattern counts → argmax (ties → category name asc) with
normalized confidence; total score 0 or confidence < 0.5 → ``unknown``
(reference's ``< 0.5 → UNKNOWN`` rule).

Categories are built from the shared verb vocabulary so the DuckDB oracle
uses the identical regexes.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from raykg import vocab
from raykg.stages import extract

_COMBAT_PREDS = {"FOUGHT", "FOUGHT_AGAINST", "KILLED", "CAPTURED", "FREED"}
_TRAVEL_PREDS = {"TRAVELED_TO", "ENTERED", "LEFT", "VISITED",
                 "TRAVELED_WITH"}


def _verbs(preds: set[str]) -> list[str]:
    return sorted((v for v, p in vocab.VERB_PHRASE_TO_PRED.items()
                   if p in preds), key=lambda v: (-len(v), v))


# category → regex source (same string handed to DuckDB)
CATEGORY_PATTERNS: dict[str, str] = {
    "dialogue": r'"[^"]+"',
    "action": r"\b(" + "|".join(_verbs(_COMBAT_PREDS)) + r")\b",
    "travel": r"\b(" + "|".join(_verbs(_TRAVEL_PREDS)) + r")\b",
    "temporal": extract.ERA_YEAR_PATTERN,
}
CONF_THRESHOLD = 0.5

_RES = {c: re.compile(p) for c, p in CATEGORY_PATTERNS.items()}
_CATS = sorted(CATEGORY_PATTERNS)


def classify(text: str) -> tuple[str, float]:
    scores = {c: len(_RES[c].findall(text)) for c in _CATS}
    total = sum(scores.values())
    if total == 0:
        return "unknown", 0.0
    # argmax, ties → category name asc (sorted _CATS order)
    top = max(_CATS, key=lambda c: scores[c])
    conf = round(scores[top] / total, 6)
    if conf < CONF_THRESHOLD:
        return "unknown", conf
    return top, conf


def classify_batch(t: pa.Table) -> pd.DataFrame:
    has_repo = "repo" in t.schema.names
    repos = t["repo"].to_pylist() if has_repo else [None] * t.num_rows
    uids, types, confs, reps = [], [], [], []
    for uid, lang, text, repo in zip(t["unit_id"].to_pylist(),
                                     t["lang"].to_pylist(),
                                     t["text"].to_pylist(), repos):
        if lang != "txt":
            continue
        ut, conf = classify(text)
        uids.append(uid)
        types.append(ut)
        confs.append(conf)
        reps.append(repo)
    out = {"unit_id": pd.Series(uids, dtype=str),
           "unit_type": pd.Series(types, dtype=str),
           "confidence": pd.Series(confs, dtype="float64")}
    if has_repo:
        out["repo"] = pd.Series(reps, dtype=str)
    return pd.DataFrame(out)
