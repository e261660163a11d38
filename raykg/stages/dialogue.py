"""Dialogue branch: quoted-span extraction + speaker attribution.

Transposed reference semantics:

* span extraction   — ``voice/dialogue.py:124-218`` (M11): quoted spans
  (straight quotes; >1 char), ordered by position, classified
  question/exclamation/statement.
* speaker attribution — ``voice/dialogue.py:221-316`` (M12) 4-tier
  heuristic: (1) ``"..." said NAME`` conf 0.9; (2) ``NAME said "..."``
  conf 0.9; (3) speech verb + Name anywhere after the quote, conf 0.7;
  (4) nearest capitalized non-blocklist token, conf 0.4; else UNKNOWN.
* voice profile     — ``voice/profile.py:65-208`` (A12): per-speaker
  aggregates, speakers with ≥ ``MIN_LINES`` lines
  (``voice/analyzer.py:147-150`` min_lines_for_profile=3).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from raykg import vocab

QUOTE_PATTERN = r'"([^"]{2,})"'
MIN_LINES = 3

_QUOTE_RE = re.compile(QUOTE_PATTERN)
_SPEECH = "|".join(vocab.SPEECH_VERBS)
_AFTER_RE = re.compile(r"^\s*(" + _SPEECH + r")\s+([A-Z][a-z]+)\b")
_BEFORE_RE = re.compile(r"\b([A-Z][a-z]+)\s+(" + _SPEECH + r")[,:]?\s*$")
_ANY_VERB_NAME_RE = re.compile(r"\b(" + _SPEECH + r")\s+([A-Z][a-z]+)\b")
_CAP_RE = re.compile(r"\b[A-Z][a-z]+\b")
_BLOCK = frozenset(vocab.CAP_BLOCKLIST)


def attribute_speaker(text: str, start: int, end: int
                      ) -> tuple[str, str, float, int]:
    """Returns (speaker, speech_verb, confidence, tier)."""
    after = text[end:]
    before = text[:start]
    m = _AFTER_RE.match(after)
    if m:
        return m.group(2), m.group(1), 0.9, 1
    m = _BEFORE_RE.search(before)
    if m:
        return m.group(1), m.group(2), 0.9, 2
    m = _ANY_VERB_NAME_RE.search(after)
    if m:
        return m.group(2), m.group(1), 0.7, 3
    names = [t for t in _CAP_RE.findall(after) + _CAP_RE.findall(before)
             if t not in _BLOCK]
    if names:
        return names[0], "", 0.4, 4
    return "UNKNOWN", "", 0.0, 0


def spans_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    t = t.filter(pc.equal(t["lang"], "txt"))
    out = {k: [] for k in ("unit_id", "doc_sha256", "repo", "quote_text",
                            "speaker", "speech_verb", "position",
                            "is_question", "is_exclamation",
                            "attribution_conf", "attribution_tier")}
    for uid, sha, repo, text in zip(t["unit_id"].to_pylist(),
                                    t["doc_sha256"].to_pylist(),
                                    t["repo"].to_pylist(),
                                    t["text"].to_pylist()):
        for pos, m in enumerate(_QUOTE_RE.finditer(text)):
            content = m.group(1)
            speaker, verb, conf, tier = attribute_speaker(
                text, m.start(), m.end())
            out["unit_id"].append(uid)
            out["doc_sha256"].append(sha)
            out["repo"].append(repo)
            out["quote_text"].append(content)
            out["speaker"].append(speaker)
            out["speech_verb"].append(verb)
            out["position"].append(pos)
            out["is_question"].append(content.endswith("?"))
            out["is_exclamation"].append(content.endswith("!"))
            out["attribution_conf"].append(conf)
            out["attribution_tier"].append(tier)
    return pa.table({
        "unit_id": pa.array(out["unit_id"], pa.string()),
        "doc_sha256": pa.array(out["doc_sha256"], pa.string()),
        "repo": pa.array(out["repo"], pa.string()),
        "quote_text": pa.array(out["quote_text"], pa.string()),
        "speaker": pa.array(out["speaker"], pa.string()),
        "speech_verb": pa.array(out["speech_verb"], pa.string()),
        "position": pa.array(out["position"], pa.int64()),
        "is_question": pa.array(out["is_question"], pa.bool_()),
        "is_exclamation": pa.array(out["is_exclamation"], pa.bool_()),
        "attribution_conf": pa.array(out["attribution_conf"], pa.float64()),
        "attribution_tier": pa.array(out["attribution_tier"], pa.int64()),
    })


def voice_profile_group(g: pd.DataFrame) -> pd.DataFrame:
    """A12 per-speaker profile (≥ MIN_LINES lines)."""
    n = len(g)
    if n < MIN_LINES:
        return pd.DataFrame({c: [] for c in (
            "speaker", "n_lines", "question_ratio", "exclamation_ratio",
            "mean_quote_words", "n_units")})
    wc = g["quote_text"].str.count(r"[A-Za-z]+")
    return pd.DataFrame({
        "speaker": [g["speaker"].iloc[0]],
        "n_lines": [n],
        "question_ratio": [round(float(g["is_question"].sum()) / n, 6)],
        "exclamation_ratio": [round(float(g["is_exclamation"].sum()) / n, 6)],
        "mean_quote_words": [round(float(wc.mean()), 6)],
        "n_units": [g["unit_id"].nunique()],
    })
