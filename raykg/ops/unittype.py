"""Unit-type classifier — reference ``style/classifier.py:85-246`` (M13).

Full transposition of the reference's SIX weighted scorers (dialogue,
action, description, travel, battle, reflection; EXPOSITION has no scorer
in the reference and therefore never occurs), with its exact rules:

- primary = max score, ties broken by scorer insertion order (the
  reference's stable ``sorted(..., reverse=True)`` over dict items);
- ``primary_score < 0.5`` → type ``unknown`` with confidence 0.0
  (a SCORE threshold, not a confidence threshold);
- confidence = ``min(1.0, primary/total)``;
- secondary_type = second-ranked type when its score > 0.3, else none;
- per-type caps (action/travel 3.0, battle 3.5).

Score arithmetic is written in closed form (``count * weight`` summed
left-to-right) so the DuckDB oracle can evaluate the IDENTICAL IEEE
expression; the reference's sequential ``score += w`` accumulation agrees
to float ulps (parity-tested against the in-process reference classifier).

All keyword/pattern constants are verbatim from the reference
(classifier.py:44-83) and are the single source for both the engine
kernels and the generated oracle SQL — no drift possible.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# --------------------------------------------------------- ref constants
# classifier.py:44-50 — pattern 0 is the quote pattern (ratio-scored);
# the rest are speech-verb presence checks worth 0.3 each
QUOTE_PATTERN = '["“][^"”]+["”]'
SPEECH_PATTERNS = [
    r"\bsaid\b", r"\basked\b", r"\breplied\b", r"\banswered\b",
    r"\bcried\b", r"\bshouted\b", r"\bwhispered\b", r"\bmuttered\b",
    r"\bexclaimed\b", r"\bdeclared\b", r"\bdemanded\b", r"\bbegged\b",
]

# classifier.py:52-56 — substring presence (NOT word-bounded), 0.4 each
ACTION_VERBS = [
    "ran", "jumped", "grabbed", "threw", "caught", "hit", "struck",
    "pulled", "pushed", "climbed", "fell", "leaped", "rushed", "seized",
    "turned", "moved", "sprang", "dashed", "plunged", "dove", "swung",
]

# classifier.py:58-64 — findall COUNTS, 0.3 per match
DESCRIPTION_INDICATORS = [
    r"\bwas\s+\w+ing\b",
    r"\bseemed\b", r"\bappeared\b", r"\blooked\b",
    r"\bthe\s+\w+\s+was\b",
    r"\bthere\s+was\b", r"\bthere\s+were\b",
]

# classifier.py:177-200 — token-equality adjectives, 0.2 each occurrence
DESC_ADJS = ["great", "dark", "long", "small", "old", "new", "high",
             "deep", "wide", "narrow", "bright", "dim", "cold", "warm",
             "vast"]

# classifier.py:66-71 — substring presence, 0.35 each
TRAVEL_KEYWORDS = [
    "walked", "went", "traveled", "journeyed", "rode", "marched",
    "path", "road", "trail", "way", "distance", "miles", "leagues",
    "east", "west", "north", "south", "onwards", "forward", "onward",
    "mountain", "forest", "river", "valley", "hill", "plain",
]
# classifier.py:206-209 — substring presence, 0.3 each
DIRECTIONS = ["east", "west", "north", "south", "onwards", "forward"]

# classifier.py:73-79 — substring presence, 0.4 each, cap 3.5
BATTLE_KEYWORDS = [
    "sword", "blade", "arrow", "spear", "shield", "armor", "helm",
    "fought", "battle", "war", "attack", "defend", "enemy", "foe",
    "slew", "killed", "wounded", "blood", "death", "fell", "charge",
    "army", "soldiers", "warriors", "host", "orcs", "goblins",
]

# classifier.py:81-83 — re.search presence, 0.35 each
REFLECTION_INDICATORS = [
    r"\bthought\b", r"\bwondered\b", r"\bremembered\b", r"\bfelt\b",
    r"\brealized\b", r"\bknew\b", r"\bunderstood\b", r"\bbelieved\b",
    r"\bhoped\b", r"\bfeared\b", r"\bdreamed\b", r"\bimagined\b",
]
# classifier.py:239-243 — space-padded substring, 0.2 each
FIRST_PERSON = ["i", "me", "my", "myself"]

# scorer insertion order == the reference's dict construction order
# (classify_passage:104-111); earlier wins score ties
TYPE_ORDER = ["dialogue", "action", "description", "travel", "battle",
              "reflection"]

_QUOTE_RE = re.compile(QUOTE_PATTERN)
_SPEECH_RES = [re.compile(p) for p in SPEECH_PATTERNS]
_DESC_RES = [re.compile(p) for p in DESCRIPTION_INDICATORS]
_REFL_RES = [re.compile(p) for p in REFLECTION_INDICATORS]
_WS_RE = re.compile(r"\s+")


def scores_of(text: str) -> list[float]:
    """The six scores in TYPE_ORDER (closed-form float expressions)."""
    tl = text.lower()

    quoted = sum(len(q) for q in _QUOTE_RE.findall(text))
    ratio = quoted / len(text) if text else 0.0
    n_speech = sum(1 for p in _SPEECH_RES if p.search(tl))
    dialogue = ratio * 3.0 + n_speech * 0.3

    n_act = sum(1 for v in ACTION_VERBS if v in tl)
    sentences = tl.split(".")
    short = sum(1 for s in sentences if 3 < len(s.split()) < 10)
    bonus = 0.5 if short > len(sentences) / 2.0 else 0.0
    action = min(n_act * 0.4 + bonus, 3.0)

    n_desc = sum(len(p.findall(tl)) for p in _DESC_RES)
    words = tl.split()
    n_adj = sum(1 for w in words if w in DESC_ADJS)
    long_bonus = 0.3 if len(words) > 30 else 0.0
    description = n_desc * 0.3 + n_adj * 0.2 + long_bonus

    n_trav = sum(1 for k in TRAVEL_KEYWORDS if k in tl)
    n_dir = sum(1 for d in DIRECTIONS if d in tl)
    travel = min(n_trav * 0.35 + n_dir * 0.3, 3.0)

    n_btl = sum(1 for k in BATTLE_KEYWORDS if k in tl)
    battle = min(n_btl * 0.4, 3.5)

    n_refl = sum(1 for p in _REFL_RES if p.search(tl))
    padded = f" {tl} "
    n_fp = sum(1 for p in FIRST_PERSON if f" {p} " in padded)
    reflection = n_refl * 0.35 + n_fp * 0.2

    return [dialogue, action, description, travel, battle, reflection]


def classify(text: str) -> dict:
    """classify_passage (classifier.py:85-136) → dict of output columns."""
    s = scores_of(text)
    # stable sort desc == max with insertion-order tie-break
    order = sorted(range(6), key=lambda i: -s[i])
    p_i, s_i = order[0], order[1]
    primary_score, secondary_score = s[p_i], s[s_i]
    total = s[0] + s[1] + s[2] + s[3] + s[4] + s[5]
    confidence = primary_score / total if total > 0 else 0.0
    primary = TYPE_ORDER[p_i]
    if primary_score < 0.5:
        primary = "unknown"
        confidence = 0.0
    return {
        "unit_type": primary,
        "confidence": round(min(1.0, confidence), 6),
        "secondary_type": (TYPE_ORDER[s_i] if secondary_score > 0.3
                           else "none"),
        "dialogue_score": round(s[0], 6),
        "action_score": round(s[1], 6),
        "description_score": round(s[2], 6),
        "travel_score": round(s[3], 6),
        "battle_score": round(s[4], 6),
    }


_SCORE_COLS = ["unit_type", "confidence", "secondary_type",
               "dialogue_score", "action_score", "description_score",
               "travel_score", "battle_score"]


def classify_batch(t: pa.Table) -> pa.Table:
    has_repo = "repo" in t.schema.names
    repos = t["repo"].to_pylist() if has_repo else [None] * t.num_rows
    rows: list[dict] = []
    for uid, lang, text, repo in zip(t["unit_id"].to_pylist(),
                                     t["lang"].to_pylist(),
                                     t["text"].to_pylist(), repos):
        if lang != "txt":
            continue
        r = classify(text)
        r["unit_id"] = uid
        if has_repo:
            r["repo"] = repo
        rows.append(r)
    cols = ["unit_id"] + (["repo"] if has_repo else []) + _SCORE_COLS
    typ = {c: (pa.float64() if c.endswith(("score", "confidence"))
               else pa.string()) for c in cols}
    return pa.table({c: pa.array([r[c] for r in rows], typ[c])
                     for c in cols})
