"""Style branch: per-unit metrics → grouped Distribution / fingerprint.

Transposed reference semantics:

* per-sentence metrics      — ``style/metrics.py:124-188`` (M14, regex
  subset: no dependency parser in the deterministic path)
* ``Distribution``          — ``style/metrics.py:44-74`` (A7) EXACTLY:
  sample stdev (n>1 else 0), interpolated median, index-based
  ``sorted[n//4]`` / ``sorted[3n//4]`` percentiles
* readability               — ``style/metrics.py:311-360`` (M15): Flesch /
  Flesch-Kincaid / Gunning-Fog from ASL + syllable heuristic, rounded to 2
* vocabulary profile        — ``style/metrics.py:233-308`` (A8): TTR, hapax,
  archaism density — computed two-phase (per-batch partial word counts →
  groupby(repo,word) → per-repo scalar aggregate)

All formulas are mirrored in the DuckDB oracle SQL
(``raykg/pipelines/queries.py``); floats are rounded to 6 decimals (2 for
readability, as the reference does) on both sides.
"""

from __future__ import annotations

import re
import statistics

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg import vocab
from raykg.functions.textnorm import count_syllables

WORD_PATTERN = r"[A-Za-z]+"
PUNCT_PATTERN = r"[.,;:!?]"
LONG_WORD_LEN = 6

_WORD_RE = re.compile(WORD_PATTERN)
_PUNCT_RE = re.compile(PUNCT_PATTERN)
_ARCH = frozenset(vocab.ARCHAISMS)


class StyleMetrics:
    """M14 per-unit metrics as a STATEFUL ACTOR-POOL stage (ST1): the
    per-language POS lexicon model (raykg/models/pos.py) is deserialized
    and indexed ONCE per actor in ``__init__``; ``__call__`` only tags.
    Pass the class to ``map_batches(StyleMetrics, concurrency=(a, b))`` —
    the reference builds its spaCy pipeline once per process the same way
    (``extract/ner.py:64-76``).

    Adds the model-tier columns the regex path could not produce
    (reference ``style/metrics.py:124-230``): noun/verb/adj/adv counts,
    clause_depth (subordinate-marker analog), voice
    (active/passive/mixed via the be+participle analog)."""

    #: incremented per instantiation — tests assert once-per-actor init
    init_count = 0

    def __init__(self):
        from raykg.models.pos import PosTagger
        type(self).init_count += 1
        # per-language registry; prose is 'txt' → English model
        self.taggers = {"txt": PosTagger("en")}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["lang"], "txt"))
        tagger = self.taggers["txt"]
        texts = t["text"].to_pylist()
        out = {k: [] for k in (
            "word_count", "char_count", "punct_count", "is_question",
            "is_exclamation", "is_dialogue", "long_word_count",
            "syllable_count", "complex_word_count", "archaism_count",
            "noun_count", "verb_count", "adj_count", "adv_count",
            "clause_depth", "voice")}
        for text in texts:
            words = _WORD_RE.findall(text)
            lower = [w.lower() for w in words]
            syls = [count_syllables(w) for w in lower]
            feats = tagger.sentence_features(text, lower)
            out["word_count"].append(len(words))
            out["char_count"].append(len(text))
            out["punct_count"].append(len(_PUNCT_RE.findall(text)))
            out["is_question"].append("?" in text)
            out["is_exclamation"].append("!" in text)
            out["is_dialogue"].append('"' in text)
            out["long_word_count"].append(
                sum(1 for w in words if len(w) > LONG_WORD_LEN))
            out["syllable_count"].append(sum(syls))
            out["complex_word_count"].append(sum(1 for s in syls if s >= 3))
            out["archaism_count"].append(
                sum(1 for w in lower if w in _ARCH))
            for k in ("noun_count", "verb_count", "adj_count", "adv_count",
                      "clause_depth"):
                out[k].append(feats[k])
            out["voice"].append(feats["voice"])
        return pa.table({
            "unit_id": t["unit_id"],
            "doc_sha256": t["doc_sha256"],
            "repo": t["repo"],
            **{k: pa.array(
                v, pa.bool_() if k.startswith("is_")
                else pa.string() if k == "voice" else pa.int64())
               for k, v in out.items()},
        })


_METRICS_SINGLETON: list = []


def unit_metrics_batch(t: pa.Table) -> pa.Table:
    """Task-path wrapper: per-worker-process singleton of StyleMetrics
    (model loads once per worker even without an actor pool)."""
    if not _METRICS_SINGLETON:
        _METRICS_SINGLETON.append(StyleMetrics())
    return _METRICS_SINGLETON[0](t)


def distribution(values: list[float]) -> dict:
    """Reference ``Distribution.from_values`` (metrics.py:56-74) verbatim
    semantics; floats rounded to 6."""
    if not values:
        return {"n": 0, "mean": 0.0, "std": 0.0, "min": 0, "max": 0,
                "median": 0.0, "p25": 0, "p75": 0}
    sv = sorted(values)
    n = len(sv)
    return {
        "n": n,
        "mean": round(float(statistics.mean(values)), 6),
        "std": round(float(statistics.stdev(values)), 6) if n > 1 else 0.0,
        "min": int(min(values)),
        "max": int(max(values)),
        "median": round(float(statistics.median(values)), 6),
        "p25": int(sv[n // 4] if n >= 4 else sv[0]),
        "p75": int(sv[3 * n // 4] if n >= 4 else sv[-1]),
    }


def distribution_group(g: pd.DataFrame, value_col: str = "word_count"
                       ) -> pd.DataFrame:
    d = distribution(g[value_col].tolist())
    return pd.DataFrame({"repo": [g["repo"].iloc[0]],
                         **{k: [v] for k, v in d.items()}})


def readability_group(g: pd.DataFrame) -> pd.DataFrame:
    """M15 per-repo readability (metrics.py:311-360 formulas, round 2)."""
    n_units = len(g)
    total_words = int(g["word_count"].sum())
    total_syll = int(g["syllable_count"].sum())
    complex_w = int(g["complex_word_count"].sum())
    if n_units == 0 or total_words == 0:
        fre = fkg = fog = 0.0
    else:
        asl = total_words / n_units
        asw = total_syll / total_words
        fre = round(206.835 - 1.015 * asl - 84.6 * asw, 2)
        fkg = round(0.39 * asl + 11.8 * asw - 15.59, 2)
        fog = round(0.4 * (asl + complex_w / total_words * 100), 2)
    return pd.DataFrame({
        "repo": [g["repo"].iloc[0]], "n_units": [n_units],
        "total_words": [total_words],
        "flesch_reading_ease": [fre], "flesch_kincaid_grade": [fkg],
        "gunning_fog": [fog]})


def word_counts_batch(t: pa.Table) -> pd.DataFrame:
    """Partial (repo, word) counts per batch — the combiner before the
    groupby shuffle (A8 two-phase).  ``cap_cnt`` counts initial-capital
    occurrences (the PROPN-exclusion analog for the unknown-word list —
    a word that EVER appears capitalized is treated as a proper noun)."""
    import pyarrow.compute as pc
    t = t.filter(pc.equal(t["lang"], "txt"))
    repos = t["repo"].to_pylist()
    texts = t["text"].to_pylist()
    counts: dict[tuple[str, str], int] = {}
    caps: dict[tuple[str, str], int] = {}
    for repo, text in zip(repos, texts):
        for w in _WORD_RE.findall(text):
            key = (repo, w.lower())
            counts[key] = counts.get(key, 0) + 1
            if w[0].isupper():
                caps[key] = caps.get(key, 0) + 1
    if not counts:
        return pd.DataFrame({"repo": pd.Series([], dtype=str),
                             "word": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype="int64"),
                             "cap_cnt": pd.Series([], dtype="int64")})
    ks = list(counts)
    return pd.DataFrame({"repo": [k[0] for k in ks],
                         "word": [k[1] for k in ks],
                         "cnt": [counts[k] for k in ks],
                         "cap_cnt": [caps.get(k, 0) for k in ks]})


def vocab_profile_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-repo vocabulary profile from merged (word, cnt) rows (A8)."""
    total = int(g["cnt"].sum())
    n_distinct = len(g)
    n_hapax = int((g["cnt"] == 1).sum())
    arch = int(g.loc[g["word"].isin(_ARCH), "cnt"].sum())
    return pd.DataFrame({
        "repo": [g["repo"].iloc[0]],
        "n_tokens": [total], "n_distinct": [n_distinct],
        "n_hapax": [n_hapax],
        "ttr": [round(n_distinct / total, 6) if total else 0.0],
        "hapax_ratio": [round(n_hapax / n_distinct, 6) if n_distinct else 0.0],
        "archaism_per_1000": [round(arch / total * 1000, 6) if total else 0.0],
    })


def fingerprint_ratios_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-repo fingerprint ratios — the reference's full A9 ratio set
    (style/fingerprint.py:122-135): dialogue / question / exclamation /
    passive-voice ratios over units, POS ratios over total words."""
    n = len(g)
    tw = int(g["word_count"].sum()) or 1
    return pd.DataFrame({
        "repo": [g["repo"].iloc[0]], "n_units": [n],
        "dialogue_ratio": [round(float(g["is_dialogue"].sum()) / n, 6)],
        "question_ratio": [round(float(g["is_question"].sum()) / n, 6)],
        "exclamation_ratio": [round(float(g["is_exclamation"].sum()) / n, 6)],
        "passive_voice_ratio": [round(
            float((g["voice"] == "passive").sum()) / n, 6)],
        "mean_word_count": [round(float(g["word_count"].mean()), 6)],
        "noun_ratio": [round(float(g["noun_count"].sum()) / tw, 6)],
        "verb_ratio": [round(float(g["verb_count"].sum()) / tw, 6)],
        "adjective_ratio": [round(float(g["adj_count"].sum()) / tw, 6)],
        "adverb_ratio": [round(float(g["adv_count"].sum()) / tw, 6)],
        "mean_clause_depth": [round(float(g["clause_depth"].mean()), 6)],
    })


def zscores_group(g: pd.DataFrame) -> pd.DataFrame:
    """A9 function-word z-score map — the reference computes z-scores of a
    repo's function-word frequencies against the repo's OWN mean/std over
    those frequencies (style/fingerprint.py:141-153).  Input: merged
    (repo, word, cnt) rows for ONE repo (all words; total = sum)."""
    import numpy as np
    total = int(g["cnt"].sum())
    fw = g.set_index("word")["cnt"]
    freqs = np.array([fw.get(w, 0) / total if total else 0.0
                      for w in vocab.FUNCTION_WORDS], dtype=float)
    mean = float(freqs.mean())
    std = float(freqs.std(ddof=1)) if len(freqs) > 1 else 1.0
    std = std if std > 0 else 1.0
    return pd.DataFrame({
        "repo": g["repo"].iloc[0],
        "word": list(vocab.FUNCTION_WORDS),
        "zscore": np.round((freqs - mean) / std, 6),
    })
