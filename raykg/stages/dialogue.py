"""Dialogue branch: quoted-span extraction + speaker attribution —
reference-EXACT regex tiers (parity vs the reference code run in-process
on real prose is pinned by tests/test_ref_parity.py).

Reference semantics (``voice/dialogue.py``):

* span extraction   — ``voice/dialogue.py:148-170`` (M11): the reference
  DEFINES six quote patterns (:148-156) but its scan loop covers only
  ``quote_patterns[:2]`` (:162, "Focus on double quotes") — straight and
  curly DOUBLE quotes, stripped, >1 char, merged and ordered by
  position.  The default path here reproduces that byte-exactly; the
  extended tiers 3-6 (straight/curly single + two mojibake shapes) are
  available via :func:`extract_quotes_all` with double-quote preference.
* context windows   — ``voice/dialogue.py:176-181``: 100 chars either
  side, stripped; tier-4 looks at only 30 chars.
* speaker attribution — ``voice/dialogue.py:221-316`` (M12) 4 tiers:
  (1) ``"..."[,.] VERB Name [Name]`` in after-context, IGNORECASE,
  conf 0.9; (2) ``Name [Name] VERB[,.]$`` in before-context, IGNORECASE,
  conf 0.9; (3) ``VERB Name`` anywhere in after-context, conf 0.7;
  (4) first capitalized non-blocklist token in after[:30] conf 0.4, else
  last in before[-30:] conf 0.3 (tier recorded as 5); else UNKNOWN.
  IGNORECASE admits lowercase "speakers" like "the hobbit" in tiers 1-3 —
  deliberate reference behavior.
* voice profile     — ``voice/profile.py:65-208`` (A12): per-speaker
  aggregates, speakers with ≥ ``MIN_LINES`` lines
  (``voice/analyzer.py:147-150`` min_lines_for_profile=3).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from raykg import vocab

# ALL SIX quote-pattern strings the reference DEFINES
# (voice/dialogue.py:148-156): straight double, curly double, straight
# single, curly single, and two mangled-double-encoding ("mojibake")
# shapes.  NOTE the reference's own scan loop covers only
# ``quote_patterns[:2]`` (voice/dialogue.py:162, "# Focus on double
# quotes") — the default path here mirrors that runtime behavior exactly
# (parity pinned by tests/test_ref_parity.py); the extended tiers 3-6 run
# via :func:`extract_quotes_all` / :func:`spans_batch_all` with the
# double-quote preference the reference's comment declares.
QUOTE_PATTERNS_ALL: tuple[str, ...] = (
    r'"([^"]+)"',                            # 1 straight double
    "“([^”]+)”",              # 2 curly double
    r"'([^']+)'",                            # 3 straight single (apostrophes!)
    "‘([^’]+)’",              # 4 curly single
    "\xe2\x80\x9c([^\xe2]+)\xe2\x80\x9d",    # 5 mojibake, raw-byte chars
    "â€œ([^â]+)â€",                          # 6 mojibake, decoded chars
)
# the reference's runtime scan (quote_patterns[:2]) — the default here
QUOTE_PATTERNS: tuple[str, ...] = QUOTE_PATTERNS_ALL[:2]
MIN_LINES = 3
CONTEXT_CHARS = 100        # voice/dialogue.py:176-177
TIER4_WINDOW = 30          # voice/dialogue.py:299,308

_QUOTE_RES = tuple(re.compile(p) for p in QUOTE_PATTERNS)
_QUOTE_RES_ALL = tuple(re.compile(p) for p in QUOTE_PATTERNS_ALL)
_SPEECH = "|".join(vocab.SPEECH_VERBS)     # longest-first, deterministic
_T1_RE = re.compile(r"^[,.]?\s*(" + _SPEECH +
                    r")\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)", re.IGNORECASE)
_T2_RE = re.compile(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)\s+(" + _SPEECH +
                    r")[,.]?\s*$", re.IGNORECASE)
_T3_RE = re.compile(r"(" + _SPEECH + r")\s+([A-Z][a-z]+)", re.IGNORECASE)
_NAME_RE = re.compile(r"\b([A-Z][a-z]+)\b")
_NON_NAMES = vocab.DIALOGUE_NON_NAMES


def extract_quotes(text: str) -> list[tuple[str, int, int]]:
    """All straight+curly double-quoted spans, stripped, len > 1, merged
    and sorted by start (voice/dialogue.py:155-170)."""
    quotes = []
    for rx in _QUOTE_RES:
        for m in rx.finditer(text):
            qt = m.group(1).strip()
            if len(qt) > 1:
                quotes.append((qt, m.start(), m.end()))
    quotes.sort(key=lambda q: q[1])
    return quotes


def extract_quotes_all(text: str) -> list[tuple[str, int, int, int]]:
    """Extended extraction over ALL SIX reference quote patterns
    (voice/dialogue.py:148-156) with the double-quote preference the
    reference's comment declares ("Combine patterns, prefer double
    quotes"): the double-quote tiers 1-2 are scanned first, and the
    single-quote / mojibake tiers 3-6 run ONLY on units where neither
    double-quote pattern matches at all (raw ``search``, pre-strip — the
    same unit-level gate the SQL oracle applies).  The unit-level gate
    keeps the apostrophe-hazard of pattern 3 (the reference's own
    "be careful - apostrophes" note) away from prose that already has
    attributed double-quoted dialogue.  Within tiers 3-6, pattern order
    is priority order: a match overlapping an earlier-kept span is
    dropped.  Returns (quote_text, start, end, quote_tier) sorted by
    start; quote_tier is the 1-based pattern index."""
    if any(rx.search(text) for rx in _QUOTE_RES):
        return [(qt, s, e, 1 if text[s] == '"' else 2)
                for qt, s, e in extract_quotes(text)]
    quotes: list[tuple[str, int, int, int]] = []
    for tier, rx in enumerate(_QUOTE_RES_ALL[2:], start=3):
        for m in rx.finditer(text):
            qt = m.group(1).strip()
            if len(qt) > 1 and not any(
                    m.start() < e and m.end() > s
                    for _, s, e, _ in quotes):
                quotes.append((qt, m.start(), m.end(), tier))
    quotes.sort(key=lambda q: q[1])
    return quotes


def attribute_speaker(text: str, start: int, end: int
                      ) -> tuple[str, str, float, int]:
    """Reference _attribute_speaker (voice/dialogue.py:221-316).
    Returns (speaker, speech_verb, confidence, tier); tier 5 = the
    before-context half of the reference's tier 4."""
    before = text[max(0, start - CONTEXT_CHARS): start].strip()
    after = text[end: end + CONTEXT_CHARS].strip()
    m = _T1_RE.search(after)
    if m:
        return m.group(2), m.group(1).lower(), 0.9, 1
    m = _T2_RE.search(before)
    if m:
        return m.group(1), m.group(2).lower(), 0.9, 2
    m = _T3_RE.search(after)
    if m:
        return m.group(2), m.group(1).lower(), 0.7, 3
    after_names = [n for n in _NAME_RE.findall(after[:TIER4_WINDOW])
                   if n.lower() not in _NON_NAMES and len(n) > 1]
    if after_names:
        return after_names[0], "", 0.4, 4
    before_names = [n for n in _NAME_RE.findall(before[-TIER4_WINDOW:])
                    if n.lower() not in _NON_NAMES and len(n) > 1]
    if before_names:
        return before_names[-1], "", 0.3, 5
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
        for pos, (content, start, end) in enumerate(extract_quotes(text)):
            speaker, verb, conf, tier = attribute_speaker(text, start, end)
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


def spans_batch_all(t: pa.Table) -> pa.Table:
    """:func:`spans_batch` over the EXTENDED six-tier quote extraction
    (:func:`extract_quotes_all`); adds a ``quote_tier`` column (1-based
    reference pattern index, voice/dialogue.py:148-156)."""
    import pyarrow.compute as pc
    t = t.filter(pc.equal(t["lang"], "txt"))
    out = {k: [] for k in ("unit_id", "quote_text", "quote_tier",
                           "speaker", "speech_verb", "position",
                           "is_question", "is_exclamation",
                           "attribution_conf", "attribution_tier")}
    for uid, text in zip(t["unit_id"].to_pylist(), t["text"].to_pylist()):
        for pos, (content, start, end, qtier) in enumerate(
                extract_quotes_all(text)):
            speaker, verb, conf, tier = attribute_speaker(text, start, end)
            out["unit_id"].append(uid)
            out["quote_text"].append(content)
            out["quote_tier"].append(qtier)
            out["speaker"].append(speaker)
            out["speech_verb"].append(verb)
            out["position"].append(pos)
            out["is_question"].append(content.endswith("?"))
            out["is_exclamation"].append(content.endswith("!"))
            out["attribution_conf"].append(conf)
            out["attribution_tier"].append(tier)
    return pa.table({
        "unit_id": pa.array(out["unit_id"], pa.string()),
        "quote_text": pa.array(out["quote_text"], pa.string()),
        "quote_tier": pa.array(out["quote_tier"], pa.int64()),
        "speaker": pa.array(out["speaker"], pa.string()),
        "speech_verb": pa.array(out["speech_verb"], pa.string()),
        "position": pa.array(out["position"], pa.int64()),
        "is_question": pa.array(out["is_question"], pa.bool_()),
        "is_exclamation": pa.array(out["is_exclamation"], pa.bool_()),
        "attribution_conf": pa.array(out["attribution_conf"], pa.float64()),
        "attribution_tier": pa.array(out["attribution_tier"], pa.int64()),
    })


_PROFILE_COLS = (
    "speaker", "n_lines", "question_ratio", "exclamation_ratio",
    "statement_ratio", "mean_quote_words", "n_units", "total_words",
    "total_chars", "avg_utterance_length", "utterance_length_std",
    "min_utterance_length", "max_utterance_length", "unique_words",
    "type_token_ratio", "avg_word_length", "contraction_ratio",
    "first_person_ratio", "second_person_ratio", "archaism_count")

_LEN_STRIP = '.,!?"\'-'
_PERSON_STRIP = '.,!?"\''


def voice_profile_group(g: pd.DataFrame) -> pd.DataFrame:
    """A12 per-speaker profile (≥ MIN_LINES lines) — the reference's full
    aggregate set (voice/profile.py:65-208): utterance-length stats,
    question/exclamation/statement classification (elif-cascade: a '?!'
    quote counts as question only), vocabulary (TTR, avg stripped word
    length), formality ratios (contractions / first / second person) and
    archaism count over the reference's own archaism list."""
    import statistics
    n = len(g)
    if n < MIN_LINES:
        return pd.DataFrame({c: [] for c in _PROFILE_COLS})
    wc = g["quote_text"].str.count(r"[A-Za-z]+")
    lengths, word_lens = [], []
    counts: dict[str, int] = {}
    total_chars = contractions = first = second = 0
    questions = exclamations = 0
    arch_found: set[str] = set()
    for text, is_q, is_e in zip(g["quote_text"], g["is_question"],
                                g["is_exclamation"]):
        total_chars += len(text)
        words = text.lower().split()
        lengths.append(len(words))
        if is_q:
            questions += 1
        elif is_e:
            exclamations += 1
        for w in words:
            counts[w] = counts.get(w, 0) + 1
            word_lens.append(len(w.strip(_LEN_STRIP)))
            wl = w.strip(_PERSON_STRIP)
            if wl in vocab.FIRST_PERSON_WORDS:
                first += 1
            if wl in vocab.SECOND_PERSON_WORDS:
                second += 1
            for pat in vocab.CONTRACTION_PATTERNS:
                if pat in w:
                    contractions += 1
                    break
            if wl in vocab.VOICE_ARCHAISMS:
                arch_found.add(wl)
    total_words = sum(lengths)
    uniq = len(counts)
    # reference quirk: archaisms_found holds STRIPPED forms but the count
    # looks them up in the RAW word counter (voice/profile.py:203-204)
    arch_count = sum(counts.get(a, 0) for a in arch_found)
    return pd.DataFrame({
        "speaker": [g["speaker"].iloc[0]],
        "n_lines": [n],
        "question_ratio": [round(questions / n, 6)],
        "exclamation_ratio": [round(exclamations / n, 6)],
        "statement_ratio": [round((n - questions - exclamations) / n, 6)],
        "mean_quote_words": [round(float(wc.mean()), 6)],
        "n_units": [g["unit_id"].nunique()],
        "total_words": [total_words],
        "total_chars": [total_chars],
        "avg_utterance_length": [round(statistics.mean(lengths), 6)],
        "utterance_length_std": [
            round(statistics.stdev(lengths), 6) if n > 1 else 0.0],
        "min_utterance_length": [min(lengths)],
        "max_utterance_length": [max(lengths)],
        "unique_words": [uniq],
        "type_token_ratio": [
            round(uniq / total_words, 6) if total_words else 0.0],
        "avg_word_length": [
            round(statistics.mean(word_lens), 6) if word_lens else 0.0],
        "contraction_ratio": [
            round(contractions / total_words, 6) if total_words else 0.0],
        "first_person_ratio": [
            round(first / total_words, 6) if total_words else 0.0],
        "second_person_ratio": [
            round(second / total_words, 6) if total_words else 0.0],
        "archaism_count": [arch_count],
    })
