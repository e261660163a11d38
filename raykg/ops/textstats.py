"""Text-analysis ops over the ``documents`` table (training-data pipeline
components): token counting, quality scoring, language-ID, fingerprinting.

All semantics are deliberately SQL-expressible so the DuckDB oracle can
verify them exactly (md5-based fingerprints, regex token counts,
marker-word language scores with deterministic tie-breaks).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from raykg import vocab

WS_TOKEN_PATTERN = r"\S+"
WORD_PATTERN = r"[A-Za-z]+"
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
SHINGLE_K = 5

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "was", "with"),
    "de": ("der", "und", "die", "das", "nicht"),
    "es": ("el", "la", "los", "que", "con"),
    "fr": ("le", "les", "des", "est", "pas"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

_WS_RE = re.compile(WS_TOKEN_PATTERN)
_WORD_RE = re.compile(WORD_PATTERN)
_BPE_RE = re.compile(BPE_PATTERN)
_STOP = vocab.STOPWORDS


def token_counts_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    ws, words, bpe = [], [], []
    for x in texts:
        ws.append(len(_WS_RE.findall(x)))
        words.append(len(_WORD_RE.findall(x)))
        bpe.append(len(_BPE_RE.findall(x)))
    return pa.table({
        "doc_id": t["doc_id"],
        "n_ws_tokens": pa.array(ws, pa.int64()),
        "n_words": pa.array(words, pa.int64()),
        "n_bpe_tokens": pa.array(bpe, pa.int64()),
    })


def quality_batch(t: pa.Table) -> pa.Table:
    """Quality score = 0.4·min(1, words/100) + 0.3·stopword_ratio +
    0.3·alpha_char_ratio (length/stopword/character heuristics)."""
    texts = t["text"].to_pylist()
    cols = {"n_chars": [], "n_words": [], "stopword_ratio": [],
            "alpha_ratio": [], "quality_score": []}
    alpha_re = re.compile(r"[A-Za-z]")
    for x in texts:
        words = _WORD_RE.findall(x)
        n_w = len(words)
        n_stop = sum(1 for w in words if w.lower() in _STOP)
        n_alpha = len(alpha_re.findall(x))
        # NO rounding: the identical IEEE expression runs in the SQL oracle,
        # so raw doubles match bit-for-bit (rounding would introduce
        # half-even-vs-half-away boundary mismatches)
        sr = n_stop / n_w if n_w else 0.0
        ar = n_alpha / len(x) if x else 0.0
        score = 0.4 * min(1.0, n_w / 100.0) + 0.3 * sr + 0.3 * ar
        cols["n_chars"].append(len(x))
        cols["n_words"].append(n_w)
        cols["stopword_ratio"].append(sr)
        cols["alpha_ratio"].append(ar)
        cols["quality_score"].append(score)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_chars": pa.array(cols["n_chars"], pa.int64()),
        "n_words": pa.array(cols["n_words"], pa.int64()),
        "stopword_ratio": pa.array(cols["stopword_ratio"], pa.float64()),
        "alpha_ratio": pa.array(cols["alpha_ratio"], pa.float64()),
        "quality_score": pa.array(cols["quality_score"], pa.float64()),
    })


def langid_batch(t: pa.Table) -> pa.Table:
    """Marker-word language ID: argmax marker hits, ties → lexicographically
    smallest language code (deterministic n-gram-heuristic analog)."""
    texts = t["text"].to_pylist()
    preds, scores = [], []
    langs = sorted(LANG_MARKERS)
    marker_sets = {lg: frozenset(LANG_MARKERS[lg]) for lg in langs}
    for x in texts:
        words = [w.lower() for w in _WORD_RE.findall(x)]
        best_lang, best = langs[0], -1
        for lg in langs:
            s = sum(1 for w in words if w in marker_sets[lg])
            if s > best:
                best, best_lang = s, lg
        preds.append(best_lang)
        scores.append(best)
    return pa.table({
        "doc_id": t["doc_id"],
        "pred_lang": pa.array(preds, pa.string()),
        "marker_hits": pa.array(scores, pa.int64()),
    })


def curation_features_batch(t: pa.Table) -> pa.Table:
    """ONE vectorized pass computing every per-doc curation feature the
    corpus_curation pipeline filters on: quality score, marker-word
    language ID, BPE-ish token count, exact md5 fingerprint.  Composes
    the four single-purpose kernels on the same in-memory batch — no
    joins, no re-reads."""
    q = quality_batch(t)
    lg = langid_batch(t)
    tok = token_counts_batch(t)
    fp = fingerprint_batch(t)
    return pa.table({
        "doc_id": t["doc_id"],
        "quality_score": q["quality_score"],
        "pred_lang": lg["pred_lang"],
        "n_bpe_tokens": tok["n_bpe_tokens"],
        "text_md5": fp["text_md5"],
    })


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact) + min-hash over word SHINGLE_K-shingles (winnowing-style)."""
    texts = t["text"].to_pylist()
    exact, shingle_min = [], []
    for x in texts:
        norm = re.sub(r"\s+", " ", x.lower()).strip()
        exact.append(hashlib.md5(norm.encode()).hexdigest())
        words = norm.split(" ")
        if len(words) >= SHINGLE_K:
            mins = min(hashlib.md5(
                " ".join(words[i:i + SHINGLE_K]).encode()).hexdigest()
                for i in range(len(words) - SHINGLE_K + 1))
        else:
            mins = exact[-1]
        shingle_min.append(mins)
    return pa.table({
        "doc_id": t["doc_id"],
        "text_md5": pa.array(exact, pa.string()),
        "min_shingle_md5": pa.array(shingle_min, pa.string()),
    })
