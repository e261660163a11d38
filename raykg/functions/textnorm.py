"""Pure scalar/vector text functions shared across stages.

Transpositions of the reference's string helpers (see SURVEY.md §2.8):
normalization (``extract/resolver.py:78``), article strip
(``extract/resolver.py:85-89``), possessive strip (``extract/resolver.py:219-220``),
slugify (``extract/dynamic_resolver.py:156-160`` minus the order-dependent
counter), fuzzy ratio (rapidfuzz ``fuzz.ratio`` equivalent, used at
``extract/resolver.py:91-106``), syllable heuristic (``style/metrics.py:363-387``).

All functions are deterministic and dependency-free so they can be used in
unit tests, inside ``map_batches`` workers, and mirrored in oracle SQL.
"""

from __future__ import annotations

import hashlib
import re

_WS_RE = re.compile(r"\s+")
_SLUG_BAD_RE = re.compile(r"[^a-z0-9_]")
_ARTICLES = ("the ", "a ", "an ")


def normalize_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces and strip."""
    return _WS_RE.sub(" ", text).strip()


def strip_possessive(text: str) -> str:
    """Remove trailing ``'s`` / ``’s`` possessive (resolver.py:219-220)."""
    for suf in ("'s", "’s"):
        if text.endswith(suf):
            return text[: -len(suf)]
    return text


def strip_article(text: str) -> str:
    """Remove a leading article if present (resolver.py:85-89). Lower-case input."""
    for art in _ARTICLES:
        if text.startswith(art):
            return text[len(art):]
    return text


def norm_key(text: str) -> str:
    """Canonical lookup key: collapse ws, lowercase, strip possessive."""
    return strip_possessive(normalize_ws(text).lower())


def slugify(name: str) -> str:
    """Deterministic entity id: lower, spaces→_, strip non-[a-z0-9_].

    Unlike the reference (which appends ``len(self.clusters)``,
    dynamic_resolver.py:160), this is stable under any parallelism.
    """
    s = normalize_ws(name).lower().replace(" ", "_")
    return _SLUG_BAD_RE.sub("", s)


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def fuzzy_ratio(a: str, b: str) -> float:
    """Indel-normalized similarity in [0,100], rapidfuzz ``fuzz.ratio`` semantics:
    ``100 * (1 - indel_distance / (len(a)+len(b)))`` where
    ``indel_distance = len(a)+len(b) - 2*LCS(a,b)``.
    """
    if a == b:
        return 100.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    # LCS length via DP over the shorter string (strings here are short names).
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    lcs = prev[lb]
    return 100.0 * (2.0 * lcs) / (la + lb)


_VOWELS = set("aeiouy")


def count_syllables(word: str) -> int:
    """Heuristic syllable count (style/metrics.py:363-387 analog):
    count vowel groups; subtract a trailing silent 'e'; minimum 1.
    """
    w = word.lower()
    if not w:
        return 0
    groups = 0
    prev_v = False
    for ch in w:
        v = ch in _VOWELS
        if v and not prev_v:
            groups += 1
        prev_v = v
    if w.endswith("e") and not w.endswith("le") and groups > 1:
        groups -= 1
    return max(1, groups)


def char_ngrams(text: str, n: int = 3) -> set[str]:
    """Character n-gram shingles of a normalized string (candidate generation
    for fuzzy linking — MinHash/Jaccard path, SURVEY.md J2)."""
    t = normalize_ws(text).lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
