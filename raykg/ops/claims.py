"""Claim parsing + validation against the materialized KG (query side).

Transposes the reference's lore checker (``lore/parser.py:136-250`` claim
parsing, ``lore/checker.py:255-296`` routing, ``checker.py:27-56``
confidence clamp): a claim string is parsed into (subject, predicate,
object, negated) using the shared verb-phrase vocabulary, then validated
against the triples table — SUPPORTED / CONTRADICTED / NO_EVIDENCE with a
confidence derived from the evidence mention count.

Pure functions over pandas/broadcast state — the distributed part is the
evidence scan (``q_lore_check`` filters the triples Dataset against the
claim keys in one map_batches pass).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from raykg import vocab

_NEG_RE = re.compile(r"\b(never|not|no longer|didn't|did not)\b", re.I)
_VERB_ALT = "|".join(re.escape(v) for v in vocab.VERB_PHRASES_ORDERED)
_CLAIM_RE = re.compile(
    r"^([A-Z][\w ]*?)\s+(?:(never|not)\s+)?(" + _VERB_ALT +
    r")\s+(?:the\s+|a\s+|an\s+)?([A-Z][\w ]*?)\.?$")

SUPPORTED = "SUPPORTED"
CONTRADICTED = "CONTRADICTED"
NO_EVIDENCE = "NO_EVIDENCE"
UNPARSEABLE = "UNPARSEABLE"


@dataclass
class ParsedClaim:
    subject: str
    predicate: str
    obj: str
    negated: bool


def parse_claim(text: str) -> ParsedClaim | None:
    """lore/parser.py:136-250 analog: SVO over the closed verb vocabulary
    with negation detection."""
    m = _CLAIM_RE.match(text.strip())
    if not m:
        return None
    subject, neg, verb, obj = m.groups()
    negated = bool(neg) or bool(_NEG_RE.search(text))
    return ParsedClaim(subject.strip(),
                       vocab.VERB_PHRASE_TO_PRED[verb], obj.strip(), negated)


def clamp_confidence(base: float, mention_count: int) -> float:
    """checker.py:27-56 confidence clamp: max(0.5, min(0.95, base * m))."""
    strength = min(1.0, 0.5 + 0.1 * mention_count)
    return round(max(0.5, min(0.95, base * strength)), 6)


def verdict(found: bool, negated: bool, mention_count: int
            ) -> tuple[str, float]:
    """checker.py:255-296 routing: a found triple supports a positive
    claim and contradicts a negated one; absence is NO_EVIDENCE (the
    reference never treats absence as contradiction)."""
    if not found:
        return NO_EVIDENCE, 0.5
    status = CONTRADICTED if negated else SUPPORTED
    return status, clamp_confidence(0.95, mention_count)
