"""Claim parsing + validation against the materialized KG (query side) —
the reference's full pattern-tier parse ladder and checker routing.

Parser (``lore/parser.py:136-250``, pattern path — the LLM fallback is
replaced by one deterministic rule, noted below):

  negation / uncertainty flags → temporal marker (tentative TEMPORAL) →
  event-order simple pattern → relationship-verb loop → "is a/an" ENTITY
  → "is/was X" ATTRIBUTE → "is in/at/near" LOCATION → "can X" CAPABILITY.

Reference quirks preserved deliberately:
  * the ATTRIBUTE pattern ``is/was (\\w+)`` fires on "X is in Y" before the
    LOCATION pattern can — LOCATION is unreachable in the pattern path
    (parser.py:225-238); we keep the dead branch and pin it in tests.
  * the event-order simple pattern copies event1's action/patient onto
    event2 (parser.py:186-199).
  * the relationship object/capability value group ``(\\w+(?:\\s+\\w+)?)``
    greedily eats following function words ("wield the").

Deterministic LLM-parse analog: a TEMPORAL claim takes its subject from
the leading capitalized token (the reference only gets temporal subjects
via its LLM parse, parser.py:262-310).

Checker routing (``lore/checker.py:255-296``) — statuses use the
reference's ValidationStatus vocabulary:
  ENTITY_EXISTS → nodes lookup + substring type check (checker.py:310-350)
  RELATIONSHIP  → triples lookup; found+negated → INVALID; absence is
                  UNKNOWN, never INVALID (checker.py:391-421)
  TEMPORAL      → events for the subject in the claimed era → VALID 0.9;
                  subject only in other eras → INVALID 0.9 (checker.py:634)
  CAPABILITY    → rule-shaped sentences containing subject+value →
                  PLAUSIBLE 0.6 (checker.py:712-730)
  ATTRIBUTE     → rule-shaped sentences containing subject+value →
                  VALID 0.7 (the _check_against_rules analog,
                  checker.py:894-918)
  EVENT_ORDER   → first matching deduped event per side, (era, year)
                  compare vs the claimed ordering (checker.py:736-813)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from raykg import vocab

# --- claim types (lore/parser.py:15-25) ---
ENTITY_EXISTS = "entity_exists"
RELATIONSHIP = "relationship"
ATTRIBUTE = "attribute"
TEMPORAL = "temporal"
LOCATION = "location"
CAPABILITY = "capability"
EVENT_ORDER = "event_order"
UNKNOWN_TYPE = "unknown"

# --- statuses (lore/checker.py:59-66) ---
VALID = "VALID"
INVALID = "INVALID"
PLAUSIBLE = "PLAUSIBLE"
UNKNOWN = "UNKNOWN"

TIME_PERIODS = tuple(f"{e} Age" for e in vocab.ERAS)

_VERB_ALT = "|".join(re.escape(v) for v in vocab.VERB_PHRASES_ORDERED)
_TIME_RE = re.compile(
    r"(?:in|during|of)\s+(?:the\s+)?(" +
    "|".join(re.escape(t) for t in TIME_PERIODS) + r")", re.IGNORECASE)
_NEG_RE = re.compile(
    r"\b(not|never|didn't|did not|wasn't|was not|isn't|is not|aren't|"
    r"are not)\b", re.IGNORECASE)
_UNC_RE = re.compile(
    r"\b(might|may|possibly|perhaps|probably|could have|might have)\b",
    re.IGNORECASE)
_EVENT_ORDER_RE = re.compile(
    r"([A-Z]\w+)\s+(" + _VERB_ALT +
    r")\s+(?:the\s+)?(\w+(?:\s+\w+)?)\s+(before|after)\s+([A-Z]\w+)",
    re.IGNORECASE)
_REL_RES = tuple(
    (v, re.compile(r"(\w+(?:\s+\w+)?)\s+" + re.escape(v) +
                   r"\s+(\w+(?:\s+\w+)?)", re.IGNORECASE))
    for v in vocab.VERB_PHRASES_ORDERED)
_ISA_RE = re.compile(r"(\w+(?:\s+\w+)?)\s+is\s+(?:a|an)\s+(\w+)",
                     re.IGNORECASE)
_ATTR_RE = re.compile(r"(\w+(?:\s+\w+)?)\s+(?:is|was)\s+(\w+)",
                      re.IGNORECASE)
_LOC_RE = re.compile(
    r"(\w+(?:\s+\w+)?)\s+is\s+(?:in|at|near)\s+(?:the\s+)?"
    r"(\w+(?:\s+\w+)?)", re.IGNORECASE)
_CAP_RE = re.compile(r"(\w+(?:\s+\w+)?)\s+can\s+(\w+(?:\s+\w+)?)",
                     re.IGNORECASE)
_LEAD_CAP_RE = re.compile(r"\b([A-Z]\w+)\b")


@dataclass
class ParsedClaim:
    text: str
    claim_type: str = UNKNOWN_TYPE
    subject: str | None = None
    predicate: str | None = None
    obj: str | None = None
    attribute: str | None = None
    value: str | None = None
    time_period: str | None = None
    ordering: str | None = None
    event1: tuple | None = None          # (agent, action, patient)
    event2: tuple | None = None
    negated: bool = False
    uncertain: bool = False


def parse_claim(text: str) -> ParsedClaim:
    """The reference pattern ladder, verbatim order."""
    c = ParsedClaim(text=text)
    c.negated = bool(_NEG_RE.search(text))
    c.uncertain = bool(_UNC_RE.search(text))
    tm = _TIME_RE.search(text)
    if tm:
        c.time_period = tm.group(1)
        c.claim_type = TEMPORAL
    m = _EVENT_ORDER_RE.search(text)
    if m:
        c.claim_type = EVENT_ORDER
        c.event1 = (m.group(1), m.group(2).lower(), m.group(3))
        c.ordering = m.group(4).lower()
        # reference quirk: event2 copies event1's action+patient
        c.event2 = (m.group(5), m.group(2).lower(), m.group(3))
        return c
    for verb, rx in _REL_RES:
        m = rx.search(text)
        if m:
            c.claim_type = RELATIONSHIP
            c.subject = m.group(1).strip()
            c.predicate = vocab.VERB_PHRASE_TO_PRED[verb]
            c.obj = m.group(2).strip()
            return c
    m = _ISA_RE.search(text)
    if m:
        c.claim_type = ENTITY_EXISTS
        c.subject = m.group(1).strip()
        c.attribute = "type"
        c.value = m.group(2).strip()
        return c
    m = _ATTR_RE.search(text)
    if m:
        c.claim_type = ATTRIBUTE
        c.subject = m.group(1).strip()
        c.attribute = "description"
        c.value = m.group(2).strip()
        return c
    m = _LOC_RE.search(text)       # unreachable after _ATTR_RE — kept to
    if m:                          # mirror the reference (parser.py:225)
        c.claim_type = LOCATION
        c.subject = m.group(1).strip()
        c.predicate = "located_in"
        c.obj = m.group(2).strip()
        return c
    m = _CAP_RE.search(text)
    if m:
        c.claim_type = CAPABILITY
        c.subject = m.group(1).strip()
        c.attribute = "capability"
        c.value = m.group(2).strip()
        return c
    if c.claim_type == TEMPORAL:
        # deterministic LLM-parse analog: leading capitalized token
        lead = _LEAD_CAP_RE.search(text)
        if lead:
            c.subject = lead.group(1)
        return c
    return c


def clamp_confidence(base: float, mention_count: int) -> float:
    """checker.py:27-56 confidence clamp: max(0.5, min(0.95, base * m))."""
    strength = min(1.0, 0.5 + 0.1 * mention_count)
    return round(max(0.5, min(0.95, base * strength)), 6)
