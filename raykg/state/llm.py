"""LLM tier (ST4/M7/R3/R5/J3) — the reference's LLM plumbing transposed
to an actor-pool-hostable client with deterministic test backends.

The reference runs fine WITHOUT an LLM (every LLM path degrades to [] /
a default); what belongs to the operator inventory is the STRUCTURE:

* ``LLMClient``       — provider-switchable generate() returning "" on any
  transport error (reference ``llm.py:17-164``).  The real ``ollama``
  backend shape is kept (no network in this environment — it reports
  unavailable and generate() returns ""); ``StubBackend`` is a
  deterministic in-process model for tests and offline runs.
* ``extract_json``    — the JSON salvage ladder (``llm.py:166-207``):
  markdown-fence strip → direct parse → first [...] → first {...} → None.
* ``parse_llm_entities`` — LLM NER result coercion (``extract/ner.py:
  179-260``): position find with case-insensitive fallback, label
  whitelist → UNKNOWN, conf 0.85, source 'llm'.
* ``parse_llm_relationships`` — predicate coercion to the closed
  vocabulary with RELATED_TO fallback (``extract/relationships.py:
  278-382``, esp. :353-356).
* ``parse_llm_events`` — agent/action/patient rows (``lore/events.py:
  529-619``), missing keys dropped.
* ``llm_verify_match`` — the yes/no merge verification with the
  reference's DOCUMENTED polarity asymmetry: the cross-book resolver
  defaults to True on LLM failure (``corpus/resolver.py:246-286``), the
  dynamic in-book resolver defaults to False
  (``extract/dynamic_resolver.py:266-297``).
* ``LLMEntityStage``  — the actor-pool seam: client built once per actor
  in ``__init__``; per-batch extraction; [] on every failure (the
  pipeline never stalls on a dead model server).
* ``LLMRelationshipStage`` / ``LLMEventStage`` — R3/R5 actor stages with
  the same degradation contract; events carry the reference's
  events+relations dict payload (``parse_llm_event_payload``).
* ``llm_synthesize_rules`` — A15 rule synthesis with the reference's
  pattern-path fallback on any LLM failure
  (``worldbible/extractor.py:198-300``).
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow as pa

from raykg import vocab

LLM_CONF = 0.85                  # reference ner.py:246
LLM_LABELS = ("PERSON", "PLACE", "OBJECT", "EVENT")   # ner.py:240-242


# ------------------------------------------------------------- backends

class OllamaBackend:
    """Reference transport shape (llm.py:72-101).  No network exists in
    this environment: ``available`` is False and generate returns ""."""

    def __init__(self, base_url: str = "http://localhost:11434",
                 model: str = "llama3"):
        self.base_url = base_url
        self.model = model

    @property
    def available(self) -> bool:
        return False             # no network in this environment

    def generate(self, prompt: str, temperature: float = 0.3,
                 timeout: float = 120.0) -> str:
        return ""                # transport unavailable → graceful empty


class StubBackend:
    """Deterministic in-process 'model': answers from a canned
    prompt-substring → response table (tests feed fenced / mangled JSON
    through it to exercise the salvage ladder)."""

    def __init__(self, canned: dict[str, str] | None = None):
        self.canned = canned or {}
        self.calls = 0

    @property
    def available(self) -> bool:
        return True

    def generate(self, prompt: str, temperature: float = 0.3,
                 timeout: float = 120.0) -> str:
        self.calls += 1
        for needle, resp in self.canned.items():
            if needle in prompt:
                return resp
        return ""


class DeterministicVerifyStub(StubBackend):
    """Offline deterministic 'model' for the J3 merge-verify surface
    (q_kg_merge_verify): parses the :func:`llm_verify_match` prompt and
    answers

    * "" (silence — simulated transport failure) when
      ``ord(lower(a[0])) % 3 == 0``, exercising BOTH documented failure
      polarities (cross-book default True, corpus/resolver.py:246-286;
      in-book default False, dynamic_resolver.py:266-297);
    * "YES" when the remainder is 1, "NO" when it is 2.

    The rule is arbitrary BY DESIGN: it stands in for a real model while
    being a pure function of the pair, so the whole query surface is
    DuckDB-expressible and hash-checked (``ascii(lower(substr(a,1,1)))``
    on the SQL side); the mod-3 split lands the synthetic corpus's fuzzy
    surfaces in all three branches.  Any prompt that is not a verify
    prompt falls through to the canned-substring table."""

    _VERIFY_RE = re.compile(r'Are "(.+?)" and "(.+?)" the same entity')

    def generate(self, prompt: str, temperature: float = 0.3,
                 timeout: float = 120.0) -> str:
        m = self._VERIFY_RE.search(prompt)
        if m is None:
            return super().generate(prompt, temperature, timeout)
        self.calls += 1
        a = m.group(1)
        o = ord(a[:1].lower()) if a else 0
        if o % 3 == 0:
            return ""                       # simulated failure → defaults
        return "YES" if o % 3 == 1 else "NO"


class LLMClient:
    """Provider-switchable client (reference llm.py:17-70): generate()
    never raises — any backend failure returns ""."""

    def __init__(self, backend=None):
        self.backend = backend or OllamaBackend()

    @property
    def is_available(self) -> bool:
        try:
            return self.backend.available
        except Exception:
            return False

    def generate(self, prompt: str, temperature: float = 0.3,
                 timeout: float = 120.0) -> str:
        try:
            return self.backend.generate(prompt, temperature, timeout) or ""
        except Exception:
            return ""


def extract_json(response: str):
    """Reference JSON salvage (llm.py:166-207)."""
    if not response:
        return None
    if "```" in response:
        m = re.search(r"```(?:json)?\s*([\s\S]*?)\s*```", response)
        if m:
            response = m.group(1)
    try:
        return json.loads(response)
    except json.JSONDecodeError:
        pass
    m = re.search(r"\[[\s\S]*\]", response)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    m = re.search(r"\{[\s\S]*\}", response)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    return None


# ------------------------------------------------------- result coercion

def parse_llm_entities(data, text: str) -> list[tuple]:
    """ner.py:229-258: (text, label, start, end, conf, source) rows;
    positions via find with case-insensitive fallback; non-whitelisted
    labels → UNKNOWN; anything malformed skipped."""
    if not isinstance(data, list):
        return []
    out = []
    for item in data:
        if not isinstance(item, dict) or "text" not in item:
            continue
        etext = str(item["text"])
        idx = text.find(etext)
        if idx == -1:
            idx = text.lower().find(etext.lower())
        label = str(item.get("type", "UNKNOWN")).upper()
        if label not in LLM_LABELS:
            label = "UNKNOWN"
        start = idx if idx >= 0 else 0
        end = (idx + len(etext)) if idx >= 0 else len(etext)
        out.append((etext, label, start, end, LLM_CONF, "llm"))
    return out


def parse_llm_relationships(data) -> list[tuple]:
    """relationships.py:278-382: (subject, predicate, object, conf) rows;
    unknown predicates coerce to RELATED_TO (:353-356)."""
    if not isinstance(data, list):
        return []
    preds = set(vocab.PREDICATES)
    out = []
    for item in data:
        if not isinstance(item, dict):
            continue
        s = item.get("subject")
        p = str(item.get("predicate", "")).upper().replace(" ", "_")
        o = item.get("object")
        if not s or not o:
            continue
        if p not in preds:
            p = vocab.FALLBACK_PREDICATE
        out.append((str(s), p, str(o), LLM_CONF))
    return out


def parse_llm_events(data) -> list[tuple]:
    """lore/events.py:529-619: (agent, action, patient) rows; rows
    missing agent or action dropped."""
    if not isinstance(data, list):
        return []
    out = []
    for item in data:
        if not isinstance(item, dict):
            continue
        agent, action = item.get("agent"), item.get("action")
        if not agent or not action:
            continue
        out.append((str(agent), str(action), str(item.get("patient", ""))))
    return out


def llm_verify_match(client: LLMClient, name_a: str, name_b: str,
                     default: bool) -> bool:
    """J3 yes/no merge verification.  ``default`` carries the reference's
    polarity asymmetry: pass True for the cross-book path
    (corpus/resolver.py:286 — failure keeps the merge) and False for the
    in-book dynamic path (dynamic_resolver.py:297 — failure rejects)."""
    prompt = (f'Are "{name_a}" and "{name_b}" the same entity '
              f"(person/place/thing)?\n\nAnswer only YES or NO:")
    resp = client.generate(prompt, temperature=0.1, timeout=15.0)
    if not resp:
        return default
    return resp.strip().upper().startswith("YES")


# --------------------------------------------------------- actor stage

_NER_PROMPT = """Extract all named entities from this text.
Return a JSON array of objects with keys: "text", "type" (PERSON, PLACE, \
OBJECT, or EVENT).

Text: "{text}"

JSON array (no explanation, just the array):"""


class LLMEntityStage:
    """M7 actor-pool stage: the client is constructed ONCE per actor in
    ``__init__`` (ST1/ST4); each batch prompts per unit and appends
    mention rows; every failure path yields [] for that unit — the
    pipeline degrades, never fails (reference ner.py:256-260)."""

    def __init__(self, backend=None):
        self.client = LLMClient(backend)

    def extract(self, text: str) -> list[tuple]:
        if not self.client.is_available:
            return []
        resp = self.client.generate(_NER_PROMPT.format(text=text))
        return parse_llm_entities(extract_json(resp), text)

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        rows = []
        for uid, lang, text in zip(t["unit_id"].to_pylist(),
                                   t["lang"].to_pylist(),
                                   t["text"].to_pylist()):
            if lang != "txt":
                continue
            for etext, label, start, end, conf, src in self.extract(text):
                rows.append((uid, etext, label, start, end, conf, src))
        return pd.DataFrame(rows, columns=[
            "unit_id", "mention_text", "label", "start_char", "end_char",
            "confidence", "source"])


_REL_PROMPT = """Extract relationships between entities in this sentence.

Entities present: {entities}

Sentence: "{text}"

Return a JSON array of relationships with keys "subject", "predicate" \
(one of: {preds}), "object", optional "indirect_object".
Return empty array [] if none found.

JSON array:"""


class LLMRelationshipStage:
    """R3 actor-pool stage (relationships.py:278-382): per prose unit,
    prompt with the unit's entity context, coerce predicates to the
    closed vocabulary; any failure → no rows for that unit.  Expects an
    optional ``entities`` column (comma-joined mention surfaces) — absent
    means no context line, as the reference does with an empty list."""

    def __init__(self, backend=None):
        self.client = LLMClient(backend)
        self.preds = ", ".join(sorted(set(vocab.PREDICATES)))

    def extract(self, text: str, entities: str = "") -> list[tuple]:
        if not self.client.is_available:
            return []
        resp = self.client.generate(
            _REL_PROMPT.format(entities=entities, text=text,
                               preds=self.preds), temperature=0.1,
            timeout=30.0)
        return parse_llm_relationships(extract_json(resp))

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        ents = (t["entities"].to_pylist() if "entities" in t.schema.names
                else [""] * t.num_rows)
        rows = []
        for uid, lang, text, ectx in zip(t["unit_id"].to_pylist(),
                                         t["lang"].to_pylist(),
                                         t["text"].to_pylist(), ents):
            if lang != "txt":
                continue
            for s, p, o, conf in self.extract(text, ectx or ""):
                rows.append((uid, s, p, o, conf, "llm"))
        return pd.DataFrame(rows, columns=[
            "unit_id", "subj", "pred", "obj", "confidence", "source"])


_EVENT_PROMPT = """Extract key events from this fantasy text.  For each \
event identify description, agent, action, patient, year, era.
Also identify temporal relations between events (before / caused).

Text:
{text}

Return JSON with two arrays "events" (objects with id, description, \
agent, action, patient, year, era) and "relations" (objects with \
from_id, to_id, relation):"""


def parse_llm_event_payload(data) -> tuple[list[tuple], list[tuple]]:
    """lore/events.py:560-619 payload coercion: a dict with ``events`` /
    ``relations`` arrays (the LLM event prompt's contract).  Events
    missing agent or action are dropped; years coerce to int or None;
    eras lowercase; relations referencing dropped/unknown ids are
    dropped.  A bare list is treated as events-only (salvage tolerance)."""
    if isinstance(data, list):
        data = {"events": data, "relations": []}
    if not isinstance(data, dict):
        return [], []
    events, kept_ids = [], set()
    for item in data.get("events") or []:
        if not isinstance(item, dict):
            continue
        agent, action = item.get("agent"), item.get("action")
        if not agent or not action:
            continue
        year = item.get("year")
        try:
            year = int(year) if year is not None else None
        except (TypeError, ValueError):
            year = None
        era = item.get("era")
        era = str(era).lower() if era else None
        eid = str(item.get("id", f"ev{len(events)}"))
        kept_ids.add(eid)
        events.append((eid, str(item.get("description", "")), str(agent),
                       str(action), str(item.get("patient", "")), year,
                       era))
    relations = []
    for item in data.get("relations") or []:
        if not isinstance(item, dict):
            continue
        a, b = item.get("from_id"), item.get("to_id")
        rel = str(item.get("relation", "")).lower()
        if (str(a) in kept_ids and str(b) in kept_ids
                and rel in ("before", "caused")):
            relations.append((str(a), str(b), rel))
    return events, relations


class LLMEventStage:
    """R5 actor-pool stage (lore/events.py:529-619): per prose chunk,
    prompt → salvage → events + temporal relations; the reference's
    4000-char prompt cap is kept; failures yield nothing for the chunk."""

    TEXT_CAP = 4000              # lore/events.py:537

    def __init__(self, backend=None):
        self.client = LLMClient(backend)

    def extract(self, text: str) -> tuple[list[tuple], list[tuple]]:
        if not self.client.is_available:
            return [], []
        resp = self.client.generate(
            _EVENT_PROMPT.format(text=text[:self.TEXT_CAP]),
            temperature=0.3, timeout=120.0)
        return parse_llm_event_payload(extract_json(resp))

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        rows = []
        for uid, lang, text in zip(t["unit_id"].to_pylist(),
                                   t["lang"].to_pylist(),
                                   t["text"].to_pylist()):
            if lang != "txt":
                continue
            events, relations = self.extract(text)
            for eid, desc, agent, action, patient, year, era in events:
                rows.append((uid, "event", eid, desc, agent, action,
                             patient, year, era, None, None, None))
            for a, b, rel in relations:
                rows.append((uid, "relation", None, None, None, None,
                             None, None, None, a, b, rel))
        return pd.DataFrame(rows, columns=[
            "unit_id", "kind", "event_id", "description", "agent",
            "action", "patient", "year", "era", "from_id", "to_id",
            "relation"])


# ------------------------------------------------- A15 LLM rule synthesis

_RULE_PROMPT = """Based on these passages, extract specific \
world-building rules about {category}.

Passages:
{context}

Return a JSON array of objects with keys "title", "description", \
"constraints" (array), "exceptions" (array).  Only include rules clearly \
supported by the text.

JSON array:"""


def llm_synthesize_rules(client: LLMClient, category: str,
                         passages: list[str],
                         pattern_fallback=None) -> list[dict]:
    """A15 (worldbible/extractor.py:198-300): context = first 20 passages
    truncated to 300 chars; LLM failure or malformed payload falls back to
    the pattern path (``pattern_fallback()`` — the wb_rules computation);
    accepted rules get id f"{category}_{i}" and confidence 0.8."""
    if not passages:
        return []
    ctx = "\n".join(
        f"- {p[:300]}..." if len(p) > 300 else f"- {p}"
        for p in passages[:20])
    resp = client.generate(_RULE_PROMPT.format(category=category,
                                               context=ctx),
                           temperature=0.3, timeout=120.0)
    data = extract_json(resp) if resp else None
    if not data or not isinstance(data, list):
        return pattern_fallback() if pattern_fallback is not None else []
    rules = []
    for i, item in enumerate(data):
        if not isinstance(item, dict) or "title" not in item:
            continue
        rules.append({
            "rule_id": f"{category}_{i}",
            "title": str(item.get("title", "Unknown")),
            "description": str(item.get("description", "")),
            "category": category,
            "confidence": 0.8,
            "constraints": [str(c) for c in item.get("constraints") or []],
            "exceptions": [str(e) for e in item.get("exceptions") or []],
        })
    return rules
