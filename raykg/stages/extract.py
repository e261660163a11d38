"""Extract stage: units → unified extraction rows (mentions, candidate
relations, alias pairs, events) in ONE pass; plus the code-domain extractor
over raw corpus rows.

Transposed reference semantics:

* proper-noun mention detection — the reference's PATTERN TIER byte-for-
  byte (title + epithet families, ``extract/ner.py:34-44``, IGNORECASE,
  conf 0.9, label PERSON; parity vs the reference code pinned by
  tests/test_ref_parity.py) plus a capitalized-token pass with blocklist
  (the deterministic analog of the spaCy PROPN fallback,
  ``extract/ner.py:137-156``, conf 0.7), overlap-deduped with the
  reference's exact algorithm (``extract/ner.py:262-290``).  One mention
  row per (unit, surface form, label) with an occurrence count (the
  reference counts a mention per passage sighting,
  ``graph/writer.py:121-127``).
* regex SVO relation extraction — the deterministic analog of the dependency
  path (``extract/relationships.py:161-234``) using the closed verb-phrase map
  (``vocab.VERB_PHRASE_TO_PRED``); within-unit dedup keeps max confidence
  (``extract/relationships.py:384-398``).
* alias statements — ``extract/dynamic_resolver.py:311-350`` (R10): emits
  explicit alias-pair rows that become union-find edges.
* temporal / event extraction — ``lore/temporal.py:294-346`` +
  ``lore/events.py:621-646`` (M16/M17): era+year columns and
  agent/action/patient event rows.
* code extractor — the north-star transposition: imports / definitions /
  call sites per language, with ``import x as y`` aliasing resolved in-file
  (analogous to alias statements).

The extractor is a callable CLASS for ``map_batches`` (actor pool): all
regexes compile once per actor in ``__init__`` (reference lazily builds its
spaCy pipeline once per process, ``extract/ner.py:64-76``).
"""

from __future__ import annotations

import re

import pyarrow as pa

from raykg import vocab

# --- shared pattern constants (mirrored in oracle SQL) ---
CAP_TOKEN_PATTERN = r"\b[A-Z][a-z]+\b"
VERB_ALTERNATION = "|".join(re.escape(v) for v in vocab.VERB_PHRASES_ORDERED)
SVO_PATTERN = (r"\b([A-Z][a-z]+) (" + VERB_ALTERNATION +
               r") (?:the )?([A-Z][a-z]+)\b")
ALIAS_STMT_PATTERN = r"\b([A-Z][a-z]+), also known as ([A-Z][a-z]+)\b"
ERA_YEAR_PATTERN = (r"\bIn the (" + "|".join(vocab.ERAS) +
                    r") Age, year (\d+)\b")

MENTION_CONF = 0.7          # PROPN-fallback confidence (ner.py:156)
PATTERN_CONF = 0.9          # pattern-tier confidence (ner.py:175)
REL_CONF = 0.7              # pattern-method confidence (relationships.py:234)
EVENT_CONF = 0.6            # pattern event confidence (events.py:621-646)
CODE_CONF = 0.9

KIND_MENTION = "mention"
KIND_REL = "rel"
KIND_ALIAS = "alias_pair"
KIND_EVENT = "event"

_OUT_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("unit_id", pa.string()),
    ("doc_sha256", pa.string()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("lang", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("label", pa.string()),
    ("confidence", pa.float64()),
    ("method", pa.string()),
    ("start_char", pa.int32()),
    ("end_char", pa.int32()),
    ("n_occurrences", pa.int64()),
    ("era", pa.string()),
    ("year", pa.int64()),
])


def dedup_overlapping_spans(spans: list[tuple[int, int, float, str, str]]):
    """Overlap dedup — EXACT reference algorithm (extract/ner.py:262-290):
    sort by (start, -confidence) (stable → insertion order breaks ties);
    greedily accept non-overlapping spans; a span overlapping an accepted
    one replaces it iff strictly higher confidence AND text length >= the
    accepted text's length (remove + append, matching the reference's
    list mutation order); finally sort by start.

    spans: (start, end, confidence, text, label); returns kept spans.
    """
    ordered = sorted(spans, key=lambda s: (s[0], -s[2]))
    kept: list[tuple[int, int, float, str, str]] = []
    for sp in ordered:
        overlaps = False
        for k in kept:
            if not (sp[1] <= k[0] or sp[0] >= k[1]):   # overlap
                overlaps = True
                if sp[2] > k[2] and len(sp[3]) >= len(k[3]):
                    kept.remove(k)
                    kept.append(sp)
                break
        if not overlaps:
            kept.append(sp)
    return sorted(kept, key=lambda s: s[0])


def pattern_entities(text: str, ner_res=None):
    """Reference pattern-tier NER (extract/ner.py:160-178): every match of
    the title/epithet families (IGNORECASE, in _compile_patterns order) as
    a PERSON span at conf 0.9, surface = full match.  Returns
    (start, end, conf, text, label) spans in emission order — callers run
    :func:`dedup_overlapping_spans` over them (+ other tiers).

    Each pattern is gated behind a C-speed substring prescreen keyed by the
    pattern's EXACT source string (``_TRIGGERS_BY_PATTERN``: lowercase
    words every possible match must contain — a NECESSARY condition, so
    gating never changes output); most units trigger no family and skip
    all five regex scans.  Custom patterns (a non-default ``ner_res``, the
    §2.9 extension seam) or edited defaults simply miss the lookup and run
    UNGATED — gating can only ever be a no-op, never drop matches."""
    if ner_res is None:
        ner_res = _NER_RES
    lt = text.lower()
    spans = []
    for rx in ner_res:
        trig = _TRIGGERS_BY_PATTERN.get(rx.pattern)
        if trig is not None and not any(t in lt for t in trig):
            continue
        for m in rx.finditer(text):
            spans.append((m.start(), m.end(), PATTERN_CONF, m.group(0),
                          "PERSON"))
    return spans


_NER_RES = tuple(re.compile(p, re.IGNORECASE) for p in vocab.NER_PATTERNS)
# trigger prescreens keyed by the exact pattern STRING (not position):
# every string the pattern can match contains ≥1 trigger (case-folded).
# A pattern whose content changes no longer matches its key and runs
# ungated — correct by construction, just unprescreened.
_TRIGGERS_BY_PATTERN: dict[str, tuple[str, ...]] = {
    vocab.NER_TITLE_PATTERNS[0]:
        ("king", "queen", "lord", "lady", "prince", "chief", "captain",
         "steward"),
    vocab.NER_TITLE_PATTERNS[1]:
        ("wizard", "king", "lord", "lady", "enemy", "rider"),
    vocab.NER_EPITHET_PATTERNS[0]:
        ("ring", "halfling", "perian", "dwarf-friend", "elf-friend"),
    vocab.NER_EPITHET_PATTERNS[1]:
        ("necromancer", "enemy", "dark lord", "shadow"),
    vocab.NER_EPITHET_PATTERNS[2]:
        ("gandalf", "saruman", "radagast"),
}


class UnitExtractor:
    """Actor-pool callable: units batch → unified extraction rows.

    ``llm_backend`` (M7/R3/R5 wiring, reference ``extract/ner.py:95-99``):
    when given, an :class:`raykg.state.llm.LLMClient` is built ONCE per
    actor and a third extraction tier runs per unit — LLM entity spans
    join the pattern/cap-token spans BEFORE overlap dedup (exactly where
    the reference inserts them), LLM relationships merge into the
    within-unit rel dedup keeping max confidence
    (``extract/relationships.py:384-398``), and LLM events emit
    agent/action/patient rows.  Every LLM failure degrades to no extra
    rows; ``llm_backend=None`` (the default) is byte-identical to the
    pattern-only path."""

    def __init__(self, llm_backend=None):
        self.cap_re = re.compile(CAP_TOKEN_PATTERN)
        self.ner_res = tuple(re.compile(p, re.IGNORECASE)
                             for p in vocab.NER_PATTERNS)
        self.svo_re = re.compile(SVO_PATTERN)
        self.alias_re = re.compile(ALIAS_STMT_PATTERN)
        self.era_re = re.compile(ERA_YEAR_PATTERN)
        self.blocklist = frozenset(vocab.CAP_BLOCKLIST)
        self.ner_tier = self.rel_tier = self.event_tier = None
        if llm_backend is not None:
            from raykg.state import llm as llm_mod
            self.ner_tier = llm_mod.LLMEntityStage(llm_backend)
            self.rel_tier = llm_mod.LLMRelationshipStage(llm_backend)
            self.event_tier = llm_mod.LLMEventStage(llm_backend)

    def _rows_for_unit(self, meta: tuple, text: str, rows: list):
        unit_id, sha, repo, path, lang = meta

        def emit(kind, subj, pred=None, obj=None, label=None, conf=None,
                 method="pattern", start=-1, end=-1, n_occ=1, era=None,
                 year=None):
            rows.append((kind, unit_id, sha, repo, path, lang, subj, pred,
                         obj, label, conf, method, start, end, n_occ, era,
                         year))

        # mentions: pattern tier (ner.py:160-178) + capitalized-token tier
        # (the deterministic PROPN-fallback analog, conf 0.7), overlap-
        # deduped with the reference's exact algorithm (ner.py:262-290) —
        # a cap token inside a kept pattern span is suppressed for that
        # occurrence.  One output row per (unit, surface, label).
        spans = [sp + ("pattern",)
                 for sp in pattern_entities(text, self.ner_res)]
        for m in self.cap_re.finditer(text):
            tok = m.group(0)
            if tok in self.blocklist:
                continue
            spans.append((m.start(), m.end(), MENTION_CONF, tok, "UNKNOWN",
                          "pattern"))
        if self.ner_tier is not None:
            # third tier joins the span list BEFORE dedup (ner.py:95-101)
            for etext, label, s, e, conf, src in self.ner_tier.extract(text):
                spans.append((s, e, conf, etext, label, src))
        occ: dict[tuple[str, str, float, str], list[tuple[int, int]]] = {}
        for s, e, conf, txt, label, src in dedup_overlapping_spans(spans):
            occ.setdefault((txt, label, conf, src), []).append((s, e))
        for (txt, label, conf, src), sps in occ.items():
            emit(KIND_MENTION, txt, label=label, conf=conf, method=src,
                 start=sps[0][0], end=sps[0][1], n_occ=len(sps))

        # candidate relations — within-unit dedup keeps MAX confidence per
        # (subj, pred, obj) key (relationships.py:384-398); all pattern
        # confs are equal so the pattern-only path reduces to distinct.
        rels: dict[tuple, tuple] = {}
        for m in self.svo_re.finditer(text):
            s, verb, o = m.group(1), m.group(2), m.group(3)
            pred = vocab.VERB_PHRASE_TO_PRED.get(verb, vocab.FALLBACK_PREDICATE)
            key = (s.lower(), pred, o.lower())
            if key not in rels:
                rels[key] = (s, pred, o, REL_CONF, "pattern",
                             m.start(), m.end())
        # F2 min-entity gate (relationships.py:147,417-418): the LLM tier
        # only sees passages with >= 2 distinct entities; the pattern SVO
        # regex enforces the same arity structurally (two cap groups).
        if self.rel_tier is not None and len({k[0] for k in occ}) >= 2:
            ectx = ", ".join(sorted({k[0] for k in occ}))
            for s, p, o, conf in self.rel_tier.extract(text, ectx):
                key = (s.lower(), p, o.lower())
                if key not in rels or conf > rels[key][3]:
                    rels[key] = (s, p, o, conf, "llm", -1, -1)
        for s, pred, o, conf, src, ms, me in rels.values():
            emit(KIND_REL, s, pred=pred, obj=o, conf=conf, method=src,
                 start=ms, end=me)

        # alias statements → union-find edges (substring prescreen: the
        # pattern contains the literal ", also known as " — necessary
        # condition, C-speed skip for ~every unit)
        if "also known as" in text:
            for m in self.alias_re.finditer(text):
                emit(KIND_ALIAS, m.group(1), pred="ALIAS_OF", obj=m.group(2),
                     conf=1.0, start=m.start(), end=m.end())

        # temporal + events: era/year attach to SVO matches in the same unit
        # (same necessary-substring prescreen: pattern contains " Age, year ")
        em = self.era_re.search(text) if "Age, year" in text else None
        if em is not None:
            era, year = em.group(1), int(em.group(2))
            for m in self.svo_re.finditer(text):
                s, verb, o = m.group(1), m.group(2), m.group(3)
                emit(KIND_EVENT, s, pred=verb, obj=o, conf=EVENT_CONF,
                     era=era, year=year)
        if self.event_tier is not None:
            # R5: LLM agent/action/patient events (lore/events.py:529-619);
            # the payload's before/caused relations feed the standalone
            # timeline stage, not the extract row schema.
            events, _relations = self.event_tier.extract(text)
            for _eid, _desc, agent, action, patient, year, era in events:
                emit(KIND_EVENT, agent, pred=action, obj=patient,
                     conf=0.85, method="llm", era=era, year=year)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        unit_ids = batch["unit_id"].to_pylist()
        shas = batch["doc_sha256"].to_pylist()
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        for i in range(len(unit_ids)):
            if langs[i] != "txt":
                continue
            meta = (unit_ids[i], shas[i], repos[i], paths[i], langs[i])
            self._rows_for_unit(meta, texts[i], rows)
        return _rows_to_table(rows)


def _rows_to_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in _OUT_SCHEMA.names]
    return pa.table(
        {name: pa.array(list(cols[i]), _OUT_SCHEMA.types[i])
         for i, name in enumerate(_OUT_SCHEMA.names)})


# ----------------------------------------------------------------- code side

CODE_IMPORT_PATTERN = r"(?m)^import (\w+)(?: as (\w+))?$"
CODE_FROM_PATTERN = r"(?m)^from (\w+) import (\w+)$"
CODE_DEF_PATTERN = r"(?m)^(?:def|class) (\w+)"
CODE_CALL_PATTERN = r"(?m)^\s+(?:(\w+)\.)?(\w+)\(\)"


class CodeExtractor:
    """Actor-pool callable over corpus rows (lang != 'txt'): emits code-domain
    mentions and candidate triples.  Per-file import-alias resolution is the
    code analog of the reference's alias statements (dynamic_resolver.py:311-350).

    Emitted triples (subjects/objects are final canonical ids — code ids are
    already canonical, no union-find needed):
      (module, IMPORTS, target)        for every import
      (module, ALIASES, target)        for ``import x as y``
      (module, IMPORTS_FROM, tgt.sym)  for ``from x import sym``
      (module, DEFINES, module.name)   for top-level def/class
      (module.def, CALLS, tgt.fn)      for call sites, aliases resolved
    """

    def __init__(self):
        self.import_re = re.compile(CODE_IMPORT_PATTERN)
        self.from_re = re.compile(CODE_FROM_PATTERN)
        self.def_re = re.compile(r"^(?:def|class) (\w+)")
        self.call_re = re.compile(r"^\s+(?:(\w+)\.)?(\w+)\(\)")
        self.blank_re = re.compile(r"^\s*$")

    def _extract_file(self, repo: str, path: str, sha: str, content: str,
                      rows: list):
        module = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        # block index mirrors split_paragraphs numbering for unit ids
        block = 1 if content and not self.blank_re.match(content.split("\n", 1)[0]) else 0
        prev_blank = block == 0
        local_to_module: dict[str, str] = {module: module}
        local_defs: set[str] = set()
        current_def: str | None = None
        pending: list[tuple] = []   # call rows resolved after the full scan

        def emit(kind, unit_block, subj, pred=None, obj=None, label=None,
                 conf=CODE_CONF, n_occ=1):
            from raykg.stages.split import unit_id_of
            uid = unit_id_of(sha, 1, unit_block, 1)
            rows.append((kind, uid, sha, repo, path, "py", subj, pred, obj,
                         label, conf, "code", -1, -1, n_occ, None, None))

        # the defining module is itself an entity (subject of IMPORTS/DEFINES)
        emit(KIND_MENTION, 1, module, label="MODULE")

        for line in content.split("\n"):
            if self.blank_re.match(line):
                prev_blank = True
                continue
            if prev_blank:
                block += 1
                prev_blank = False
            m = re.match(r"^import (\w+)(?: as (\w+))?$", line)
            if m:
                target, local = m.group(1), m.group(2)
                local_to_module[local or target] = target
                emit(KIND_MENTION, block, target, label="MODULE")
                emit(KIND_REL, block, module, pred="IMPORTS", obj=target)
                if local:
                    emit(KIND_REL, block, module, pred="ALIASES", obj=target)
                continue
            m = re.match(r"^from (\w+) import (\w+)$", line)
            if m:
                target, sym = m.group(1), m.group(2)
                local_to_module[sym] = target    # called bare: resolves to target
                emit(KIND_MENTION, block, target, label="MODULE")
                emit(KIND_REL, block, module, pred="IMPORTS", obj=target)
                emit(KIND_REL, block, module, pred="IMPORTS_FROM",
                     obj=f"{target}.{sym}")
                continue
            m = self.def_re.match(line)
            if m:
                current_def = m.group(1)
                local_defs.add(current_def)
                qual = f"{module}.{current_def}"
                emit(KIND_MENTION, block, qual, label="FUNCTION")
                emit(KIND_REL, block, module, pred="DEFINES", obj=qual)
                continue
            m = self.call_re.match(line)
            if m and current_def is not None:
                qualifier, fn = m.group(1), m.group(2)
                caller = f"{module}.{current_def}"
                pending.append((block, caller, qualifier, fn))

        for block_i, caller, qualifier, fn in pending:
            if qualifier is not None:
                callee = f"{local_to_module.get(qualifier, qualifier)}.{fn}"
            elif fn in local_defs:
                callee = f"{module}.{fn}"
            elif fn in local_to_module:        # from-import symbol
                callee = f"{local_to_module[fn]}.{fn}"
            else:
                callee = fn
            emit(KIND_MENTION, block_i, callee, label="CALL")
            emit(KIND_REL, block_i, caller, pred="CALLS", obj=callee)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raykg.functions.textnorm import sha256_hex
        rows: list[tuple] = []
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        for i in range(len(paths)):
            if langs[i] == "txt":
                continue
            self._extract_file(repos[i], paths[i], sha256_hex(contents[i]),
                               contents[i], rows)
        return _rows_to_table(rows)


