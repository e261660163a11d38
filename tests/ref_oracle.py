"""In-process reference oracle: load the pure-regex tiers of the reference
implementation (/root/reference, read-only) so parity tests can compare the
Ray engine's prose path against the reference's actual behavior on REAL
text — not just the synthetic corpus whose oracle shares regex constants
with the engine.

The reference imports spacy / httpx at module level; neither is installed
(nor needed for the pattern tiers), so minimal stub modules are installed
in sys.modules before loading.  Only the spaCy-free code paths are ever
called:

* ``ingest/splitter.py``   — split_into_passages (pure re)
* ``extract/ner.py``       — _extract_patterns + _deduplicate (pattern tier)
* ``voice/dialogue.py``    — extract_dialogue(nlp=None) (regex tiers 1-4)

Reference code is EXECUTED as a test oracle, never copied.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_SRC = "/root/reference/src/book_graph_analyzer"

_loaded: dict[str, types.ModuleType] = {}


def _install_stubs() -> None:
    if "spacy" not in sys.modules:
        spacy = types.ModuleType("spacy")
        spacy.Language = object
        spacy.load = lambda *a, **k: (_ for _ in ()).throw(OSError("stub"))
        tokens = types.ModuleType("spacy.tokens")
        tokens.Doc = object
        tokens.Span = object
        spacy.tokens = tokens
        sys.modules["spacy"] = spacy
        sys.modules["spacy.tokens"] = tokens
    if "httpx" not in sys.modules:
        httpx = types.ModuleType("httpx")

        class _Err(Exception):
            pass

        httpx.RequestError = _Err
        httpx.TimeoutException = _Err
        httpx.post = lambda *a, **k: (_ for _ in ()).throw(_Err("stub"))
        sys.modules["httpx"] = httpx


def _load(name: str, rel_path: str) -> types.ModuleType:
    if name in _loaded:
        return _loaded[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_SRC, rel_path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _loaded[name] = mod
    return mod


def available() -> bool:
    return os.path.isdir(REF_SRC)


def _ensure_pkgs() -> None:
    _install_stubs()
    for pkg_name, sub in (("bga_ref", ""), ("bga_ref.ingest", "ingest"),
                          ("bga_ref.extract", "extract"),
                          ("bga_ref.voice", "voice"),
                          ("bga_ref.style", "style"),
                          ("bga_ref.lore", "lore")):
        if pkg_name not in sys.modules:
            m = types.ModuleType(pkg_name)
            m.__path__ = [os.path.join(REF_SRC, sub)]
            sys.modules[pkg_name] = m
    # config must exist before ner (``from ..config import get_settings``)
    _load("bga_ref.config", "config.py")


def splitter():
    _ensure_pkgs()
    return _load("bga_ref.ingest.splitter", "ingest/splitter.py")


def ner():
    _ensure_pkgs()
    return _load("bga_ref.extract.ner", "extract/ner.py")


def dialogue():
    _ensure_pkgs()
    return _load("bga_ref.voice.dialogue", "voice/dialogue.py")


def metrics():
    _ensure_pkgs()
    return _load("bga_ref.style.metrics", "style/metrics.py")


def temporal():
    _ensure_pkgs()
    # llm must exist before temporal (``from ..llm import LLMClient``)
    _load("bga_ref.llm", "llm.py")
    return _load("bga_ref.lore.temporal", "lore/temporal.py")


def classifier():
    _ensure_pkgs()
    return _load("bga_ref.style.classifier", "style/classifier.py")


# ------------------------------------------------------- oracle invocations

def ref_split(text: str, book: str = "book"):
    """Reference split_into_passages → list of Passage dataclasses."""
    return splitter().split_into_passages(text, book)


def ref_pattern_entities(text: str):
    """Reference pattern-tier NER: _extract_patterns + _deduplicate,
    without touching settings / spaCy / LLM (constructed via __new__)."""
    mod = ner()
    p = mod.NERPipeline.__new__(mod.NERPipeline)
    p._patterns = mod.NERPipeline._compile_patterns(p)
    ents = p._extract_patterns(text)
    return p._deduplicate(ents)


def ref_dialogue(text: str, passage_id: str | None = None):
    """Reference extract_dialogue with nlp=None (regex tiers only)."""
    return dialogue().extract_dialogue(text, passage_id=passage_id, nlp=None)


# ------------------------------------------------------------ real fixture

def real_prose(max_chars: int | None = None) -> str:
    """Deterministic REAL-prose document assembled at test time from the
    reference's shipped outputs (real Hobbit ch.1 sentences with curly
    quotes, honorific abbreviations, dialogue attribution frames).  The
    text is built here and never committed to the repo.

    Chapter headers exercise all four reference header families; a >100
    char preamble exercises the Prologue path.
    """
    import json
    texts: set[str] = set()

    def walk(o):
        if isinstance(o, dict):
            t = o.get("text")
            if isinstance(t, str):
                texts.add(t)
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    for rel in ("data/output/hobbit_ch1_bible.json",
                "data/output/hobbit_events.json"):
        path = os.path.join("/root/reference", rel)
        if os.path.exists(path):
            with open(path) as f:
                walk(json.load(f))

    # deterministic order; drop fragments that themselves look like
    # chapter headers (would shift numbering unpredictably)
    import re
    hdr = re.compile(r"^(chapter|part)\s", re.IGNORECASE)
    frags = sorted(t.strip() for t in texts
                   if t.strip() and not hdr.match(t.strip()))
    if max_chars is not None:
        out, total = [], 0
        for t in frags:
            total += len(t) + 1
            if total > max_chars:
                break
            out.append(t)
        frags = out

    headers = ["Chapter I. An Unexpected Party", "CHAPTER 2: Roast Mutton",
               "3. A Short Rest", "Part IV"]
    preamble = ("This preamble precedes the first chapter marker and is "
                "deliberately longer than one hundred characters so the "
                "reference treats it as a prologue section.")
    paras: list[str] = []
    para: list[str] = []
    chunks: list[str] = [preamble, ""]
    hi = 0
    for i, frag in enumerate(frags):
        para.append(frag)
        if len(para) == 4:
            paras.append(" ".join(para))
            para = []
        if len(paras) == 6:
            chunks.append(headers[hi % len(headers)])
            hi += 1
            chunks.extend(["", "\n\n".join(paras), ""])
            paras = []
    if para:
        paras.append(" ".join(para))
    if paras:
        chunks.append(headers[hi % len(headers)])
        chunks.extend(["", "\n\n".join(paras), ""])
    # pattern-dense closing chapter: exercises every NER pattern family,
    # tier 1-4 dialogue attribution, and the abbreviation protector
    dense = "\n\n".join([
        "This line is consumed by the header pattern quirk.",
        "King Thorin Oakenshield spoke of the Lonely Mountain. "
        "They feared the Necromancer and the Dark Lord alike, for the "
        "Shadow grew. “You shall not pass!” cried Gandalf the Grey.",
        "Saruman the White summoned the Grey Wizard to Isengard. "
        "“Where is the Ring-bearer?” asked the Lady Galadriel. "
        "The Halfling hid behind Mr. Baggins of Bag End.",
        "Lord Elrond of Rivendell welcomed them. “Come in quickly!” "
        "Elrond said. Dr. Grey and Prof. Took studied the map, i.e. the "
        "old chart of Capt. Fili.",
        "“It is mine!” The creature hissed in the dark. Queen "
        "Beruthiel kept nine cats. “We must go at once,” whispered "
        "Balin, and Dwalin nodded.",
        "The Great Enemy of old was defeated by the High King. An "
        "Elf-friend may pass, said the gatekeeper. “Farewell!” they "
        "shouted together. \"Good morning!\" said Bilbo Baggins.",
    ])
    chunks.extend(["Part IX", "", dense, ""])
    return "\n".join(chunks)
