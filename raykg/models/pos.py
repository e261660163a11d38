"""Deterministic per-language POS lexicon — the stateful model hosted by
the style actor pool (ST1, north star: "actor pool hosting stateful
NER/parser models per language").

The reference computes M14's POS counts / clause depth / voice with spaCy
(``style/metrics.py:124-230``); no parser ships in this environment, so
the deterministic analog is a rule lexicon: closed word classes expanded
with inflections at BUILD time, serialized to a model artifact, loaded and
indexed once per actor in ``__init__``.  Every rule is a shared constant
so the DuckDB oracle evaluates the identical tagging function.

Tagging ladder (first match wins — the oracle mirrors the order):
  1. closed-class word (determiners/pronouns/prepositions/aux/conj) → OTHER
  2. ADV list, or ``*ly`` with length > 3                            → ADV
  3. ADJ list, or adjective suffix                                   → ADJ
  4. VERB lexicon (inflection-expanded), or ``*ed``/``*ing`` len > 4 → VERB
  5. default                                                         → NOUN
"""

from __future__ import annotations

import json
import os
import re

from raykg import vocab

MODEL_CACHE = "/tmp/raykg_models"
MODEL_VERSION = 2       # v2: + determiner class (shallow-chunker support)

# --- shared rule constants (mirrored into oracle SQL) ---
CLOSED_OTHER: tuple[str, ...] = (
    "the", "a", "an", "this", "that", "these", "those", "some", "any",
    "no", "every", "each",
    "i", "you", "he", "she", "it", "we", "they", "him", "her", "them",
    "me", "us", "his", "hers", "its", "their", "theirs", "my", "mine",
    "your", "yours", "our", "ours", "who", "whom", "whose", "which",
    "what",
    "of", "in", "on", "at", "by", "to", "from", "with", "without",
    "into", "onto", "over", "under", "near", "through", "upon", "for",
    "and", "or", "but", "nor", "so", "yet", "if", "because", "although",
    "though", "while", "when", "whenever", "since", "unless", "until",
    "as", "than", "where", "after", "before",
    "is", "am", "are", "was", "were", "be", "been", "being", "do",
    "does", "did", "have", "has", "had", "will", "would", "shall",
    "should", "can", "could", "may", "might", "must", "not",
)

# determiner SUBCLASS of the closed class — the shallow chunker needs
# determiners distinguished from prepositions/aux (an NP may start with a
# determiner but not with "of"); the POS ladder itself still tags them
# OTHER, so M14 metrics are unchanged
DETERMINERS: tuple[str, ...] = (
    "the", "a", "an", "this", "that", "these", "those", "some", "any",
    "no", "every", "each",
)

ADV_WORDS: tuple[str, ...] = (
    "again", "almost", "already", "also", "always", "away", "back",
    "even", "ever", "far", "here", "just", "never", "now", "often",
    "once", "only", "quite", "rather", "soon", "still", "then", "there",
    "too", "twice", "very", "well", "yet", "slowly", "quickly",
)

ADJ_WORDS: tuple[str, ...] = (
    "old", "young", "great", "little", "long", "short", "high", "low",
    "dark", "pale", "cold", "warm", "quiet", "tall", "deep", "ancient",
    "good", "bad", "fine", "grey", "white", "black", "big", "small",
    "new", "last", "first", "second", "third", "fourth", "other", "own",
    "merry", "late", "early",
)

# verb LEMMAS — expanded with s/ed/ing inflections at build time
VERB_LEMMAS: tuple[str, ...] = (
    "go", "come", "make", "take", "give", "get", "see", "know", "think",
    "look", "want", "use", "find", "tell", "ask", "work", "seem", "feel",
    "leave", "call", "keep", "turn", "bring", "begin", "show", "hear",
    "play", "run", "move", "live", "hold", "walk", "ride", "rest",
    "wait", "grow", "fall", "carry", "fight", "speak", "travel", "enter",
    "rule", "guard", "destroy", "create", "forge", "wield", "honor",
    "dwell", "flee", "escape", "follow", "accompany", "attack", "defeat",
    "kill", "slay", "capture", "free", "receive", "lose", "steal",
    "join", "help", "serve", "lead", "betray", "visit", "reach",
    "arrive", "talk", "whisper", "say", "reply", "answer",
)

ADJ_SUFFIX_PATTERN = r"(ous|ful|ive|less|able|ible)$"
VERB_SUFFIX_PATTERN = r"(ed|ing)$"
ADV_SUFFIX = "ly"
ADV_MIN_LEN = 4          # '*ly' words shorter than this are not adverbs
VERB_SUFFIX_MIN_LEN = 5

# clause-depth analog (reference _calculate_clause_depth walks dependency
# arcs, metrics.py:190-208; the deterministic analog counts subordinate-
# clause markers)
SUBORDINATORS: tuple[str, ...] = (
    "because", "although", "though", "while", "when", "whenever",
    "since", "if", "unless", "until", "that", "which", "who", "whom",
    "whose", "where", "after", "before",
)

# passive analog (reference _detect_voice uses nsubjpass,
# metrics.py:211-230): be-auxiliary + participle
PASSIVE_PATTERN = (
    r"\b(?:was|were|is|are|be|been|being)\s+(?:\w+ed|\w+en)\b")


def _inflections(lemma: str) -> list[str]:
    """s / ed / ing inflections with basic orthography (doubling and
    e-drop are NOT modeled — the artifact is a fixed deterministic list,
    not a morphology engine)."""
    forms = [lemma, lemma + "s"]
    if lemma.endswith("e"):
        forms += [lemma + "d", lemma[:-1] + "ing"]
    elif lemma.endswith("y"):
        forms += [lemma[:-1] + "ied", lemma + "ing"]
    else:
        forms += [lemma + "ed", lemma + "ing"]
    return forms


def build_model(lang: str = "en") -> dict:
    """Build the serializable model artifact (pure function of the rule
    constants)."""
    verbs = sorted({f for lm in VERB_LEMMAS for f in _inflections(lm)}
                   | set(vocab.SPEECH_VERBS))
    return {
        "version": MODEL_VERSION,
        "lang": lang,
        "other": sorted(CLOSED_OTHER),
        "adv": sorted(ADV_WORDS),
        "adj": sorted(ADJ_WORDS),
        "verb": verbs,
        "subordinators": sorted(SUBORDINATORS),
        "det": sorted(DETERMINERS),
    }


def model_path(lang: str = "en") -> str:
    return os.path.join(MODEL_CACHE, f"pos_{lang}_v{MODEL_VERSION}.json")


def ensure_model(lang: str = "en") -> str:
    """Serialize the model artifact once (atomic write); returns path."""
    path = model_path(lang)
    if not os.path.exists(path):
        os.makedirs(MODEL_CACHE, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(build_model(lang), f)
        os.replace(tmp, path)
    return path


class PosTagger:
    """The per-language stateful model: loads the serialized artifact and
    builds lookup structures + compiled patterns ONCE (per actor, via the
    owning stage's ``__init__`` — never per batch)."""

    def __init__(self, lang: str = "en"):
        with open(ensure_model(lang)) as f:
            m = json.load(f)
        self.lang = m["lang"]
        self.other = frozenset(m["other"])
        self.adv = frozenset(m["adv"])
        self.adj = frozenset(m["adj"])
        self.verb = frozenset(m["verb"])
        self.subordinators = frozenset(m["subordinators"])
        self.det = frozenset(m["det"])
        self.adj_suffix_re = re.compile(ADJ_SUFFIX_PATTERN)
        self.verb_suffix_re = re.compile(VERB_SUFFIX_PATTERN)
        self.passive_re = re.compile(PASSIVE_PATTERN, re.IGNORECASE)

    def tag(self, w: str) -> str:
        """Tag one lowercased word — the ladder the oracle SQL mirrors."""
        if w in self.other:
            return "OTHER"
        if w in self.adv or (len(w) >= ADV_MIN_LEN and w.endswith(ADV_SUFFIX)):
            return "ADV"
        if w in self.adj or self.adj_suffix_re.search(w):
            return "ADJ"
        if w in self.verb or (len(w) >= VERB_SUFFIX_MIN_LEN
                              and self.verb_suffix_re.search(w)):
            return "VERB"
        return "NOUN"

    def sentence_features(self, text: str, words_lower: list[str]) -> dict:
        """M14 model-tier features for one sentence."""
        n_noun = n_verb = n_adj = n_adv = 0
        clause = 0
        for w in words_lower:
            t = self.tag(w)
            if t == "NOUN":
                n_noun += 1
            elif t == "VERB":
                n_verb += 1
            elif t == "ADJ":
                n_adj += 1
            elif t == "ADV":
                n_adv += 1
            if w in self.subordinators:
                clause += 1
        n_passive = len(self.passive_re.findall(text))
        if n_passive > 0 and n_verb > n_passive:
            voice = "mixed"
        elif n_passive > 0:
            voice = "passive"
        else:
            voice = "active"
        return {"noun_count": n_noun, "verb_count": n_verb,
                "adj_count": n_adj, "adv_count": n_adv,
                "clause_depth": clause, "voice": voice,
                "passive_count": n_passive}
