"""Closed vocabularies shared by the generator, the Ray stages and the SQL oracles.

Semantics transposed from the reference (tflynn3/book-graph-analyzer):

* ``PREDICATES`` mirrors the closed 45-value ``RelationshipType`` enum
  (reference ``models/relationships.py:7-67``) — unknown predicates coerce to
  ``RELATED_TO`` (reference ``extract/relationships.py:353-356``).
* ``VERB_PHRASE_TO_PRED`` is the deterministic, surface-form analog of the
  reference's lemma→type map (``extract/relationships.py:24-86``).  We have no
  dependency parser in the deterministic path, so the map keys are inflected
  verb phrases matched by regex SVO patterns (reference pattern-extraction
  analog, ``lore/events.py:621-646``).
* ``CAP_BLOCKLIST`` plays the role of the reference's sentence-start /
  stop-word filtering when detecting proper-noun mentions
  (``voice/dialogue.py:280-296`` blocklist idea).
* ``ABBREVIATIONS`` mirrors the splitter's protected-abbreviation list
  (``ingest/splitter.py:139-170``).
* ``CODE_PREDICATES`` is the code-domain predicate vocabulary required by the
  north star (imports / definitions / call sites).

Everything here is a plain constant so the DuckDB oracle SQL can be built
from the *same* strings — no drift between engine and oracle.
"""

from __future__ import annotations

# --- Predicate vocabulary (closed enum, reference models/relationships.py:7-67) ---
PREDICATES: tuple[str, ...] = (
    # character interactions
    "SPOKE_WITH", "SPOKE_TO", "TRAVELED_WITH", "FOUGHT", "FOUGHT_AGAINST",
    "ALLIED_WITH", "BETRAYED", "HELPED", "CAPTURED", "FREED", "KILLED", "MET",
    # family / social
    "PARENT_OF", "CHILD_OF", "SIBLING_OF", "MARRIED_TO", "FRIEND_OF",
    "ENEMY_OF", "SERVES", "LEADS",
    # object interactions
    "POSSESSES", "POSSESSED", "GAVE", "RECEIVED", "FOUND", "LOST", "CREATED",
    "DESTROYED", "USED", "STOLE",
    # location interactions
    "TRAVELED_TO", "TRAVELED_FROM", "LIVES_IN", "VISITED", "ENTERED", "LEFT",
    "RULES", "GUARDS",
    # place-place
    "LOCATED_IN", "NEAR",
    # events
    "PARTICIPATED_IN", "WITNESSED", "CAUSED",
    # generic
    "MENTIONED_WITH", "RELATED_TO",
)

FALLBACK_PREDICATE = "RELATED_TO"

# --- Surface verb phrase → predicate (analog of extract/relationships.py:24-86) ---
VERB_PHRASE_TO_PRED: dict[str, str] = {
    # speech
    "spoke to": "SPOKE_TO", "told": "SPOKE_TO", "asked": "SPOKE_TO",
    "answered": "SPOKE_TO", "called to": "SPOKE_TO", "whispered to": "SPOKE_TO",
    "spoke with": "SPOKE_WITH", "talked with": "SPOKE_WITH",
    # movement
    "went to": "TRAVELED_TO", "traveled to": "TRAVELED_TO",
    "came to": "TRAVELED_TO", "reached": "TRAVELED_TO", "arrived at": "TRAVELED_TO",
    "entered": "ENTERED", "left": "LEFT", "fled": "LEFT", "escaped": "LEFT",
    "followed": "TRAVELED_WITH", "accompanied": "TRAVELED_WITH",
    # combat
    "fought": "FOUGHT", "attacked": "FOUGHT_AGAINST", "defeated": "FOUGHT_AGAINST",
    "killed": "KILLED", "slew": "KILLED", "captured": "CAPTURED", "freed": "FREED",
    # objects
    "gave": "GAVE", "received": "RECEIVED", "took": "POSSESSES",
    "found": "FOUND", "lost": "LOST", "stole": "STOLE", "used": "USED",
    "carried": "POSSESSES", "wore": "POSSESSES", "wielded": "POSSESSES",
    # social
    "met": "MET", "joined": "ALLIED_WITH", "helped": "HELPED",
    "served": "SERVES", "led": "LEADS", "betrayed": "BETRAYED",
    # location / place
    "lived in": "LIVES_IN", "dwelt in": "LIVES_IN", "visited": "VISITED",
    "ruled": "RULES", "guarded": "GUARDS",
    # creation
    "created": "CREATED", "forged": "CREATED", "destroyed": "DESTROYED",
}

# Longest-first so regex alternation is unambiguous in both re and RE2 (DuckDB).
VERB_PHRASES_ORDERED: tuple[str, ...] = tuple(
    sorted(VERB_PHRASE_TO_PRED, key=lambda v: (-len(v), v))
)

# --- Titles (reference extract/ner.py:34-44 TITLE_PATTERNS analog) ---
TITLES: tuple[str, ...] = (
    "King", "Queen", "Lord", "Lady", "Prince", "Princess", "Chief",
    "Captain", "Steward",
)

# --- Capitalised tokens that are never proper-noun mentions ---
# Covers template sentence-starts, eras, titles and common function words.
CAP_BLOCKLIST: tuple[str, ...] = (
    "A", "An", "The", "In", "On", "At", "Of", "To", "And", "But", "Or", "It",
    "He", "She", "They", "We", "You", "I", "His", "Her", "Their", "Then",
    "There", "When", "While", "After", "Before", "Now", "Soon", "Thus", "So",
    "Yet", "No", "Not", "Only", "By", "Chapter", "Part", "Prologue",
    "Epilogue",
    "First", "Second", "Third", "Fourth", "Age", "Year",
    "Mr", "Mrs", "Dr", "St", "Prof",
) + TITLES

# --- Sentence-splitter protected abbreviations (ingest/splitter.py:148-152).
# EXACT reference set, matched case-insensitively; the reference substitutes
# the canonical casing back ("MR." → "Mr.") — a deliberate behavioral match.
ABBREVIATIONS: tuple[str, ...] = (
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "vs", "etc",
    "i.e", "e.g", "cf", "al", "St", "Mt", "Ft",
)

# --- Chapter header families (ingest/splitter.py:88-94) — EXACT reference
# pattern strings, applied MULTILINE | IGNORECASE as one alternation.  Note
# the reference quirks these patterns carry (and parity tests pin): the
# trailing ``\s*.*`` lets a header consume the following line across a
# blank line, and IGNORECASE admits lowercase "chapter iv" headers.
CHAPTER_PATTERNS: tuple[str, ...] = (
    r"^(Chapter\s+[IVXLC\d]+[:\.]?\s*.*)$",
    r"^(CHAPTER\s+[IVXLC\d]+[:\.]?\s*.*)$",
    r"^(\d+\.\s+.+)$",
    r"^(Part\s+[IVXLC\d]+[:\.]?\s*.*)$",
)

# --- Pattern-tier NER families (extract/ner.py:34-44) — EXACT reference
# constants (titles + epithets), matched IGNORECASE, label PERSON, conf 0.9.
NER_TITLE_PATTERNS: tuple[str, ...] = (
    r"\b(King|Queen|Lord|Lady|Prince|Princess|Chief|Captain|Steward)\s+(?:of\s+)?([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)",
    r"\b(the\s+)?(Grey|White|Dark|Black|High|Great)\s+(Wizard|King|Lord|Lady|Enemy|Rider)",
)
NER_EPITHET_PATTERNS: tuple[str, ...] = (
    r"\b(the\s+)?(Ring-?bearer|Halfling|Perian|Dwarf-friend|Elf-friend)",
    r"\b(the\s+)?(Necromancer|Enemy|Dark Lord|Shadow)",
    r"\b(Gandalf|Saruman|Radagast)\s+(the\s+)?(Grey|White|Brown)",
)
NER_PATTERNS: tuple[str, ...] = NER_TITLE_PATTERNS + NER_EPITHET_PATTERNS

# --- Eras (reference lore/temporal.py:17-64 — total order) ---
ERAS: tuple[str, ...] = ("First", "Second", "Third", "Fourth")
ERA_ORDER: dict[str, int] = {e: i for i, e in enumerate(ERAS)}

# --- Speech verbs for dialogue attribution (voice/dialogue.py:16-76) —
# EXACT reference vocabulary.  The reference keeps these in a set and joins
# them into a regex alternation in arbitrary set order; alternation order
# is behavior-neutral there (regex backtracking resolves prefix overlaps
# like call/called), so we store them longest-first for determinism.
SPEECH_VERBS: tuple[str, ...] = tuple(sorted({
    "said", "says", "say", "saying",
    "asked", "asks", "ask", "asking",
    "replied", "replies", "reply", "replying",
    "answered", "answers", "answer", "answering",
    "whispered", "whispers", "whisper",
    "shouted", "shouts", "shout",
    "cried", "cries", "cry",
    "called", "calls", "call",
    "yelled", "yells", "yell",
    "screamed", "screams", "scream",
    "muttered", "mutters", "mutter",
    "murmured", "murmurs", "murmur",
    "growled", "growls", "growl",
    "hissed", "hisses", "hiss",
    "snarled", "snarls", "snarl",
    "snapped", "snaps", "snap",
    "groaned", "groans", "groan",
    "moaned", "moans", "moan",
    "sighed", "sighs", "sigh",
    "laughed", "laughs", "laugh",
    "chuckled", "chuckles", "chuckle",
    "giggled", "giggles", "giggle",
    "sobbed", "sobs", "sob",
    "wailed", "wails", "wail",
    "declared", "declares", "declare",
    "announced", "announces", "announce",
    "proclaimed", "proclaims", "proclaim",
    "exclaimed", "exclaims", "exclaim",
    "stated", "states", "state",
    "inquired", "inquires", "inquire",
    "queried", "queries", "query",
    "demanded", "demands", "demand",
    "wondered", "wonders", "wonder",
    "begged", "begs", "beg",
    "pleaded", "pleads", "plead",
    "urged", "urges", "urge",
    "insisted", "insists", "insist",
    "suggested", "suggests", "suggest",
    "proposed", "proposes", "propose",
    "explained", "explains", "explain",
    "told", "tells", "tell",
    "informed", "informs", "inform",
    "added", "adds", "add",
    "continued", "continues", "continue",
    "went on",
    "spake", "quoth", "cried out",
}, key=lambda v: (-len(v), v)))

# --- Tier-4 attribution non-name blocklist (voice/dialogue.py:280-296) —
# EXACT reference set.
DIALOGUE_NON_NAMES: frozenset[str] = frozenset({
    "he", "she", "it", "they", "we", "i", "you",
    "him", "her", "them", "us", "me",
    "the", "a", "an", "this", "that", "these", "those",
    "but", "and", "or", "then", "so", "yet", "for",
    "to", "from", "with", "at", "by", "in", "on", "of", "after", "before",
    "there", "here", "where", "when", "what", "how", "why",
    "now", "just", "still", "even", "also",
    "one", "all", "some", "any", "no", "not", "only",
    "old", "young", "little", "other", "first", "last",
})

# --- Voice-profile lexicons (voice/profile.py:105-112,117-123,178-186) —
# EXACT reference sets.
FIRST_PERSON_WORDS: frozenset[str] = frozenset({
    "i", "me", "my", "mine", "myself", "i'm", "i've", "i'll", "i'd"})
SECOND_PERSON_WORDS: frozenset[str] = frozenset({
    "you", "your", "yours", "yourself", "you're", "you've", "you'll",
    "you'd"})
CONTRACTION_PATTERNS: tuple[str, ...] = (
    "n't", "'s", "'re", "'ve", "'ll", "'d", "'m")
VOICE_ARCHAISMS: tuple[str, ...] = (
    "thee", "thou", "thy", "thine", "ye", "hath", "doth", "art", "wast",
    "wherefore", "hither", "thither", "whither", "hence", "thence",
    "ere", "nay", "aye", "yea", "behold", "lo", "alas", "forsooth",
    "methinks", "mayhap", "perchance", "betwixt", "amongst", "whilst",
    "verily", "hark", "hearken", "tarry", "prithee",
)
VOICE_STOPWORDS: frozenset[str] = frozenset({
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "do", "does", "did", "will", "would", "could",
    "should", "may", "might", "must", "shall", "can", "that", "this",
    "it", "its", "as", "if", "not", "no", "so", "up", "out", "about"})

# --- Code-domain predicate vocabulary (north-star transposition) ---
CODE_PREDICATES: tuple[str, ...] = ("IMPORTS", "IMPORTS_FROM", "DEFINES", "CALLS", "ALIASES")

# --- Style: archaisms (style/metrics.py:33-41 analog, fixed 24-word list) ---
ARCHAISMS: tuple[str, ...] = (
    "thou", "thee", "thy", "thine", "hath", "doth", "ere", "oft", "nay",
    "yea", "wherefore", "hither", "thither", "whence", "betwixt", "amidst",
    "unto", "upon", "verily", "forsooth", "alas", "behold", "henceforth",
    "naught",
)

# --- Function words for vocabulary profile / Burrows' Delta (style/metrics.py:101-121) ---
FUNCTION_WORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "a", "in", "that", "was", "he", "it", "his",
    "is", "with", "as", "for", "had", "they", "but", "at", "on", "be", "not",
    "by", "this", "from", "or", "she", "her", "him", "an", "were", "which",
    "all", "their", "there", "when", "who", "will", "more", "no", "if",
    "out", "so", "said", "what", "up", "its", "about", "into", "than",
)

# --- Stopwords for voice profiles / quality scoring ---
STOPWORDS: frozenset[str] = frozenset(
    w.lower() for w in FUNCTION_WORDS
) | {"i", "you", "we", "them", "then", "now", "very", "one", "two", "must", "shall"}

# --- World-bible categorizer (worldbible/patterns.py:35-105 analog) ---
# Per-category keyword lists (lowercase word match, ×WB_KEYWORD_WEIGHT each)
# plus rule-shaped sentence patterns (×WB_RULE_WEIGHT) — the deterministic
# transposition of the reference's category regex scorers.
WB_CATEGORIES: dict[str, tuple[str, ...]] = {
    "culture": ("custom", "oath", "honor", "folk", "tradition"),
    "geography": ("enter", "leave", "dark", "beyond", "gate"),
    "history": ("ancient", "age", "year", "era", "old"),
    "magic": ("wield", "wielded", "forged", "rune", "power"),
}
WB_RULE_PATTERNS: tuple[str, ...] = (
    r"Only [A-Z][a-z]+ (?:can|may) \w+",
    r"[Nn]o one (?:can|may|shall) \w+",
    r"must never \w+",
    r"always \w+",
)
WB_KEYWORD_WEIGHT = 0.2
WB_RULE_WEIGHT = 0.3
WB_THRESHOLD = 0.3

# --- A16 culture/magic/geography grouping (worldbible/extractor.py:302-416)
# Folk-group extraction — the code-corpus analog of the reference's
# peoples_keywords table ("the folk of <Place>" phrases group culture
# passages the way hobbit/elf/dwarf keywords do in the reference).
WB_FOLK_PATTERN = r"folk of ([A-Z][a-z]+)"
# EXACT reference location pattern (extractor.py:389-392)
WB_LOC_PATTERN = (
    r"(the\s+)?([\w\s]+)\s+(is|was|lies|stands?)\s+(in|on|near|by|at)\s+")
# EXACT reference substring word lists (extractor.py:366-370)
WB_MAGIC_LIMIT_WORDS: tuple[str, ...] = ("cannot", "forbidden")
WB_MAGIC_ABILITY_WORDS: tuple[str, ...] = ("can", "able", "power")
WB_MIN_CULTURE_PASSAGES = 2          # extractor.py:327
WB_MAGIC_TOP = 5                     # extractor.py:375-376
WB_GEO_LIMIT = 20                    # extractor.py:416
