"""Shallow NP/VP chunking over the per-language POS-lexicon model — the
"lightweight dependency-ish parser" tier of the R2 seam (reference
``extract/relationships.py:161-234`` runs a spaCy dependency parse per
passage; no parser ships in this sandbox, so the deterministic analog is
a regex chunker over the tag sequence the POS model emits).

Architecture is the ST1 north-star seam exercised for real: the model
artifact (word-class sets, inflection-expanded verbs, determiner subclass
— ``raykg/models/pos.py``, MODEL_VERSION 2) is deserialized and indexed
ONCE per actor in ``ChunkTagger.__init__``; ``__call__`` only tokenizes,
tags and pattern-matches.  Pass the CLASS to ``map_batches(ChunkTagger,
concurrency=N)``.

Chunk grammar (one char per token, matched non-overlapping left-to-right
— Python ``findall`` and DuckDB/RE2 ``regexp_extract_all`` agree by
construction, which is what makes the SQL oracle exact):

    tag chars:  D determiner · A adjective · N noun · V verb · R adverb
                · O other closed-class
    NP  =  D? A* N+        ("the old grey king")
    VP  =  R? V+           ("quickly rode", "was defeated")
"""

from __future__ import annotations

import re

import pyarrow as pa

from raykg.stages.fingerprint import WORD_PATTERN

NP_PATTERN = r"D?A*N+"
VP_PATTERN = r"R?V+"

#: POS ladder tag → chunk char (determiners are carved out of OTHER
#: before the ladder runs — see ChunkTagger.tag_chars)
TAG_CHAR = {"OTHER": "O", "ADV": "R", "ADJ": "A", "VERB": "V",
            "NOUN": "N"}


class ChunkTagger:
    """Actor-pool stage: per unit, the tag-char sequence and NP/VP chunk
    statistics.  Model load + pattern compile once per actor."""

    #: incremented per instantiation — tests assert once-per-actor init
    init_count = 0

    def __init__(self):
        from raykg.models.pos import PosTagger
        type(self).init_count += 1
        self.taggers = {"txt": PosTagger("en")}
        self.word_re = re.compile(WORD_PATTERN)
        self.np_re = re.compile(NP_PATTERN)
        self.vp_re = re.compile(VP_PATTERN)
        # memoized word → char map, pre-seeded with the closed classes so
        # the per-token hot path is one dict hit; suffix-rule words accrete
        # per actor (bounded by the corpus vocabulary)
        tg = self.taggers["txt"]
        self._chars: dict[str, str] = {w: "D" for w in tg.det}
        for w in tg.other - tg.det:
            self._chars[w] = "O"

    def _char(self, w: str) -> str:
        c = self._chars.get(w)
        if c is None:
            c = TAG_CHAR[self.taggers["txt"].tag(w)]
            self._chars[w] = c
        return c

    def tag_chars(self, text: str) -> str:
        return "".join(self._char(w.lower())
                       for w in self.word_re.findall(text))

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["lang"], "txt"))
        np_counts, vp_counts, max_np = [], [], []
        for text in t["text"].to_pylist():
            tags = self.tag_chars(text)
            nps = self.np_re.findall(tags)
            np_counts.append(len(nps))
            vp_counts.append(len(self.vp_re.findall(tags)))
            max_np.append(max(map(len, nps), default=0))
        return pa.table({
            "unit_id": t["unit_id"],
            "repo": t["repo"],
            "np_count": pa.array(np_counts, pa.int64()),
            "vp_count": pa.array(vp_counts, pa.int64()),
            "max_np_len": pa.array(max_np, pa.int64()),
        })
