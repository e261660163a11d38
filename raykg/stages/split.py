"""Split stage: corpus rows → unit rows (the reference's passage explode).

Transposes ``ingest/splitter.py`` (reference):

* chapter detection  — ``split_into_chapters``  (splitter.py:81-124):
  EXACT reference semantics — all four header families, IGNORECASE,
  non-empty-body keep + sequential renumbering, >100-char preamble →
  "Prologue" first.  Parity vs the reference code run in-process on real
  prose is pinned by tests/test_ref_parity.py.
* paragraph split    — ``split_into_paragraphs`` (splitter.py:127-136)
* sentence split     — ``split_into_sentences`` (splitter.py:139-170):
  normalize whitespace, protect the reference's abbreviation set
  case-insensitively (canonical-case substitution — reference behavior),
  split after ``[.!?]`` before a capital/quote.
* stable unit ids    — ``generate_passage_id`` (splitter.py:173-178), made
  parallel-safe + order-stable:
  ``{sha256(content)[:12]}_c{ch:03d}_p{par:05d}_s{sent:03d}``.

Code files (``lang != 'txt'``) split into top-level blocks (blank-line
separated), one unit per block — the file→top-level-decl transposition the
north star asks for.

All regexes are RE2-compatible (no lookaround) so the DuckDB oracle SQL uses
the *same* pattern constants (see ``raykg/pipelines/oracle.py``).
"""

from __future__ import annotations

import re

import pyarrow as pa

from raykg import vocab
from raykg.functions.textnorm import normalize_ws, sha256_hex

MAX_SENTENCE_LEN = 1000          # reference config.py:38-39 (F1 filter)

# Shared pattern constants (mirrored in oracle SQL — keep in sync!)
SENT_BOUNDARY_PATTERN = r'([.!?])\s+(["A-Z])'
PARA_SPLIT_PATTERN = r"\n\s*\n+"
# EXACT reference chapter alternation (splitter.py:88-97): four families
# joined, MULTILINE | IGNORECASE.
CHAPTER_HEADER_PATTERN = "|".join(
    f"({p})" for p in vocab.CHAPTER_PATTERNS)

DOT_SENTINEL = "\x1e"
SPL_SENTINEL = "\x1f"

# one compiled matcher per abbreviation — the reference substitutes the
# CANONICAL casing back (splitter.py:155-156), so each needs its own
# replacement string.  The reference leaves "i.e"/"e.g" dots unescaped
# (``.`` = any char); we reproduce that byte-for-byte.
_ABBREV_RES: tuple[tuple[re.Pattern, str], ...] = tuple(
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), abbr + DOT_SENTINEL)
    for abbr in vocab.ABBREVIATIONS)
# ONE combined alternation in list order — equivalent to the sequential
# per-abbreviation passes (matches never overlap a replacement: the
# sentinel breaks any later "<abbr>\." match) but 18× fewer scans of the
# text; sequential re.sub was 60% of the units stage's CPU.  The repl
# restores canonical casing via lookup; the any-char dot of "i.e"/"e.g"
# can match variant text, resolved by fullmatching those patterns.
_ABBREV_COMBINED = re.compile(
    rf"\b({'|'.join(vocab.ABBREVIATIONS)})\.", re.IGNORECASE)
_ABBREV_CANON = {a.lower(): a for a in vocab.ABBREVIATIONS}
_ABBREV_DOTTED = tuple((re.compile(rf"{a}\Z", re.IGNORECASE), a)
                       for a in vocab.ABBREVIATIONS if "." in a)


def _abbrev_repl(m: re.Match) -> str:
    g = m.group(1)
    canon = _ABBREV_CANON.get(g.lower())
    if canon is None:
        for rx, a in _ABBREV_DOTTED:
            if rx.match(g):
                canon = a
                break
        else:                      # unreachable: alternation matched
            canon = g
    return canon + DOT_SENTINEL
_SENT_RE = re.compile(SENT_BOUNDARY_PATTERN)
_PARA_RE = re.compile(PARA_SPLIT_PATTERN)
_CHAPTER_RE = re.compile(CHAPTER_HEADER_PATTERN,
                         re.MULTILINE | re.IGNORECASE)


def split_sentences(text: str) -> list[str]:
    """Sentence split with abbreviation protection (splitter.py:139-170):
    normalize whitespace, protect abbreviations case-insensitively
    (substituting canonical case — reference behavior), split after
    ``[.!?]`` before a capital or straight double quote."""
    t = normalize_ws(text)
    t = _ABBREV_COMBINED.sub(_abbrev_repl, t)
    t = _SENT_RE.sub(r"\1" + SPL_SENTINEL + r"\2", t)
    out = []
    for s in t.split(SPL_SENTINEL):
        s = s.replace(DOT_SENTINEL, ".").strip()
        if s and len(s) <= MAX_SENTENCE_LEN:
            out.append(s)
    return out


def split_paragraphs(text: str) -> list[str]:
    """Paragraph split on blank lines (splitter.py:127-136)."""
    return [p.strip() for p in _PARA_RE.split(text) if p.strip()]


def split_chapters(text: str) -> list[tuple[int, str, str]]:
    """Chapter detection — EXACT reference semantics (splitter.py:81-124):
    non-empty chapter bodies keep their order; a >100-char preamble is
    inserted first as "Prologue"; numbering is sequential over the KEPT
    chapters starting at 1 (splitter.py:48); no headers (or nothing kept)
    → the whole text is chapter 1."""
    matches = list(_CHAPTER_RE.finditer(text))
    if not matches:
        return [(1, "Chapter 1", text)]
    kept: list[tuple[str, str]] = []
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        body = text[m.end(): end].strip()
        if body:
            kept.append((m.group(0).strip(), body))
    if matches[0].start() > 0:
        pre = text[: matches[0].start()].strip()
        if pre and len(pre) > 100:
            kept.insert(0, ("Prologue", pre))
    if not kept:
        return [(1, "Chapter 1", text)]
    return [(i + 1, t, b) for i, (t, b) in enumerate(kept)]


def split_doc(content: str, lang: str) -> list[tuple[int, int, int, int, str]]:
    """One document → [(chapter, paragraph, sentence, char_offset, text)].

    Prose: chapter→paragraph→sentence. Code: one chapter, one unit per
    blank-line-separated block. Paragraph/sentence numbering is 1-based and
    resets per chapter (reference splitter.py:34-78 ordering invariant).
    """
    units: list[tuple[int, int, int, int, str]] = []
    offset = 0
    if lang == "txt":
        for ch_num, _title, body in split_chapters(content):
            for p_num, para in enumerate(split_paragraphs(body), start=1):
                for s_num, sent in enumerate(split_sentences(para), start=1):
                    units.append((ch_num, p_num, s_num, offset, sent))
                    offset += len(sent) + 1
    else:
        for p_num, block in enumerate(split_paragraphs(content), start=1):
            units.append((1, p_num, 1, offset, block))
            offset += len(block) + 1
    return units


def unit_id_of(doc_sha: str, ch: int, par: int, sent: int) -> str:
    """Stable unit id, zero-padded so lexicographic order == document
    order (min(unit_id) = first sighting; '_p00002_' < '_p00010_')."""
    return f"{doc_sha[:12]}_c{ch:03d}_p{par:05d}_s{sent:03d}"


def split_units_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: corpus batch → units batch (1:N explode).

    Drops ``content`` (very wide rows stay out of downstream shuffles —
    SURVEY.md §7.4) and carries ``doc_sha256`` (north-rule invariant).
    """
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()

    out = {k: [] for k in ("doc_sha256", "repo", "path", "lang", "unit_id",
                            "chapter_num", "paragraph_num", "sentence_num",
                            "char_offset", "text")}
    for repo, path, lang, content in zip(repos, paths, langs, contents):
        sha = sha256_hex(content)
        for ch, par, sent, off, text in split_doc(content, lang):
            out["doc_sha256"].append(sha)
            out["repo"].append(repo)
            out["path"].append(path)
            out["lang"].append(lang)
            out["unit_id"].append(unit_id_of(sha, ch, par, sent))
            out["chapter_num"].append(ch)
            out["paragraph_num"].append(par)
            out["sentence_num"].append(sent)
            out["char_offset"].append(off)
            out["text"].append(text)

    return pa.table({
        "doc_sha256": pa.array(out["doc_sha256"], pa.string()),
        "repo": pa.array(out["repo"], pa.string()),
        "path": pa.array(out["path"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "unit_id": pa.array(out["unit_id"], pa.string()),
        "chapter_num": pa.array(out["chapter_num"], pa.int32()),
        "paragraph_num": pa.array(out["paragraph_num"], pa.int32()),
        "sentence_num": pa.array(out["sentence_num"], pa.int32()),
        "char_offset": pa.array(out["char_offset"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
    })


def units_dataset(corpus_ds):
    """corpus Dataset → units Dataset."""
    return corpus_ds.map_batches(split_units_batch, batch_format="pyarrow",
                                 batch_size=64, zero_copy_batch=True)
