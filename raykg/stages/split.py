"""Split stage: corpus rows → unit rows (the reference's passage explode).

Transposes ``ingest/splitter.py`` (reference):

* chapter detection  — ``split_into_chapters``  (splitter.py:81-124)
* paragraph split    — ``split_into_paragraphs`` (splitter.py:127-136)
* sentence split     — ``split_into_sentences`` (splitter.py:139-170):
  protect abbreviations, split after ``[.!?]`` before a capital/quote,
  normalize whitespace.
* stable unit ids    — ``generate_passage_id`` (splitter.py:173-178), made
  parallel-safe: ``{sha256(content)[:12]}_c{ch}_p{par}_s{sent}``.

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
ABBREV_PATTERN = r"\b(" + "|".join(vocab.ABBREVIATIONS) + r")\."
SENT_BOUNDARY_PATTERN = r'([.!?])\s+(["A-Z])'
PARA_SPLIT_PATTERN = r"\n\s*\n+"
CHAPTER_HEADER_PATTERN = r"(?:Chapter|CHAPTER|Part)\s+(?:\d+|[IVXLCDM]+)\b.*"

DOT_SENTINEL = "\x1e"
SPL_SENTINEL = "\x1f"

_ABBREV_RE = re.compile(ABBREV_PATTERN)
_SENT_RE = re.compile(SENT_BOUNDARY_PATTERN)
_PARA_RE = re.compile(PARA_SPLIT_PATTERN)
_CHAPTER_RE = re.compile(r"^" + CHAPTER_HEADER_PATTERN + r"$", re.MULTILINE)


def split_sentences(text: str) -> list[str]:
    """Sentence split with abbreviation protection (splitter.py:139-170)."""
    t = _ABBREV_RE.sub(r"\1" + DOT_SENTINEL, text)
    t = _SENT_RE.sub(r"\1" + SPL_SENTINEL + r"\2", t)
    out = []
    for s in t.split(SPL_SENTINEL):
        s = normalize_ws(s.replace(DOT_SENTINEL, "."))
        if s and len(s) <= MAX_SENTENCE_LEN:
            out.append(s)
    return out


def split_paragraphs(text: str) -> list[str]:
    """Paragraph split on blank lines (splitter.py:127-136)."""
    return [p.strip() for p in _PARA_RE.split(text) if p.strip()]


def split_chapters(text: str) -> list[tuple[int, str, str]]:
    """Chapter detection (splitter.py:81-124): returns (num, title, body).

    Preamble before the first header becomes chapter 0 ("Prologue") when
    longer than 100 chars; no headers → single chapter 1.
    """
    matches = list(_CHAPTER_RE.finditer(text))
    if not matches:
        return [(1, "Chapter 1", text)]
    chapters: list[tuple[int, str, str]] = []
    pre = text[: matches[0].start()].strip()
    if len(pre) > 100:
        chapters.append((0, "Prologue", pre))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        body = text[m.end(): end].strip()
        chapters.append((i + 1, normalize_ws(m.group(0)), body))
    return chapters


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
    return f"{doc_sha[:12]}_c{ch}_p{par}_s{sent}"


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
