"""Per-language extractor registry — §2.9 user-extension surface.

The reference threads language/config switches through every extractor
(seed dirs, ``use_llm``, provider env — SURVEY §2.9); the engine equivalent
the survey calls for is "a per-language extractor registry for the mention
actor".  This module is that registry:

* prose: one extractor per prose language (``txt`` →
  :class:`raykg.stages.extract.UnitExtractor`); register alternatives for
  other natural languages.
* code: one extractor per source language (``py`` →
  :class:`raykg.stages.extract.CodeExtractor`); register per-language
  parsers for new languages.

:class:`DispatchCodeExtractor` is what the pipeline actually maps over
corpus rows: it routes each row to the extractor registered for its
``lang`` column, constructing one extractor instance per language PER
ACTOR (heavy per-language state loads once, ST1).  Rows in languages with
no registered extractor emit nothing and are counted in the actor's
``skipped`` tally (visible in Ray logs) — never a crash, mirroring the
reference's graceful degradation.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

import pyarrow as pa

from raykg.stages import extract as ex

logger = logging.getLogger(__name__)

PROSE_LANG = "txt"

# lang → zero-arg factory returning a batch-callable (pa.Table → pa.Table
# in the unified extract row schema, extract._OUT_SCHEMA)
_CODE_EXTRACTORS: dict[str, Callable[[], Callable]] = {}
_PROSE_EXTRACTORS: dict[str, Callable[[], Callable]] = {}


def register_code_extractor(lang: str,
                            factory: Callable[[], Callable]) -> None:
    _CODE_EXTRACTORS[lang] = factory


def register_prose_extractor(lang: str,
                             factory: Callable[[], Callable]) -> None:
    _PROSE_EXTRACTORS[lang] = factory


def registered_langs() -> dict[str, list[str]]:
    return {"prose": sorted(_PROSE_EXTRACTORS),
            "code": sorted(_CODE_EXTRACTORS)}


register_code_extractor("py", ex.CodeExtractor)
register_prose_extractor(PROSE_LANG, ex.UnitExtractor)


class DispatchCodeExtractor:
    """Actor-pool callable over corpus rows: per-language dispatch.

    Builds each language's extractor lazily, once per actor.  Unregistered
    code languages are skipped (logged once per language per actor).
    """

    def __init__(self) -> None:
        self._by_lang: dict[str, Callable] = {}
        self._warned: set[str] = set()

    def _extractor(self, lang: str):
        if lang not in self._by_lang:
            factory = _CODE_EXTRACTORS.get(lang)
            self._by_lang[lang] = factory() if factory else None
        return self._by_lang[lang]

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = batch["lang"]
        uniq = [str(v) for v in langs.unique() if str(v) != PROSE_LANG]
        parts: list[pa.Table] = []
        import pyarrow.compute as pc
        for lang in uniq:
            fn = self._extractor(lang)
            if fn is None:
                if lang not in self._warned:
                    self._warned.add(lang)
                    logger.warning(
                        "no code extractor registered for lang=%r — "
                        "skipping its rows (register one via "
                        "raykg.stages.registry.register_code_extractor)",
                        lang)
                continue
            parts.append(fn(batch.filter(pc.equal(langs, lang))))
        if not parts:
            return ex._rows_to_table([])
        return pa.concat_tables(parts)
