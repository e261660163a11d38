"""Reference parity on REAL prose: run the reference's own pure-regex code
in-process (tests/ref_oracle.py) against the engine's prose stages on real
Hobbit ch.1 text assembled from the reference's shipped outputs.

This closes the round-1 self-referential-oracle loop: the synthetic-corpus
DuckDB oracle shares regex constants with the engine (proves distributed
plumbing), while THESE tests prove the stage semantics match the reference
implementation itself on text neither side generated.

North-star gate: P/R >= 0.95 vs reference pattern-path output
(VERDICT.md round-1 item 1).  All assertions below are exact or >= 0.95.
"""

from __future__ import annotations

import pytest

from raykg.stages import dialogue as dlg
from raykg.stages import extract as ex
from raykg.stages import split as sp

ref_oracle = pytest.importorskip("ref_oracle")

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not present")


@pytest.fixture(scope="module")
def real_text() -> str:
    text = ref_oracle.real_prose()
    assert len(text) > 10_000, "fixture should be substantial real prose"
    return text


def _pr(ref_set, mine_set):
    inter = len(ref_set & mine_set)
    p = inter / max(1, len(mine_set))
    r = inter / max(1, len(ref_set))
    return p, r


def test_split_parity_exact(real_text):
    """Engine split == reference split_into_passages, including chapter /
    paragraph / sentence numbering (Prologue insertion, empty-chapter
    renumbering, header line-eating quirk, abbreviation case folding)."""
    ref = [(p.chapter_num, p.paragraph_num, p.sentence_num, p.text)
           for p in ref_oracle.ref_split(real_text, "fixture")]
    mine = [(c, pn, sn, t) for c, pn, sn, _off, t in
            sp.split_doc(real_text, "txt")]
    assert len(ref) > 100
    p, r = _pr(set(ref), set(mine))
    assert p >= 0.95 and r >= 0.95
    assert ref == mine          # currently byte-exact, ordered


def test_ner_pattern_parity_exact(real_text):
    """Engine pattern tier + overlap dedup == reference
    _extract_patterns + _deduplicate, span-for-span, per sentence unit."""
    tot_r = tot_m = inter = 0
    for _c, _p, _s, _off, text in sp.split_doc(real_text, "txt"):
        ref = {(e.start_char, e.end_char, e.text, e.label)
               for e in ref_oracle.ref_pattern_entities(text)}
        mine = {(s, e, t, l) for s, e, _cf, t, l in
                ex.dedup_overlapping_spans(ex.pattern_entities(text))}
        tot_r += len(ref)
        tot_m += len(mine)
        inter += len(ref & mine)
    assert tot_r >= 15          # fixture must exercise the patterns
    p, r = inter / max(1, tot_m), inter / max(1, tot_r)
    assert p >= 0.95 and r >= 0.95
    assert inter == tot_r == tot_m      # currently exact


def test_dialogue_parity_exact(real_text):
    """Engine quote extraction + 4-tier attribution == reference
    extract_dialogue(nlp=None): quote text, speaker, speech verb and
    question/exclamation flags, per sentence unit, in order."""
    tot = agree = 0
    for _c, _p, _s, _off, text in sp.split_doc(real_text, "txt"):
        r = ref_oracle.ref_dialogue(text)
        ref_lines = [(ln.text, ln.speaker, ln.speech_verb,
                      ln.is_question, ln.is_exclamation)
                     for ln in r.dialogue_lines]
        mine = []
        for content, s, e in dlg.extract_quotes(text):
            spk, verb, _conf, _tier = dlg.attribute_speaker(text, s, e)
            mine.append((content,
                         None if spk == "UNKNOWN" else spk,
                         verb or None,
                         content.rstrip().endswith("?"),
                         content.rstrip().endswith("!")))
        assert len(ref_lines) == len(mine)
        tot += len(ref_lines)
        agree += sum(1 for a, b in zip(ref_lines, mine) if a == b)
    assert tot >= 30
    assert agree / tot >= 0.95
    assert agree == tot                 # currently exact


def test_dialogue_single_quote_parity(real_text):
    """Single-quoted dialogue fixture: the reference's scan loop covers
    only quote_patterns[:2] (voice/dialogue.py:162, 'Focus on double
    quotes'), so single-quoted prose yields ZERO reference spans — and the
    engine's DEFAULT path matches that byte-exactly.  The engine's
    extended tiers 3-6 (the patterns the reference defines at :148-156
    but never scans) DO extract them, with the declared double-quote
    preference."""
    fixtures = [
        "'We must go at once,' said Aldric.",
        "‘Hold the gate!’ cried Belmor.",
        "â€œwho walks there?â€ asked Tor.",
    ]
    for text in fixtures:
        r = ref_oracle.ref_dialogue(text)
        assert r.dialogue_lines == []            # reference: nothing
        assert dlg.extract_quotes(text) == []    # default path: parity
        ext = dlg.extract_quotes_all(text)       # extended: extracts
        assert len(ext) == 1 and ext[0][3] in (3, 4, 6)
        spk, _v, conf, tier = dlg.attribute_speaker(
            text, ext[0][1], ext[0][2])
        assert tier == 1 and conf == 0.9
        assert spk in ("Aldric", "Belmor", "Tor")
    # double-quote preference: a double-quoted unit never yields
    # single-quote spans even when apostrophes could pair up
    mixed = '"We can\'t stay, it isn\'t safe," said Aldric.'
    assert [q[3] for q in dlg.extract_quotes_all(mixed)] == [1]
    ref_mixed = ref_oracle.ref_dialogue(mixed)
    assert [ln.text for ln in ref_mixed.dialogue_lines] == \
        [q[0] for q in dlg.extract_quotes_all(mixed)]


def test_dialogue_attribution_confidences(real_text):
    """Attribution confidences match the reference tier constants."""
    ref_mod = ref_oracle.dialogue()
    for _c, _p, _s, _off, text in sp.split_doc(real_text, "txt"):
        r = ref_oracle.ref_dialogue(text)
        for ln, (content, s, e) in zip(r.dialogue_lines,
                                       dlg.extract_quotes(text)):
            _spk, _v, conf, _tier = dlg.attribute_speaker(text, s, e)
            assert conf == pytest.approx(ln.attribution_confidence)
    assert ref_mod is not None


def test_classifier_parity_exact(real_text):
    """M13 six-scorer passage classification == reference classify_passage
    on every real-prose unit: primary type, secondary type, and all five
    exposed scores (engine computes closed-form products; the reference
    accumulates sequentially — equal to float ulps)."""
    from raykg.ops import unittype as ut
    cl = ref_oracle.classifier()
    n = 0
    for _c, _p, _s, _off, text in sp.split_doc(real_text, "txt"):
        ref = cl.classify_passage(text)
        mine = ut.classify(text)
        assert mine["unit_type"] == ref.primary_type.value, text
        ref_secondary = (ref.secondary_type.value if ref.secondary_type
                         else "none")
        assert mine["secondary_type"] == ref_secondary, text
        assert mine["confidence"] == pytest.approx(ref.confidence, abs=1e-6)
        for field in ("dialogue", "action", "description", "travel",
                      "battle"):
            assert mine[f"{field}_score"] == pytest.approx(
                getattr(ref, f"{field}_score"), abs=1e-6), (field, text)
        n += 1
    assert n > 100
