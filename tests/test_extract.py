"""Extractor tests — ported shapes from reference tests/test_extract.py and
tests/test_relationships.py."""

import pyarrow as pa

from raykg import vocab
from raykg.stages import extract
from raykg.stages.link import fuzzy_candidates, resolve_key


def _unit_batch(texts, lang="txt"):
    n = len(texts)
    return pa.table({
        "unit_id": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "doc_sha256": pa.array(["s" * 64] * n, pa.string()),
        "repo": pa.array(["r"] * n, pa.string()),
        "path": pa.array(["p"] * n, pa.string()),
        "lang": pa.array([lang] * n, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


def _rows(tbl, kind):
    df = tbl.to_pandas()
    return df[df["kind"] == kind]


def test_mention_blocklist():
    out = extract.UnitExtractor()(_unit_batch(["The road was long."]))
    assert len(_rows(out, "mention")) == 0


def test_mention_basic_and_count():
    out = extract.UnitExtractor()(
        _unit_batch(["Aldric met Belmor. Aldric smiled."]))
    m = _rows(out, "mention").set_index("subj")
    assert set(m.index) == {"Aldric", "Belmor"}
    assert m.loc["Aldric", "n_occurrences"] == 2
    assert m.loc["Aldric", "label"] == "UNKNOWN"
    assert m.loc["Aldric", "confidence"] == extract.MENTION_CONF


def test_title_pattern_person():
    # reference ner.py:34-44 pattern tier: the WHOLE title match is the
    # PERSON mention (conf 0.9); the name token inside it is suppressed by
    # the overlap dedup (ner.py:262-290)
    # NOTE the reference quirk this pins: IGNORECASE makes the name group
    # ``[A-Z][a-z]+`` match lowercase words, so the match greedily extends
    # through following words until punctuation (same behavior observed on
    # real prose: "king under the mountain again").
    out = extract.UnitExtractor()(_unit_batch(["King Aldric rode on."]))
    m = _rows(out, "mention").set_index("subj")
    assert m.loc["King Aldric rode on", "label"] == "PERSON"
    assert m.loc["King Aldric rode on", "confidence"] == extract.PATTERN_CONF
    assert "Aldric" not in m.index


def test_svo_predicates():
    # reference tests/test_relationships.py:73-114
    cases = [
        ("Aldric spoke to Belmor.", "SPOKE_TO"),
        ("Aldric went to Mirewood.", "TRAVELED_TO"),
        ("Aldric killed Belmor.", "KILLED"),
        ("Aldric found the Sunstone.", "FOUND"),
    ]
    for text, pred in cases:
        out = extract.UnitExtractor()(_unit_batch([text]))
        r = _rows(out, "rel")
        assert len(r) == 1, text
        assert r["pred"].iloc[0] == pred


def test_no_rel_single_entity():
    out = extract.UnitExtractor()(_unit_batch(["Aldric slept."]))
    assert len(_rows(out, "rel")) == 0


def test_within_unit_rel_dedup():
    # reference extract/relationships.py:384-398 (R4)
    out = extract.UnitExtractor()(
        _unit_batch(["Aldric met Belmor and Aldric met Belmor."]))
    assert len(_rows(out, "rel")) == 1


def test_alias_statement():
    out = extract.UnitExtractor()(
        _unit_batch(["Aldric, also known as Stormcrow, rested."]))
    a = _rows(out, "alias_pair")
    assert len(a) == 1
    assert (a["subj"].iloc[0], a["obj"].iloc[0]) == ("Aldric", "Stormcrow")


def test_temporal_event():
    out = extract.UnitExtractor()(
        _unit_batch(["In the Second Age, year 796, Aldric destroyed the Sunstone."]))
    e = _rows(out, "event")
    assert len(e) == 1
    assert e["era"].iloc[0] == "Second" and e["year"].iloc[0] == 796
    r = _rows(out, "rel")
    assert r["pred"].iloc[0] == "DESTROYED"


def test_verb_map_contract():
    # reference tests/test_relationships.py:150-166 vocabulary contract
    required = {"spoke to": "SPOKE_TO", "went to": "TRAVELED_TO",
                "killed": "KILLED", "found": "FOUND", "met": "MET",
                "gave": "GAVE", "entered": "ENTERED", "visited": "VISITED",
                "served": "SERVES", "ruled": "RULES", "destroyed": "DESTROYED"}
    for verb, pred in required.items():
        assert vocab.VERB_PHRASE_TO_PRED[verb] == pred
    for pred in vocab.VERB_PHRASE_TO_PRED.values():
        assert pred in vocab.PREDICATES
        assert pred == pred.upper()


def test_overlap_dedup_prefers_conf_and_length():
    # reference tests/test_extract.py:38-51 via ner.py:262-290
    spans = [(0, 4, 0.7, "Gand", "UNKNOWN"),
             (0, 7, 0.9, "Gandalf", "PERSON")]
    kept = extract.dedup_overlapping_spans(spans)
    assert kept == [(0, 7, 0.9, "Gandalf", "PERSON")]
    # lower-confidence longer span does NOT replace
    spans = [(0, 7, 0.9, "Gandalf", "PERSON"),
             (0, 9, 0.5, "Gandalf x", "UNKNOWN")]
    kept = extract.dedup_overlapping_spans(spans)
    assert kept[0][3] == "Gandalf"


def test_resolve_exact_article_new():
    # reference tests/test_extract.py:98-138 shapes
    idx = {"gandalf": ("gandalf", "character", "Gandalf"),
           "mithrandir": ("gandalf", "character", "Gandalf"),
           "shire": ("shire", "place", "Shire")}
    assert resolve_key("gandalf", idx)[:4] == ("gandalf", "character", 1.0, False)
    assert resolve_key("mithrandir", idx)[0] == "gandalf"
    eid, etype, conf, is_new, _ = resolve_key("the shire", idx)
    assert (eid, conf, is_new) == ("shire", 0.95, False)
    eid, etype, conf, is_new, _ = resolve_key("tom bombadil", idx)
    assert is_new and eid == "tom_bombadil"


def test_fuzzy_candidates():
    out = fuzzy_candidates(["gandaf"], ["gandalf", "mirewood"])
    assert out and out[0][1] == "gandalf" and out[0][2] >= 85.0
    assert fuzzy_candidates(["zzz"], ["gandalf"]) == []


def test_code_extractor():
    content = ("# module m1\n"
               "import core\n"
               "import proto as prx\n"
               "\n"
               "def run_1():\n"
               "    core.load()\n"
               "    prx.send()\n"
               "\n"
               "def run_2():\n"
               "    run_1()\n")
    batch = pa.table({
        "repo": pa.array(["r"]), "path": pa.array(["src/m1.py"]),
        "commit": pa.array(["c"]), "lang": pa.array(["py"]),
        "content": pa.array([content]),
    })
    out = extract.CodeExtractor()(batch).to_pandas()
    rels = {(r.subj, r.pred, r.obj) for r in
            out[out["kind"] == "rel"].itertuples()}
    assert ("m1", "IMPORTS", "core") in rels
    assert ("m1", "IMPORTS", "proto") in rels
    assert ("m1", "ALIASES", "proto") in rels
    assert ("m1", "DEFINES", "m1.run_1") in rels
    assert ("m1.run_1", "CALLS", "core.load") in rels
    assert ("m1.run_1", "CALLS", "proto.send") in rels   # alias resolved
    assert ("m1.run_2", "CALLS", "m1.run_1") in rels     # local def call


def test_fuzzy_tier_wired_into_resolution():
    # round-2 item 3: misspelled surfaces resolve to seed entities via the
    # Indel >= 85 tier (extract/resolver.py:91-106), not to new slugs
    from raykg.stages.link import FuzzyIndex, resolve_key
    idx = {"gandalf": ("gandalf", "character", "Gandalf"),
           "mithrandir": ("gandalf", "character", "Gandalf"),
           "keldric": ("keldric", "character", "Keldric")}
    fz = FuzzyIndex(idx)
    eid, etype, conf, is_new, canon = resolve_key("kelric", idx, fz)
    assert (eid, etype, is_new, canon) == ("keldric", "character", False,
                                           "Keldric")
    assert 0.85 <= conf < 1.0
    # far-off surface still becomes a new entity
    eid, _t, _c, is_new, _n = resolve_key("zanbek", idx, fz)
    assert is_new and eid == "zanbek"
    # multi-word pattern-tier surfaces never cross the threshold vs
    # single-token aliases (>= 5 extra chars -> ratio < 0.85)
    eid, _t, _c, is_new, _n = resolve_key("king keldric", idx, fz)
    assert is_new
