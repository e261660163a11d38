"""LLM-tier structure tests (ST4/M7/R3/R5/J3): the pipeline's LLM seam —
salvage parsing, result coercion, actor-stage graceful degradation and
the merge-verify polarity asymmetry — exercised with the deterministic
stub backend (no model server exists here, as in a reference install
without Ollama)."""

import pyarrow as pa

from raykg.state import llm


def test_extract_json_salvage_ladder():
    # llm.py:166-207: fenced → direct → bracket-scan → None
    assert llm.extract_json('```json\n[{"a": 1}]\n```') == [{"a": 1}]
    assert llm.extract_json('[{"a": 1}]') == [{"a": 1}]
    assert llm.extract_json('Sure! Here you go: [{"a": 1}] hope it helps'
                            ) == [{"a": 1}]
    assert llm.extract_json('blah {"k": "v"} blah') == {"k": "v"}
    assert llm.extract_json("no json at all") is None
    assert llm.extract_json("") is None
    assert llm.extract_json("```json\nnot json\n```") is None


def test_parse_llm_entities_coercion():
    text = "Gandalf rode to Minas Tirith."
    rows = llm.parse_llm_entities(
        [{"text": "Gandalf", "type": "PERSON"},
         {"text": "minas tirith", "type": "PLACE"},      # case fallback
         {"text": "Gandalf", "type": "DRAGON"},          # label → UNKNOWN
         {"text": "Sauron", "type": "PERSON"},           # absent → pos 0
         "garbage", {"no_text": 1}], text)
    assert rows[0] == ("Gandalf", "PERSON", 0, 7, 0.85, "llm")
    assert rows[1][1] == "PLACE" and rows[1][2] == text.lower().find(
        "minas tirith")
    assert rows[2][1] == "UNKNOWN"
    assert rows[3][2:4] == (0, 6)
    assert len(rows) == 4


def test_parse_llm_relationships_fallback_predicate():
    rows = llm.parse_llm_relationships(
        [{"subject": "A", "predicate": "met", "object": "B"},
         {"subject": "A", "predicate": "vaporized", "object": "B"},
         {"subject": "A"}])
    assert rows[0][1] == "MET"
    assert rows[1][1] == "RELATED_TO"       # relationships.py:353-356
    assert len(rows) == 2


def test_parse_llm_events():
    rows = llm.parse_llm_events(
        [{"agent": "A", "action": "destroyed", "patient": "B"},
         {"action": "x"}, {"agent": "A"}])
    assert rows == [("A", "destroyed", "B")]


def test_merge_verify_polarity_asymmetry():
    dead = llm.LLMClient(llm.OllamaBackend())       # unavailable → ""
    # cross-book path defaults True (corpus/resolver.py:286); in-book
    # dynamic path defaults False (dynamic_resolver.py:297)
    assert llm.llm_verify_match(dead, "A", "B", default=True) is True
    assert llm.llm_verify_match(dead, "A", "B", default=False) is False
    yes = llm.LLMClient(llm.StubBackend({"same entity": "YES, they are."}))
    assert llm.llm_verify_match(yes, "A", "B", default=False) is True
    no = llm.LLMClient(llm.StubBackend({"same entity": "no"}))
    assert llm.llm_verify_match(no, "A", "B", default=True) is False


def test_llm_entity_stage_actor_and_degradation():
    batch = pa.table({"unit_id": ["u1", "u2"], "lang": ["txt", "txt"],
                      "text": ["Gandalf spoke.", "Rain fell."]})
    # dead backend: whole batch degrades to zero rows, never raises
    stage = llm.LLMEntityStage()
    assert len(stage(batch)) == 0
    # stub backend answers one unit with fenced JSON (salvage in the loop)
    stub = llm.StubBackend(
        {"Gandalf spoke.": '```json\n[{"text": "Gandalf", '
                           '"type": "PERSON"}]\n```'})
    stage = llm.LLMEntityStage(stub)
    out = stage(batch)
    assert len(out) == 1
    assert out.iloc[0]["mention_text"] == "Gandalf"
    assert out.iloc[0]["source"] == "llm"
    assert stub.calls == 2          # one prompt per unit, errors absorbed


def test_llm_relationship_stage_actor_and_coercion():
    batch = pa.table({"unit_id": ["u1", "u2"], "lang": ["txt", "txt"],
                      "text": ["Frodo met Sam.", "Nothing here."],
                      "entities": ["Frodo, Sam", ""]})
    # dead backend: zero rows, never raises
    assert len(llm.LLMRelationshipStage()(batch)) == 0
    stub = llm.StubBackend(
        {"Frodo met Sam.": '[{"subject": "Frodo", "predicate": "met", '
                           '"object": "Sam"}, {"subject": "Frodo", '
                           '"predicate": "teleported", "object": "Sam"}]'})
    out = llm.LLMRelationshipStage(stub)(batch)
    assert list(out["pred"]) == ["MET", "RELATED_TO"]
    assert out.iloc[0]["subj"] == "Frodo" and out.iloc[0]["source"] == "llm"
    assert stub.calls == 2


def test_llm_event_payload_coercion():
    events, rels = llm.parse_llm_event_payload(
        {"events": [
            {"id": "e1", "agent": "Bilbo", "action": "found",
             "patient": "the Ring", "year": "2941", "era": "Third_Age"},
            {"id": "e2", "agent": "Smaug", "action": "burned"},
            {"agent": "x"},                        # no action → dropped
        ],
         "relations": [
            {"from_id": "e1", "to_id": "e2", "relation": "BEFORE"},
            {"from_id": "e1", "to_id": "ghost", "relation": "before"},
            {"from_id": "e1", "to_id": "e2", "relation": "unrelated"},
        ]})
    assert [e[0] for e in events] == ["e1", "e2"]
    assert events[0][5] == 2941 and events[0][6] == "third_age"
    assert rels == [("e1", "e2", "before")]
    # bare list tolerated as events-only
    ev2, r2 = llm.parse_llm_event_payload(
        [{"agent": "A", "action": "did"}])
    assert len(ev2) == 1 and r2 == []


def test_llm_event_stage_degradation():
    batch = pa.table({"unit_id": ["u1"], "lang": ["txt"],
                      "text": ["Bilbo found the Ring."]})
    assert len(llm.LLMEventStage()(batch)) == 0
    stub = llm.StubBackend(
        {"Bilbo found": '{"events": [{"id": "e1", "agent": "Bilbo", '
                        '"action": "found", "patient": "the Ring"}], '
                        '"relations": []}'})
    out = llm.LLMEventStage(stub)(batch)
    assert len(out) == 1 and out.iloc[0]["agent"] == "Bilbo"


def test_llm_rule_synthesis_fallback_and_accept():
    passages = ["Only the Eldar may wield the silmaril lights." * 12]
    fallback_rows = [{"rule_id": "magic_pattern_0", "title": "t"}]
    dead = llm.LLMClient(llm.OllamaBackend())
    assert llm.llm_synthesize_rules(
        dead, "magic", passages,
        pattern_fallback=lambda: fallback_rows) == fallback_rows
    assert llm.llm_synthesize_rules(dead, "magic", []) == []
    stub = llm.LLMClient(llm.StubBackend(
        {"world-building rules about magic":
         '```json\n[{"title": "Silmaril exclusivity", "description": '
         '"Only the Eldar wield them", "constraints": ["Eldar only"], '
         '"exceptions": []}]\n```'}))
    rules = llm.llm_synthesize_rules(stub, "magic", passages)
    assert rules[0]["rule_id"] == "magic_0"
    assert rules[0]["confidence"] == 0.8
    assert rules[0]["constraints"] == ["Eldar only"]
    # context truncation: 300-char cap per passage
    assert len(passages[0]) > 300
