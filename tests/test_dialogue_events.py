"""Dialogue attribution tiers + event dedup/ordering tests."""

import pandas as pd
import pyarrow as pa

from raykg.stages import dialogue as dlg
from raykg.stages import events as ev


def _spans(text):
    t = pa.table({"unit_id": ["u1"], "doc_sha256": ["s"], "repo": ["r"],
                  "lang": ["txt"], "text": [text]})
    return dlg.spans_batch(t).to_pandas()


def test_tier1_quote_then_verb_name():
    df = _spans('"We must go," said Aldric.')
    assert df["speaker"].iloc[0] == "Aldric"
    assert df["speech_verb"].iloc[0] == "said"
    assert df["attribution_tier"].iloc[0] == 1
    assert df["attribution_conf"].iloc[0] == 0.9


def test_tier2_name_verb_then_quote():
    df = _spans('Aldric whispered, "We must go now."')
    assert df["speaker"].iloc[0] == "Aldric"
    assert df["attribution_tier"].iloc[0] == 2


def test_tier3_verb_name_later():
    df = _spans('"We must go." Then answered Belmor at last.')
    assert df["speaker"].iloc[0] == "Belmor"
    assert df["attribution_tier"].iloc[0] == 3
    assert df["attribution_conf"].iloc[0] == 0.7


def test_tier4_nearest_name():
    df = _spans('"We must go." Belmor frowned.')
    assert df["speaker"].iloc[0] == "Belmor"
    assert df["attribution_tier"].iloc[0] == 4


def test_unattributed_unknown():
    df = _spans('"We must go." The night was cold.')
    assert df["speaker"].iloc[0] == "UNKNOWN"
    assert df["attribution_tier"].iloc[0] == 0


def test_question_exclamation_classification():
    df = _spans('"Who goes there?" said Aldric.')
    assert bool(df["is_question"].iloc[0])
    df = _spans('"Hold the gate!" cried Aldric.')
    assert bool(df["is_exclamation"].iloc[0])


def test_extract_quotes_all_tiers_and_preference():
    """Extended six-tier extraction: tier index per pattern, unit-level
    double-quote preference, apostrophe hazard confined to gated units."""
    # tiers 3/4/6 fire only when no double-quote pattern matches
    assert dlg.extract_quotes_all("'Hold the gate!' cried Belmor.") == \
        [("Hold the gate!", 0, 16, 3)]
    assert dlg.extract_quotes_all(
        "‘The night is cold,’ said Aldric.")[0][3] == 4
    assert dlg.extract_quotes_all(
        "â€œwho walks there?â€ asked Tor.")[0][3] == 6
    # tier 5 (raw-byte mojibake chars) is scanned too
    t5 = "\xe2\x80\x9cIt is too late,\xe2\x80\x9d said Aldric."
    assert dlg.extract_quotes_all(t5)[0][3] == 5
    # double-quote preference: singles suppressed in double-quoted units
    mixed = '"We can\'t stay, it isn\'t safe," said Aldric.'
    assert [q[3] for q in dlg.extract_quotes_all(mixed)] == [1]
    # default path ignores single quotes entirely (reference parity)
    assert dlg.extract_quotes("'Hold the gate!' cried Belmor.") == []


def test_spans_batch_all_schema_and_attribution():
    t = pa.table({"unit_id": ["u1", "u2"], "lang": ["txt", "txt"],
                  "text": ["'We must go at once,' said Aldric.",
                           '"Hold the gate!" cried Belmor.']})
    df = dlg.spans_batch_all(t).to_pandas()
    assert list(df["quote_tier"]) == [3, 1]
    assert list(df["speaker"]) == ["Aldric", "Belmor"]
    assert list(df["attribution_tier"]) == [1, 1]
    assert bool(df["is_exclamation"].iloc[1])


def test_extended_tiers_oracle_equivalence_guard():
    """ADVICE r3 guard: the engine scans quote tier 5 (raw C1 mojibake
    chars) and resolves cross-tier overlaps by tier priority, while the
    dialogue_spans_all SQL oracle omits tier 5 and lets a single
    alternation's leftmost match win.  The two are equivalent iff the
    oracled corpus (a) contains no C1 control chars U+0080-U+009F (tier 5
    can never fire) and (b) contains no overlapping cross-tier matches of
    tiers 3/4/6 within any gated unit (no double-quote match).  Pin BOTH
    properties over every generated unit at the driver's checked scale
    (sf0.01) so any future generator change that would make engine and
    oracle diverge fails here first."""
    import re
    from raykg.sources import synthetic_corpus as sc
    from raykg.stages import split as sp

    pools = sc.build_entity_pools()
    n = sc.n_files_for("sf0.01")
    tbl, _ = sc._gen_chunk(pools, 0, n, max(4, n // 40))
    c1 = re.compile("[\u0080-\u009f]")
    tiers = [(i, re.compile(dlg.QUOTE_PATTERNS_ALL[i - 1]))
             for i in (3, 4, 6)]
    n_gated = 0
    for content, lang in zip(tbl["content"].to_pylist(),
                             tbl["lang"].to_pylist()):
        assert not c1.search(content), "tier-5 (C1 mojibake) char in corpus"
        # scan the same texts the engine/oracle scan: per UNIT, and only
        # units the double-quote gate lets through to tiers 3-6
        for *_ids, text in sp.split_doc(content, lang):
            if any(rx.search(text) for rx in dlg._QUOTE_RES):
                continue
            spans = sorted((m.start(), m.end(), i)
                           for i, rx in tiers for m in rx.finditer(text))
            if len(spans) > 1:
                n_gated += 1
            for (s1, e1, i1), (s2, e2, i2) in zip(spans, spans[1:]):
                if i1 != i2:
                    assert e1 <= s2, (
                        f"overlapping cross-tier matches t{i1}/t{i2} in "
                        f"{text!r} - engine tier-priority and oracle "
                        "leftmost-wins diverge")
    assert n_gated > 0, "guard vacuous: no multi-match gated units"


def test_event_key_normalization():
    # reference events.py:381-395 — "Bilbo found Ring"/"Bilbo finds the Ring"
    k1 = ev.event_key("Bilbo", "found", "Ring")
    k2 = ev.event_key("bilbo", "finds", "the Ring")
    # agent lowercased; patient loses its article in both variants
    assert k1.split("|")[2] == k2.split("|")[2] == "ring"
    assert ev.event_key("A", "destroyed", "B") == "a|destroy|b"
    assert ev.event_key("A", "destroys", "B") == "a|destroy|b"


def test_dedup_events(ray_session):
    import ray.data as rd
    df = pd.DataFrame({
        "unit_id": ["u2", "u1", "u3"],
        "subj": ["Aldric", "Aldric", "Belmor"],
        "pred": ["destroyed", "destroys", "found"],
        "obj": ["the Sunstone", "Sunstone", "Icering"],
        "era": ["First", "First", "Second"], "year": [10, 10, 20],
    })
    out = ev.dedup_events(rd.from_pandas(df)).to_pandas()
    assert len(out) == 2
    ald = out[out["subj"] == "Aldric"]
    assert ald["unit_id"].iloc[0] == "u1"   # min unit_id wins


def test_order_edges(ray_session):
    import ray.data as rd
    df = pd.DataFrame({
        "unit_id": ["u1", "u2", "u3", "u4"],
        "subj": ["A", "B", "C", "D"],
        "pred": ["destroyed", "destroyed", "destroyed", "destroyed"],
        "obj": ["W", "X", "Y", "Z"],
        "era": ["First", "First", "Second", "Second"],
        "year": [5, 10, 3, 3],
    })
    edges = ev.order_edges(ev.dedup_events(rd.from_pandas(df))).to_pandas()
    assert len(edges) == 2   # (A,B) same era diff year; (B,C) era change;
    #                          (C,D) same era same year -> skipped
    confs = dict(zip(zip(edges["event1"].str[:1], edges["event2"].str[:1]),
                     edges["confidence"]))
    assert confs[("a", "b")] == 0.9
    assert confs[("b", "c")] == 0.95


def test_order_edges_driver_bounded(ray_session, tmp_path):
    """Edges stream to the parquet sink — the driver sees only marker
    rows.  Inflated event count (20k unique events over 3 eras), forced
    into many blocks; asserts (a) edge rows live in the sink files, (b)
    the full adjacent-pair edge set is exactly reproduced."""
    import ray.data as rd
    from raykg import vocab
    n = 20_000
    eras = [vocab.ERAS[i % 3] for i in range(n)]
    df = pd.DataFrame({
        "unit_id": [f"u{i:06d}" for i in range(n)],
        "subj": [f"agent{i:06d}" for i in range(n)],
        "pred": ["destroyed"] * n,
        "obj": [f"thing{i:06d}" for i in range(n)],
        "era": eras,
        "year": [i // 7 for i in range(n)],
    })
    out_dir = str(tmp_path / "edges")
    ds = ev.dedup_events(rd.from_pandas(df).repartition(16))
    edges = ev.order_edges(ds, edges_out=out_dir).to_pandas()

    # oracle: sequential scan over the globally sorted events
    sdf = df.copy()
    sdf["event_key"] = [ev.event_key(a, p, o) for a, p, o in
                        zip(sdf["subj"], sdf["pred"], sdf["obj"])]
    sdf["era_ord"] = [vocab.ERA_ORDER[e] for e in sdf["era"]]
    sdf = sdf.sort_values(["era_ord", "year", "event_key"])
    expect = set()
    prev = None
    for r in sdf.itertuples():
        if prev is not None:
            c = ev._edge_conf(prev.era_ord, r.era_ord, prev.year, r.year)
            if c > 0:
                expect.add((prev.event_key, r.event_key, c))
        prev = r
    got = set(zip(edges["event1"], edges["event2"], edges["confidence"]))
    assert got == expect
    # the sink holds the edge rows (driver never concatenated them)
    import pyarrow.dataset as pads
    sink = pads.dataset(out_dir).to_table()
    assert sink.num_rows >= len(expect)


def test_event_asof_prev_lag_semantics(ray_session, monkeypatch):
    """The as-of lookup attaches each agent's most recent strictly
    preceding event in (era_ord, year) order with deterministic
    tiebreaks; first events get the -1/'' sentinels."""
    import pandas as pd
    import ray.data as rd

    from raykg.pipelines import queries as Q

    ev = pd.DataFrame({
        "unit_id": ["u1", "u2", "u3", "u4", "u5"],
        "subj": ["Aldric", "Aldric", "Aldric", "Borin", "Borin"],
        "pred": ["forged", "destroyed", "found", "took", "lost"],
        "obj": ["Ring", "Ring", "Crown", "Gem", "Gem"],
        "era": ["First", "Third", "First", "Second", "Second"],
        "year": [100, 5, 200, 50, 50],
    })
    monkeypatch.setattr(Q, "_events_ds", lambda sf: rd.from_pandas(ev))
    out = (Q.q_event_asof_prev("ignored").to_pandas()
           .sort_values(["agent", "era_ord", "year", "unit_id"])
           .reset_index(drop=True))
    # Aldric timeline: (First,100 forged) -> (First,200 found) -> (Third,5)
    a = out[out["agent"] == "Aldric"]
    assert list(a["action"]) == ["forged", "found", "destroyed"]
    assert list(a["prev_action"]) == ["", "forged", "found"]
    assert list(a["prev_year"]) == [-1, 100, 200]
    assert list(a["prev_era_ord"]) == [-1, 0, 0]
    # same (era, year) tie for Borin breaks on unit_id (u4 < u5)
    b = out[out["agent"] == "Borin"]
    assert list(b["action"]) == ["took", "lost"]
    assert list(b["prev_action"]) == ["", "took"]


def test_event_window_count_range_frame(ray_session, monkeypatch):
    """Value-range trailing window: same-agent same-era events within
    [year-100, year] count toward n_recent; ties on year share a count
    (RANGE, not ROWS, semantics); other eras/agents never leak in."""
    import pandas as pd
    import ray.data as rd

    from raykg.pipelines import queries as Q

    ev = pd.DataFrame({
        "unit_id": [f"u{i}" for i in range(6)],
        "subj": ["A", "A", "A", "A", "A", "B"],
        "pred": ["did"] * 6,
        "obj": ["x"] * 6,
        "era": ["First", "First", "First", "First", "Second", "First"],
        "year": [10, 50, 110, 300, 60, 55],
    })
    monkeypatch.setattr(Q, "_events_ds", lambda sf: rd.from_pandas(ev))
    out = Q.q_event_window_count("ignored").to_pandas()
    got = dict(zip(out["unit_id"], out["n_recent"]))
    # A/First: 10 ->1; 50 -> {10,50} 2; 110 -> {10,50,110} 3; 300 -> 1
    # A/Second: 60 -> 1 (era partition); B/First: 55 -> 1 (agent partition)
    assert got == {"u0": 1, "u1": 2, "u2": 3, "u3": 1, "u4": 1, "u5": 1}
