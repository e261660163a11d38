"""Temporal interval reasoning (#7/M16): parity against the REFERENCE
implementation executed in-process (lore/temporal.py, use_llm=False) —
era ladder, lifespan timeline mutation rules, alive_during three-valued
logic, happened_before relation/era routing."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from raykg.ops import temporal as tmp

ref_oracle = pytest.importorskip("ref_oracle")

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference tree not present")

# Text covering: every birth/death/lived/order pattern, the reference's
# own capture quirks ("was born" / "the world" pseudo-entities from the
# generic LIVED pattern), casing collisions, last-match-wins overwrites,
# era ladder corner cases, and relation-vs-era conflicts.
TEXT = (
    "Aldric was born in the First Age. Aldric perished in the Third Age. "
    "Beldric came into the world in the Second Age. "
    "Men still mourn the death of Beldric in the Fourth Age. "
    "Cordric dwelt in the Elder Days Age. "
    "CORDRIC lived in the Second Age. "
    "Durwyn of the Third Age rode out. "
    "Aldric was born in the Second Age. "
    "Fenmor came before Aldric. Aldric came after Galwyn. "
    "Beldric preceded Fenmor. Fenmor followed Beldric. "
    "Halric lived in the years of the trees Age. "
    "The city endured before time and sun Age."
)


def _ref_timeline():
    mod = ref_oracle.temporal()
    ex = mod.TemporalExtractor(use_llm=False)
    return mod, ex.extract_from_text(TEXT)


def _engine_rows() -> pd.DataFrame:
    t = pa.table({"repo": ["r"], "path": ["p"], "unit_id": ["u"],
                  "lang": ["txt"], "text": [TEXT]})
    return tmp.lifespan_rows_batch(t).to_pandas()


def _engine_entities() -> pd.DataFrame:
    return tmp.timeline_group(_engine_rows())


def test_era_ladder_parity():
    mod = ref_oracle.temporal()
    for s in ["the First Age", "Elder Days", "second age", "THIRD AGE",
              "Fourth Age", "years of the trees", "before the sun",
              "before time", "the Fifth Age", "long ago", "time before",
              "sun and time", "First Age or Second Age"]:
        assert tmp.era_from_text(s) == mod.Era.from_text(s).value, s


def test_timeline_entities_parity():
    mod, ref_tl = _ref_timeline()
    eng = _engine_entities().set_index("name_key")
    ref_ents = {k.lower(): v for k, v in ref_tl.entities.items()}
    assert set(eng.index) == set(ref_ents)
    for key, ref_e in ref_ents.items():
        row = eng.loc[key]
        assert row["name"] == ref_e.name, key
        for attr, col in (("birth_era", "birth_era"),
                          ("death_era", "death_era")):
            ref_v = getattr(ref_e, attr)
            ref_v = ref_v.value if ref_v is not None else "none"
            assert row[col] == ref_v, (key, attr, row[col], ref_v)
        assert row["source_text"] == ref_e.source_text, key


def test_alive_during_parity():
    mod, ref_tl = _ref_timeline()
    eng = tmp.alive_rows(_engine_entities()).set_index(["name_key", "era"])
    tv = {True: "true", False: "false", None: "unknown"}
    for key, ref_e in ((k.lower(), v) for k, v in ref_tl.entities.items()):
        for era_name in tmp.KNOWN_ERAS:
            ref_v = tv[ref_e.alive_during(mod.Era(era_name))]
            got = eng.loc[(key, era_name), "alive"]
            assert got == ref_v, (key, era_name, got, ref_v)


def test_order_rows_parity():
    mod, ref_tl = _ref_timeline()
    t = pa.table({"repo": ["r"], "path": ["p"], "unit_id": ["u"],
                  "lang": ["txt"], "text": [TEXT]})
    eng = tmp.order_rows_batch(t).to_pandas()
    eng = eng.sort_values(["pattern_idx", "ord"], kind="mergesort")
    # reference appends in pattern-then-text order — same total order
    assert len(eng) == len(ref_tl.relations)
    for (_, row), ref_r in zip(eng.iterrows(), ref_tl.relations):
        assert (row["subj"], row["relation"], row["obj"]) == (
            ref_r.subject, ref_r.relation, ref_r.object)


def test_happened_before_parity():
    mod, ref_tl = _ref_timeline()
    ents = _engine_entities()
    t = pa.table({"repo": ["r"], "path": ["p"], "unit_id": ["u"],
                  "lang": ["txt"], "text": [TEXT]})
    rels = tmp.order_rows_batch(t).to_pandas()
    g = pd.concat([
        ents[["repo", "name_key", "birth_era"]].assign(
            subj=None, relation=None, obj=None, pattern_idx=-1, path="",
            unit_id="", ord=-1),
        rels.assign(name_key=None, birth_era=None),
    ], ignore_index=True)
    eng = (tmp.happened_before_group(g)
           .set_index(["entity_a", "entity_b"]))
    names = sorted(k.lower() for k in ref_tl.entities)
    tv = {True: "true", False: "false", None: "unknown"}
    n_checked = 0
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ref_v = tv[ref_tl.happened_before(a, b)]
            got = eng.loc[(a, b), "a_before_b"]
            assert got == ref_v, (a, b, got, ref_v)
            n_checked += 1
    assert n_checked >= 10


def test_lived_blocked_by_birth_or_death():
    # 'aldric' has birth+death rows; its LIVED-pattern match must not
    # overwrite; 'durwyn' exists only via the generic lived pattern
    eng = _engine_entities().set_index("name_key")
    assert eng.loc["aldric", "birth_era"] == "second_age"   # last birth wins
    assert eng.loc["aldric", "death_era"] == "third_age"
    assert eng.loc["durwyn", "birth_era"] == "third_age"
    assert eng.loc["durwyn", "death_era"] == "third_age"


def test_timeline_overlap_range_join(ray_session, monkeypatch):
    """The era-bucketed interval join finds exactly the entity pairs with
    overlapping KNOWN lifespans, with shared-era count and first shared
    era; unknown (unresolved) lifespans never pair."""
    import pandas as pd
    import ray.data as rd

    from raykg.pipelines import queries as Q

    # a: first..second, b: second..third, c: fourth only, d: unknown eras
    # (q_timeline_overlap consumes the lifespan table q_timeline_entities
    # since the ops/window.range_join refactor — patch that seam)
    rows = [("acme/r0", "a", "first_age", "second_age"),
            ("acme/r0", "b", "second_age", "third_age"),
            ("acme/r0", "c", "fourth_age", "fourth_age"),
            ("acme/r0", "d", "unknown", "unknown")]
    df = pd.DataFrame(rows, columns=["repo", "name_key",
                                     "birth_era", "death_era"])
    monkeypatch.setattr(Q, "q_timeline_entities",
                        lambda sf: rd.from_pandas(df))
    out = (Q.q_timeline_overlap("ignored").to_pandas()
           .sort_values(["entity_a", "entity_b"]).reset_index(drop=True))
    from raykg.ops.temporal import ERA_ORDER
    assert list(zip(out["entity_a"], out["entity_b"])) == [("a", "b")]
    assert out["n_overlap_eras"].iloc[0] == 1
    assert out["first_overlap_ord"].iloc[0] == ERA_ORDER["second_age"]
