"""Fingerprint-aggregation tests (north-star-named unit-test target).

Distribution semantics == reference style/metrics.py:56-74; fixture vector
with hand-computed expectations (FIXTURES.md §6).
"""

import pandas as pd
import pyarrow as pa

from raykg.stages import fingerprint as fp


def test_distribution_known_vector():
    # sorted: [1,2,3,4,10]; n=5
    d = fp.distribution([4, 1, 10, 2, 3])
    assert d["n"] == 5
    assert d["mean"] == 4.0
    assert d["median"] == 3.0
    assert d["min"] == 1 and d["max"] == 10
    assert d["p25"] == 2          # sorted[5//4] = sorted[1]
    assert d["p75"] == 4          # sorted[15//4] = sorted[3]
    assert round(d["std"], 4) == 3.5355   # stdev([4,1,10,2,3])


def test_distribution_small_and_empty():
    assert fp.distribution([]) == {"n": 0, "mean": 0.0, "std": 0.0,
                                   "min": 0, "max": 0, "median": 0.0,
                                   "p25": 0, "p75": 0}
    d = fp.distribution([7])
    assert d["std"] == 0.0 and d["p25"] == 7 and d["p75"] == 7


def test_distribution_even_median_interpolated():
    d = fp.distribution([1, 2, 3, 4])
    assert d["median"] == 2.5


def test_unit_metrics():
    t = pa.table({
        "unit_id": ["u1", "u2"], "doc_sha256": ["s", "s"],
        "repo": ["r", "r"], "lang": ["txt", "txt"],
        "text": ['"Who walks there?" said Aldric.',
                 "The night was cold, verily cold!"],
    })
    m = fp.unit_metrics_batch(t).to_pandas().set_index("unit_id")
    assert bool(m.loc["u1", "is_question"]) and bool(m.loc["u1", "is_dialogue"])
    assert not m.loc["u2", "is_dialogue"]
    assert bool(m.loc["u2", "is_exclamation"])
    assert m.loc["u1", "word_count"] == 5
    assert m.loc["u2", "archaism_count"] == 1          # "verily"


def test_vocab_profile():
    g = pd.DataFrame({"repo": ["r"] * 4,
                      "word": ["the", "night", "verily", "cold"],
                      "cnt": [10, 1, 1, 2]})
    out = fp.vocab_profile_group(g)
    assert out["n_tokens"].iloc[0] == 14
    assert out["n_distinct"].iloc[0] == 4
    assert out["n_hapax"].iloc[0] == 2
    assert out["ttr"].iloc[0] == round(4 / 14, 6)
    assert out["archaism_per_1000"].iloc[0] == round(1 / 14 * 1000, 6)


def test_readability_formulas():
    g = pd.DataFrame({"repo": ["r"] * 2, "word_count": [10, 10],
                      "syllable_count": [15, 15], "complex_word_count": [2, 2]})
    out = fp.readability_group(g)
    asl, asw = 10.0, 1.5
    assert out["flesch_reading_ease"].iloc[0] == round(
        206.835 - 1.015 * asl - 84.6 * asw, 2)
    assert out["flesch_kincaid_grade"].iloc[0] == round(
        0.39 * asl + 11.8 * asw - 15.59, 2)
    assert out["gunning_fog"].iloc[0] == round(0.4 * (asl + 20.0), 2)


def test_style_metrics_stateful_actor_init_once():
    # ST1: the POS model loads once per actor (__init__), not per batch
    import pyarrow as pa
    from raykg.stages import fingerprint as fp
    before = fp.StyleMetrics.init_count
    sm = fp.StyleMetrics()
    t = pa.table({"unit_id": ["u1"], "doc_sha256": ["s"], "repo": ["r"],
                  "lang": ["txt"],
                  "text": ["The sword was forged when the king slept."]})
    for _ in range(3):
        out = sm(t)
    assert fp.StyleMetrics.init_count == before + 1
    row = out.to_pandas().iloc[0]
    # "when" is a subordinate marker; "was forged" is the passive analog
    assert row["clause_depth"] == 1
    assert row["voice"] in ("passive", "mixed")
    assert row["noun_count"] >= 2          # sword, king
    assert row["verb_count"] >= 1          # slept (VERB lexicon/suffix)


def test_pos_tagger_ladder():
    from raykg.models.pos import PosTagger
    tg = PosTagger("en")
    assert tg.tag("the") == "OTHER"
    assert tg.tag("slowly") == "ADV"
    assert tg.tag("glorious") == "ADJ"
    assert tg.tag("walked") == "VERB"
    assert tg.tag("sword") == "NOUN"


def test_chunk_tagger_grammar_and_init_once():
    """R2 seam (shallow parser tier): model dict built once per actor in
    __init__; NP/VP chunking over the tag-char sequence is deterministic
    and matches hand-computed chunks."""
    import pyarrow as pa

    from raykg.ops import chunks as ck

    before = ck.ChunkTagger.init_count
    tg = ck.ChunkTagger()
    # tags: The(D) old(A) grey(A) king(N) slowly(R) walked(V) to(O)
    #       the(D) dark(A) tower(N)
    text = "The old grey king slowly walked to the dark tower."
    assert tg.tag_chars(text) == "DAANRVODAN"
    t = pa.table({"unit_id": ["u1"], "repo": ["r"], "lang": ["txt"],
                  "text": [text]})
    for _ in range(3):
        out = tg(t)
    assert ck.ChunkTagger.init_count == before + 1
    row = out.to_pandas().iloc[0]
    assert row["np_count"] == 2            # [The old grey king] [the dark tower]
    assert row["vp_count"] == 1            # [slowly walked]
    assert row["max_np_len"] == 4          # D A A N
    # non-prose rows are filtered, empty text yields zero counts
    t2 = pa.table({"unit_id": ["u2", "u3"], "repo": ["r", "r"],
                   "lang": ["py", "txt"], "text": ["def f(): pass", "..."]})
    out2 = tg(t2).to_pandas()
    assert list(out2["unit_id"]) == ["u3"]
    assert out2["np_count"].iloc[0] == 0
