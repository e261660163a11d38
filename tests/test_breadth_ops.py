"""Unit tests for the breadth operators (SURVEY §2: A3/A5/A10/A13/A19,
M18/A15, S11/J6, J7, C2/C3)."""

import pandas as pd
import pyarrow as pa

from raykg import vocab
from raykg.ops import worldbible as wb


def _units(rows):
    return pa.table({
        "unit_id": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })


def test_wb_rule_patterns():
    # worldbible/patterns.py:90-105 rule shapes
    assert wb.first_rule_match("Only Kel can wield the Sunstone.") \
        == "Only Kel can wield"
    assert wb.first_rule_match("No one may enter Mirewood after dark.") \
        == "No one may enter"
    assert wb.first_rule_match("The orb must never leave the hold.") \
        == "must never leave"
    assert wb.first_rule_match("plain sentence") == ""


def test_wb_categorize_threshold():
    t = _units([
        # rule + magic keyword → magic ≥ 0.3 + rule bonus
        ("u1", "txt", "Only Kel can wield the Sunstone."),
        # keyword-only, single hit (0.2) → below threshold, no row
        ("u2", "txt", "He wielded it."),
        # two history keywords (0.4) → row without rule bonus
        ("u3", "txt", "In the First Age, year 10, all was old."),
        # code units are skipped entirely
        ("u4", "py", "def ancient(): pass"),
    ])
    out = wb.categorize_batch(t)
    got = dict(zip(zip(out["unit_id"], out["category"]), out["score"]))
    assert got[("u1", "magic")] == 0.5       # 0.2*1 + 0.3
    assert ("u2", "magic") not in got
    assert got[("u3", "history")] == 0.6     # age, year, old → 0.2*3
    assert not any(u == "u4" for u, _ in got)


def test_wb_rule_bonus_requires_keyword_evidence():
    # a rule-shaped sentence with zero category keywords emits nothing
    t = _units([("u1", "txt", "Only Bob can sing.")])
    out = wb.categorize_batch(t)
    assert len(out[out["category"] == "history"]) == 0


def test_merge_candidate_heuristic():
    # C3 semantics (dynamic_resolver.py:244-264): same type + containment
    from raykg.pipelines.queries import q_kg_merge_candidates  # noqa: F401
    # heuristic is embedded in the query; test the rule table directly
    info = {"a": ("Aldric", "character"), "b": ("Lord Aldric", "character"),
            "c": ("Mirewood", "place"), "d": ("The Mirewood", "place"),
            "e": ("Sunstone", "object")}

    def merge_ok(x, y):
        na, ta = info[x]
        nb, tb = info[y]
        if ta != tb and "unknown" not in (ta, tb):
            return False
        la, lb = na.lower(), nb.lower()
        return (la in lb or lb in la
                or la.removeprefix("the ") == lb
                or lb.removeprefix("the ") == la)

    assert merge_ok("a", "b")          # substring containment
    assert merge_ok("c", "d")          # "the X" ≡ "X"
    assert not merge_ok("a", "c")      # type mismatch
    assert not merge_ok("c", "e")      # type mismatch, no containment


def test_distinctiveness_formula():
    # A13 (voice/profile.py:280-316): score grows with own usage, shrinks
    # with other speakers' usage of the same word
    def score(cnt, other, grand):
        return cnt / (1.0 + other / max(1, grand))

    assert score(10, 0, 100) > score(10, 90, 100)
    assert score(10, 0, 100) == 10.0


def test_claim_parse_ladder():
    # reference lore/parser.py:136-250 pattern ladder, type by type
    from raykg.ops import claims as cl
    c = cl.parse_claim("Aldric killed the Belmor.")
    assert (c.claim_type, c.subject, c.predicate, c.obj) == (
        cl.RELATIONSHIP, "Aldric", "KILLED", "the Belmor")
    c = cl.parse_claim("Aldric killed the Belmor, or not.")
    assert c.negated
    c = cl.parse_claim("Aldric is a character.")
    assert (c.claim_type, c.attribute, c.value) == (
        cl.ENTITY_EXISTS, "type", "character")
    c = cl.parse_claim("Durdric is ancient.")
    assert (c.claim_type, c.value) == (cl.ATTRIBUTE, "ancient")
    c = cl.parse_claim("Fendric dwelt during the First Age.")
    assert (c.claim_type, c.subject, c.time_period) == (
        cl.TEMPORAL, "Fendric", "First Age")
    c = cl.parse_claim("Only Eldric can wield the Moonstone.")
    assert c.claim_type == cl.CAPABILITY and c.subject == "Only Eldric"
    c = cl.parse_claim("Fendric destroyed Starstone before Galdric.")
    assert c.claim_type == cl.EVENT_ORDER and c.ordering == "before"
    # reference quirk pinned: event2 copies event1's action+patient
    assert c.event2 == ("Galdric", "destroyed", "Starstone")
    # reference quirk pinned: the ATTRIBUTE pattern shadows LOCATION
    c = cl.parse_claim("Mirewood is in the north.")
    assert c.claim_type == cl.ATTRIBUTE and c.value == "in"
    c = cl.parse_claim("gibberish with no pattern at all")
    assert c.claim_type == cl.UNKNOWN_TYPE
    # confidence clamp (checker.py:27-56)
    assert 0.5 <= cl.clamp_confidence(0.95, 1) <= 0.95


def test_lore_check_routing(ray_session):
    # every checker branch produces its reference status on the planted
    # chronicle evidence (lore/checker.py:255-296)
    from raykg.pipelines import queries as Q
    df = Q.q_lore_check("/root/testdata/sf0.001")
    by_type = df.groupby("claim_type")["status"].apply(set).to_dict()
    assert {"VALID", "INVALID", "UNKNOWN"} <= by_type["relationship"]
    assert {"VALID", "UNKNOWN"} <= by_type["entity_exists"]
    assert by_type["attribute"] == {"VALID"}
    assert by_type["temporal"] == {"VALID", "INVALID"}
    assert by_type["capability"] == {"PLAUSIBLE"}
    assert by_type["event_order"] == {"VALID", "INVALID"}
    assert by_type["unknown"] == {"UNKNOWN"}



def test_lsh_bucketing_on_clustered_data():
    # On CLUSTERED vectors (the workload LSH exists for) near-duplicates
    # collide and random pairs mostly don't.  (The sf* embeddings table is
    # i.i.d. random — no bucketing scheme has signal there, so the ann_lsh
    # query is a rows-only plumbing check against that table.)
    import numpy as np
    from raykg.ops import similarity as sim
    rng = np.random.RandomState(0)
    base = rng.normal(size=(20, 64))
    near = base + 0.05 * rng.normal(size=base.shape)     # planted near-dups
    b_base = sim.lsh_signs(base, 64)
    b_near = sim.lsh_signs(near, 64)
    same = (b_base == b_near).mean()
    rand_pairs = (sim.lsh_signs(rng.normal(size=(200, 64)), 64)
                  == sim.lsh_signs(rng.normal(size=(200, 64)), 64)).mean()
    assert same >= 0.6, f"near-dup collision rate too low: {same}"
    assert same > rand_pairs + 0.3


def test_ann_lsh_shape(ray_session):
    # plumbing: well-formed per-query top-k, self excluded, rank 1..k
    from raykg.pipelines import queries as Q
    approx = Q.q_ann_lsh("/root/testdata/sf0.001").to_pandas()
    assert set(approx.columns) == {"query_id", "vec_id", "cosine", "rank"}
    assert (approx["query_id"] != approx["vec_id"]).all()
    per_q = approx.groupby("query_id")["rank"].apply(
        lambda s: list(s) == list(range(1, len(s) + 1)))
    assert per_q.all()


def test_fuzzy_links_recover_dropped_char(ray_session):
    # J2 wired: every typo surface the generator planted resolves to its
    # seed entity through the fuzzy tier (score in [0.85, 1.0) and the
    # surface is one deletion away from the seed name)
    from raykg.pipelines import queries as Q
    from raykg.sources import synthetic_corpus as sc
    sf = "/root/testdata/sf0.001"
    out = Q.q_kg_fuzzy_links(sf).to_pandas()
    pools = sc.build_entity_pools()
    typo_to_seed = {t.lower(): sc.slugify(n)
                    for n, t in pools["char_typos"].items()}
    assert len(out) >= 1
    for _, r in out.iterrows():
        assert 0.85 <= r["score"] < 1.0
        assert typo_to_seed[r["mention_text"].lower()] == r["entity_id"]


def test_dedup_clusters_and_curation_invariants(ray_session):
    """Engine-level invariants of the clustering/curation chain at
    sf0.001 (the oracle pins exact values; these pin SEMANTICS against
    future refactors): every doc labeled exactly once, representatives
    are component minima and self-canonical, curated docs are unique by
    content, pass the filters, and are cluster representatives."""
    from raykg.pipelines import queries as Q
    sf = "/root/testdata/sf0.001"
    clusters = Q.q_dedup_clusters(sf).to_pandas()
    docs = Q._docs_ds(sf).to_pandas()
    assert sorted(clusters["doc_id"]) == sorted(docs["doc_id"])
    assert clusters["doc_id"].is_unique
    # a representative is a member of its own cluster and canonical
    reps = set(clusters["cluster_rep"])
    assert reps <= set(clusters["doc_id"])
    canon = clusters[clusters["is_canonical"]]
    assert set(canon["doc_id"]) == reps
    assert (canon["doc_id"] == canon["cluster_rep"]).all()
    # rep = min doc_id within each cluster
    assert (clusters.groupby("cluster_rep")["doc_id"].min()
            .reset_index()
            .apply(lambda r: r["doc_id"] == r["cluster_rep"], axis=1)
            .all())

    curated = Q.q_corpus_curation(sf).to_pandas()
    assert curated["doc_id"].is_unique
    assert (curated["quality_score"] >= Q.CURATION_MIN_QUALITY).all()
    assert (curated["pred_lang"] == Q.CURATION_LANG).all()
    # curated docs are cluster representatives...
    assert set(curated["doc_id"]) <= reps
    # ...and unique by exact content
    texts = docs.set_index("doc_id").loc[curated["doc_id"], "text"]
    assert texts.nunique() == len(curated)


def test_lsh_family_recall(ray_session):
    """VERDICT r3 item 4: the rows-only LSH candidate generators carry
    QUANTITATIVE guarantees against the exact methods — a generator with
    silently collapsing recall must fail here, not pass a row-count
    check.  minhash recall vs the exact Jaccard join and ann_lsh recall
    vs brute-force top-k must hold >= 0.9; simhash must separate true
    near-dup pairs from random pairs by mean Hamming distance."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "measure_recall", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "measure_recall.py"))
    mr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mr)
    m = mr.measure("/root/testdata/sf0.01")
    assert m["n_true_jaccard_pairs"] > 0 and m["n_true_topk"] > 0
    assert m["minhash_recall"] >= 0.9, m
    assert m["ann_lsh_recall"] >= 0.9, m
    assert m["ann_ivf_recall"] >= 0.9, m
    assert (m["simhash_mean_hamming_dup"] * 2
            < m["simhash_mean_hamming_random"]), m
