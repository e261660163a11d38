"""Training-data ops tests: dedup, similarity, text stats, multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raykg.ops import dedup as dd
from raykg.ops import multimodal as mm
from raykg.ops import similarity as sim
from raykg.ops import textstats as ts


def _doc_batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_counts():
    out = ts.token_counts_batch(_doc_batch(["a b-c 12 d!"])).to_pandas()
    assert out["n_ws_tokens"].iloc[0] == 4
    assert out["n_words"].iloc[0] == 4        # a, b, c, d
    assert out["n_bpe_tokens"].iloc[0] == 7   # a b - c 12 d !


def test_quality_monotone():
    out = ts.quality_batch(_doc_batch(
        ["the cat and the dog were with us", "zzz qqq"])).to_pandas()
    assert out["quality_score"].iloc[0] > out["quality_score"].iloc[1]
    assert 0 <= out["stopword_ratio"].iloc[1] <= 1


def test_langid_tiebreak_deterministic():
    out = ts.langid_batch(_doc_batch(["xyzzy plugh"])).to_pandas()
    assert out["pred_lang"].iloc[0] == "de"   # 0 hits everywhere → lexmin
    out = ts.langid_batch(_doc_batch(["the cat and the dog"])).to_pandas()
    assert out["pred_lang"].iloc[0] == "en"


def test_fingerprint_normalization_invariant():
    a = ts.fingerprint_batch(_doc_batch(["Hello   World foo bar baz qux"]))
    b = ts.fingerprint_batch(_doc_batch(["hello world  foo bar baz qux"]))
    assert a["text_md5"][0].as_py() == b["text_md5"][0].as_py()
    assert a["min_shingle_md5"][0].as_py() == b["min_shingle_md5"][0].as_py()


def test_word_shingles_and_jaccard():
    assert dd.word_shingles("a b c", k=2) == {"a b", "b c"}
    assert dd.jaccard_of_texts("a b c d", "a b c d") == 1.0
    assert dd.jaccard_of_texts("a b c", "x y z") == 0.0


def test_minhash_similarity_correlates():
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "the quick brown fox jumps over the lazy cat again and again"
    t3 = "completely different words appear in this unrelated sentence here"
    s1, s2, s3 = (dd.minhash_signature(t) for t in (t1, t2, t3))
    agree12 = sum(a == b for a, b in zip(s1, s2)) / len(s1)
    agree13 = sum(a == b for a, b in zip(s1, s3)) / len(s1)
    assert agree12 > agree13
    assert agree13 < 0.2


def test_simhash_hamming():
    t1 = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumps over the lazy dog today"
    t3 = "entirely unrelated content with other words inside"
    h1, h2, h3 = dd.simhash64(t1), dd.simhash64(t2), dd.simhash64(t3)
    assert dd.hamming64(h1, h2) < dd.hamming64(h1, h3)


def test_pairs_from_bucket():
    g = pd.DataFrame({"doc_id": [3, 1, 2, 1]})
    out = dd.pairs_from_bucket(g)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2), (1, 3), (2, 3)]


def test_cosine_topk_local(ray_session):
    import ray
    ids = np.arange(6, dtype=np.int64)
    vecs = np.eye(6, 4) + 0.01
    q_ref = ray.put((ids[:2], vecs[:2]))
    topk = sim.CosineTopK(q_ref)
    batch = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array([list(map(float, v))
                                             for v in vecs],
                                            pa.list_(pa.float32()))})
    out = topk(batch)
    merged = out.groupby("query_id", group_keys=False).apply(sim.final_topk)
    # self excluded, rank 1..k, best match is itself-like vector excluded
    assert (merged[merged["query_id"] == 0]["vec_id"] != 0).all()
    assert list(merged[merged["query_id"] == 0]["rank"]) == list(
        range(1, len(merged[merged["query_id"] == 0]) + 1))


def test_fake_decoder_deterministic():
    dec = mm.FakeDecoder()
    t = mm.to_binary_batch(_doc_batch(["hello world"]))
    out1 = dec(t).to_pandas()
    out2 = dec(t).to_pandas()
    assert out1.equals(out2)
    assert 1 <= out1["width"].iloc[0] <= 512
    assert len(out1["features"].iloc[0]) == mm.FEATURE_DIM


def test_resize_stub():
    assert mm.resize_stub(512, 256, target=128) == (256, 128)
    import pytest
    with pytest.raises(NotImplementedError):
        mm.resize_stub(0, 10)


def test_verify_pairs_branches_agree(ray_session):
    """The three _verify_pairs_by_join branches (broadcast texts /
    broadcast hashed-shingle sets / text hash-join) produce identical
    verified pairs — pinned by forcing each branch with small_gate."""
    import pandas as pd
    import ray.data as rd

    from raykg.functions import hashagg
    from raykg.ops import dedup as dd
    from raykg.pipelines import queries as Q

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green hills tonight")
    docs_pdf = pd.DataFrame({
        "doc_id": pd.Series(range(6), dtype="int64"),
        "text": [base, base + " again", base.replace("quick", "slow"),
                 "completely different words occupy this one document "
                 "with nothing shared at all between any of them here",
                 base, base.replace("dog and", "dog but")],
    })
    docs = rd.from_pandas(docs_pdf)
    pairs = rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series([0, 0, 0, 0, 4], dtype="int64"),
        "doc_b": pd.Series([1, 2, 3, 4, 5], dtype="int64")}))
    sh = docs.map_batches(dd.shingle_explode64_batch,
                          batch_format="pyarrow")

    def to_sets(df):
        import polars as pl
        return (pl.from_pandas(df).group_by("doc_id")
                .agg(shingles=pl.col("shingle"), n=pl.col("n").first())
                .to_pandas())

    sets = hashagg.grouped_apply(sh, ["doc_id"], to_sets, coalesce=2)

    def run(**kw):
        return (Q._verify_pairs_by_join(pairs, docs, **kw).to_pandas()
                .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    bcast_texts = run()                                  # small path
    bcast_sets = run(shingle_sets=sets, small_gate=0)    # sets path
    text_join = run(small_gate=0)                        # join fallback
    assert len(bcast_texts) > 0                          # non-vacuous
    pd.testing.assert_frame_equal(bcast_texts, bcast_sets)
    pd.testing.assert_frame_equal(
        bcast_texts, text_join[bcast_texts.columns])


def test_jaccard_accumulation_filter_lossless(ray_session):
    """The PPJoin accumulation filter (cand_pair_partial/final) is a
    lossless candidate pruner: the full pipeline's verified pairs equal
    brute-force all-pairs exact Jaccard over the same documents."""
    from itertools import combinations

    from raykg.pipelines import queries as Q

    sf_small = "/root/testdata/sf0.001"
    docs = Q._docs_ds(sf_small).to_pandas()
    truth = set()
    shingles = {r.doc_id: dd.word_shingles(r.text)
                for r in docs.itertuples()}
    for a, b in combinations(sorted(shingles), 2):
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) \
                >= dd.JACCARD_THRESHOLD:
            truth.add((a, b))
    got = Q.q_dedup_jaccard_pairs(sf_small).to_pandas()
    assert set(zip(got["doc_a"], got["doc_b"])) == truth
    assert len(truth) > 0                                # non-vacuous


def test_bmp_decoder_inverts_encode():
    """Real BMP decode (header parse + numpy over padded rows) must
    recover the closed-form dims/means synth_bmp encodes (multimodal.py
    synth_bmp docstring), across widths that hit every row-padding
    residue."""
    for doc_id in range(0, 600, 3):
        w, h, f0, f1 = mm.MediaDecoder._decode_bmp(mm.synth_bmp(doc_id))
        ew, eh = 4 + doc_id % 13, 3 + (doc_id // 7) % 11
        assert (w, h) == (ew, eh)
        assert f0 == 2 * (doc_id % 128) + ew + eh - 2
        assert f1 == 2 * ((3 * doc_id) % 128) + ew + eh - 2


def test_wav_decoder_inverts_encode():
    for doc_id in range(1, 600, 3):
        rate, n, f0, f1 = mm.MediaDecoder._decode_wav(mm.synth_wav(doc_id))
        en = 64 + doc_id % 128
        base = doc_id % 256
        assert (rate, n) == (mm.WAV_RATE, en)
        assert f0 == 2 * base + en - 1          # 2 x mean of a ramp
        assert f1 == base + en - 1              # max sample


def test_media_decoder_batch_dispatch():
    """Mixed-media batch: each row decoded by its media_type tier, fake
    tier md5-consistent with FakeDecoder."""
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": ["a", "b", "c", "hello world"]})
    out = mm.MediaDecoder()(mm.to_binary_batch(t)).to_pandas()
    assert list(out["media_type"]) == [mm.MEDIA_BMP, mm.MEDIA_WAV,
                                       mm.MEDIA_PNG, mm.MEDIA_FAKE]
    assert out["width"].iloc[0] == 4 and out["height"].iloc[0] == 3
    assert out["width"].iloc[1] == mm.WAV_RATE
    assert out["width"].iloc[2] == 7 and out["height"].iloc[2] == 3
    fw, fh, feats = mm.FakeDecoder._decode_one("hello world".encode())
    assert (out["width"].iloc[3], out["height"].iloc[3]) == (fw, fh)
    assert (out["f0"].iloc[3], out["f1"].iloc[3]) == (feats[0], feats[1])


def test_png_decoder_inverts_encode():
    """Real PNG decode (chunk walk → zlib inflate → scanline unfilter)
    must recover the closed-form dims/means synth_png encodes; the
    encoder cycles None/Sub/Up filters per row, so a decoder that
    skipped unfiltering fails on every height ≥ 2 image."""
    for doc_id in range(2, 800, 4):
        w, h, f0, f1 = mm.MediaDecoder._decode_png(mm.synth_png(doc_id))
        ew, eh = 5 + doc_id % 11, 3 + (doc_id // 5) % 9
        assert (w, h) == (ew, eh)
        assert f0 == 2 * (doc_id % 100) + ew + eh - 2
        assert f1 == 2 * ((5 * doc_id) % 100) + ew + eh - 2


def test_png_decoder_average_paeth_filters():
    """The unfilter paths synth_png never emits (Average=3, Paeth=4)
    decode correctly on a hand-filtered image — the decoder handles the
    full PNG filter spec, not just its own encoder's subset."""
    import struct
    import zlib

    import numpy as np

    w, hh = 4, 5
    img = (np.arange(w * hh * 3, dtype=np.int64) * 37 % 256).reshape(
        hh, w * 3)
    lines = bytearray()
    prev = np.zeros(w * 3, np.int64)
    for r in range(hh):
        f = [0, 3, 4, 3, 4][r]
        cur = img[r]
        filt = np.empty(w * 3, np.int64)
        for i in range(w * 3):
            a = img[r][i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                filt[i] = cur[i]
            elif f == 3:
                filt[i] = (cur[i] - (a + b) // 2) % 256
            else:
                p_ = a + b - c
                pa_, pb_, pc_ = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                pr = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c)
                filt[i] = (cur[i] - pr) % 256
        lines.append(f)
        lines.extend(filt.astype(np.uint8).tobytes())
        prev = img[r]
    ihdr = struct.pack(">IIBBBBB", w, hh, 8, 2, 0, 0, 0)
    png = (mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"IDAT", zlib.compress(bytes(lines)))
           + mm._png_chunk(b"IEND", b""))
    dw, dh, df0, df1 = mm.MediaDecoder._decode_png(png)
    px = img.reshape(hh, w, 3)
    n_px = w * hh
    assert (dw, dh) == (w, hh)
    assert df0 == 2 * px[:, :, 0].sum() / n_px
    assert df1 == 2 * px[:, :, 1].sum() / n_px


def test_histogram_bound_lossless():
    """The verify-side histogram overlap bound is an upper bound on the
    exact intersection for random shingle sets (never prunes a true
    pair), and prune_pairs_histogram keeps every pair meeting the
    Jaccard threshold."""
    import numpy as np
    import polars as pl

    from raykg.ops import dedup as dd

    rng = np.random.RandomState(3)
    universe = rng.randint(0, 2**63 - 1, 4000, dtype=np.int64)
    sets = []
    base = universe[:120]
    for i in range(60):
        if i % 3 == 0:          # near-dup family: overlapping slices
            s = np.unique(np.concatenate(
                [base[:90 + (i % 7)], universe[200 + i:205 + i]]))
        else:                   # random docs
            s = np.unique(rng.choice(universe, 80, replace=False))
        sets.append(np.sort(s))
    sets_pl = pl.DataFrame({
        "doc_id": pl.Series(range(60), dtype=pl.Int64),
        "shingles": pl.Series([list(map(int, s)) for s in sets],
                              dtype=pl.List(pl.Int64)),
        "n": pl.Series([len(s) for s in sets], dtype=pl.Int64)})
    idx = dd.SetsIndex(sets_pl)

    import pandas as pd
    a, b = np.triu_indices(60, k=1)
    pairs = pd.DataFrame({"doc_a": pd.Series(a, dtype="int64"),
                          "doc_b": pd.Series(b, dtype="int64")})
    # bound >= exact intersection for EVERY pair
    ra = np.searchsorted(idx.ids, pairs["doc_a"].to_numpy())
    rb = np.searchsorted(idx.ids, pairs["doc_b"].to_numpy())
    bound = np.minimum(idx.hist[ra], idx.hist[rb]).sum(axis=1)
    exact = np.array([len(np.intersect1d(sets[x], sets[y],
                                         assume_unique=True))
                      for x, y in zip(a, b)])
    assert (bound >= exact).all()

    survivors = dd.prune_pairs_histogram(pairs, idx)
    kept = set(zip(survivors["doc_a"], survivors["doc_b"]))
    exact_out = dd.verify_pairs_vectorized(pairs, sets_pl)
    pruned_out = dd.verify_pairs_vectorized(survivors, sets_pl)
    assert len(exact_out) > 0                               # non-vacuous
    assert len(pairs) > len(survivors)                      # it prunes
    pd.testing.assert_frame_equal(
        exact_out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        pruned_out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    for _, r in exact_out.iterrows():                       # every true pair kept
        assert (r["doc_a"], r["doc_b"]) in kept
