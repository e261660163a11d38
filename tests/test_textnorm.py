"""Pure-function tests (reference test_extract.py / §2.8 helper shapes)."""

from raykg.functions import textnorm as tn


def test_normalize_ws():
    assert tn.normalize_ws("  a\t b\n\nc ") == "a b c"


def test_strip_possessive():
    assert tn.strip_possessive("Gandalf's") == "Gandalf"
    assert tn.strip_possessive("Gandalf") == "Gandalf"


def test_strip_article():
    assert tn.strip_article("the shire") == "shire"
    assert tn.strip_article("a ring") == "ring"
    assert tn.strip_article("shire") == "shire"


def test_norm_key():
    assert tn.norm_key("  The  Shire's ") == "the shire"


def test_slugify():
    assert tn.slugify("Great Forest") == "great_forest"
    assert tn.slugify("Gandalf!") == "gandalf"


def test_fuzzy_ratio_exact():
    assert tn.fuzzy_ratio("gandalf", "gandalf") == 100.0


def test_fuzzy_ratio_misspelling():
    # reference tests/test_extract.py:123-130 — "Gandaf" matches at >=85
    score = tn.fuzzy_ratio("gandaf", "gandalf")
    assert 85.0 <= score < 100.0


def test_fuzzy_ratio_unrelated():
    assert tn.fuzzy_ratio("gandalf", "mirewood") < 50.0


def test_syllables():
    assert tn.count_syllables("cat") == 1
    assert tn.count_syllables("window") == 2
    assert tn.count_syllables("hello") == 2
    assert tn.count_syllables("table") == 2     # -le ending kept
    assert tn.count_syllables("made") == 1      # silent trailing e
    assert tn.count_syllables("") == 0


def test_char_ngrams_jaccard():
    a = tn.char_ngrams("gandalf")
    b = tn.char_ngrams("gandaf")
    assert tn.jaccard(a, b) > 0.4
    assert tn.jaccard(a, a) == 1.0
