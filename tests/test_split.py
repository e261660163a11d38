"""Splitter tests — ported shapes from reference tests/test_splitter.py."""

from raykg.stages import split


def test_simple_sentences():
    s = split.split_sentences("The cat sat. The dog ran. All was well.")
    assert s == ["The cat sat.", "The dog ran.", "All was well."]


def test_abbreviations_protected():
    # reference tests/test_splitter.py:23-28
    s = split.split_sentences("Mr. Baggins went home. Dr. Gandalf arrived.")
    assert s == ["Mr. Baggins went home.", "Dr. Gandalf arrived."]


def test_dialogue_split():
    s = split.split_sentences('"Go now!" said Tom. "It is late," he added.')
    assert len(s) == 2
    assert s[0] == '"Go now!" said Tom.'


def test_question_exclamation():
    s = split.split_sentences("Who goes there? Halt! The gate is shut.")
    assert len(s) == 3


def test_no_split_before_lowercase():
    # boundary requires a following capital/quote
    s = split.split_sentences("He stopped. then he ran.")
    assert len(s) == 1


def test_paragraph_split():
    paras = split.split_paragraphs("one\n\ntwo\n\n\nthree\n\n")
    assert paras == ["one", "two", "three"]


def test_chapter_arabic_and_roman():
    # reference header regex quirk: ``\s*.*`` lets a header consume the
    # following line, so each chapter needs a sacrificial line
    text = ("Chapter 1\neaten line\n\nfirst body.\n\n"
            "Chapter II\neaten line\n\nsecond body.")
    chs = split.split_chapters(text)
    assert [c[0] for c in chs] == [1, 2]
    assert chs[0][2].strip() == "first body."
    assert chs[1][2].strip() == "second body."


def test_chapter_header_eats_next_line():
    # pinned reference behavior: single-paragraph chapters whose body sits
    # on the line after the header are consumed entirely -> whole text
    # falls back to one chapter (splitter.py:121-124)
    text = "Chapter 1\n\nonly body."
    chs = split.split_chapters(text)
    assert chs == [(1, "Chapter 1", text)]


def test_chapter_fallback_single():
    chs = split.split_chapters("no headers at all here.")
    assert chs == [(1, "Chapter 1", "no headers at all here.")]


def test_prologue_preamble():
    pre = "x" * 150
    text = pre + "\n\nChapter 1\nsacrificial\n\nbody."
    chs = split.split_chapters(text)
    # reference numbering: Prologue is chapter 1, first real chapter 2
    assert chs[0][0] == 1 and chs[0][1] == "Prologue"
    assert chs[1][0] == 2 and chs[1][2].strip() == "body."


def test_unit_ordering_monotone():
    # reference tests/test_splitter.py:92-107 — ordering invariant
    text = ("Chapter 1\nsac\n\nA one. B two.\n\nC three.\n\n"
            "Chapter 2\nsac\n\nD four. E five.")
    units = split.split_doc(text, "txt")
    keys = [(c, p, s) for c, p, s, _, _ in units]
    assert keys == sorted(keys)
    assert keys[0] == (1, 1, 1)
    # paragraph numbering resets per chapter
    assert (2, 1, 1) in keys


def test_code_blocks():
    code = "# module m\nimport a\n\ndef f():\n    a.run()\n"
    units = split.split_doc(code, "py")
    assert len(units) == 2
    assert units[0][4].startswith("# module m")
    assert units[1][4].startswith("def f():")


def test_unit_id_shape():
    uid = split.unit_id_of("a" * 64, 1, 2, 3)
    assert uid == "aaaaaaaaaaaa_c001_p00002_s003"
    # zero-padding keeps lexicographic order == document order
    assert split.unit_id_of("a" * 64, 1, 2, 3) < split.unit_id_of(
        "a" * 64, 1, 10, 1)


def test_max_sentence_length_filter():
    s = split.split_sentences("x" * 1500 + ". Short one.")
    assert s == ["Short one."]
