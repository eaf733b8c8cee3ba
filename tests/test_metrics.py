"""WER/CER metric tests against hand-computed alignments."""

from parakeet_tpu.metrics import character_error_rate, corpus_wer, word_error_rate


def test_exact_match():
    r = word_error_rate("the cat sat", "the cat sat")
    assert r.wer == 0.0 and r.ref_words == 3


def test_substitution():
    r = word_error_rate("the cat sat", "the dog sat")
    assert r.wer == 1 / 3
    assert (r.substitutions, r.deletions, r.insertions) == (1, 0, 0)


def test_deletion_insertion():
    r = word_error_rate("a b c d", "a c d")
    assert (r.substitutions, r.deletions, r.insertions) == (0, 1, 0)
    r = word_error_rate("a b", "a x b")
    assert (r.substitutions, r.deletions, r.insertions) == (0, 0, 1)


def test_case_and_whitespace_normalized():
    assert word_error_rate("The  CAT", "the cat").wer == 0.0


def test_empty_reference():
    assert word_error_rate("", "").wer == 0.0
    # empty reference: every hypothesis word is an insertion over a
    # denominator of 1 — the SAME convention corpus_wer aggregates with
    # (review finding: the two entry points used to disagree, 1.0 vs 2.0)
    assert word_error_rate("", "hello").wer == 1.0
    assert word_error_rate("", "hello world").wer == 2.0
    from parakeet_tpu.metrics import corpus_wer
    assert corpus_wer([("", "hello world")]).wer == 2.0


def test_wer_can_exceed_one():
    r = word_error_rate("a", "x y z")
    assert r.wer > 1.0


def test_corpus_weighted():
    pairs = [("a b c d e f g h i j", "a b c d e f g h i j"), ("x", "y")]
    r = corpus_wer(pairs)
    assert abs(r.wer - 1 / 11) < 1e-9


def test_cer():
    assert character_error_rate("abc", "abc") == 0.0
    assert abs(character_error_rate("abcd", "abxd") - 0.25) < 1e-9
