"""Timestamp grouping tests (strategy from reference test_all.cpp:45-129)."""

from parakeet_tpu.decode.timestamp import (
    FRAME_DURATION_S,
    TimestampedToken,
    TimestampMode,
    frame_to_seconds,
    group_timestamps,
)

M = "▁"
PIECES = [f"{M}hello", f"{M}wor", "ld", f"{M}done.", f"{M}next", "!", f"{M}ok"]


def test_frame_duration():
    assert abs(FRAME_DURATION_S - 8 * 160 / 16000) < 1e-9
    assert frame_to_seconds(10) == 0.8


def test_empty():
    assert group_timestamps([], PIECES) == []


def test_single_word():
    toks = [TimestampedToken(0, 2, 5, 0.9)]
    words = group_timestamps(toks, PIECES)
    assert len(words) == 1
    assert words[0].word == "hello"
    assert abs(words[0].start - 0.16) < 1e-6
    assert abs(words[0].end - 0.4) < 1e-6
    assert abs(words[0].confidence - 0.9) < 1e-6


def test_subword_merging():
    toks = [TimestampedToken(1, 0, 1, 0.8), TimestampedToken(2, 2, 3, 0.6)]
    words = group_timestamps(toks, PIECES)
    assert len(words) == 1
    assert words[0].word == "world"
    assert words[0].start == 0.0
    assert abs(words[0].end - 3 * FRAME_DURATION_S) < 1e-6
    # word confidence = min of token confidences
    assert abs(words[0].confidence - 0.6) < 1e-6


def test_multiple_words():
    toks = [
        TimestampedToken(0, 0, 1, 1.0),
        TimestampedToken(1, 2, 3, 1.0),
        TimestampedToken(2, 4, 5, 1.0),
    ]
    words = group_timestamps(toks, PIECES)
    assert [w.word for w in words] == ["hello", "world"]


def test_oov_tokens_skipped():
    toks = [TimestampedToken(0, 0, 1, 1.0), TimestampedToken(99, 2, 3, 1.0)]
    words = group_timestamps(toks, PIECES)
    assert [w.word for w in words] == ["hello"]


def test_sentence_mode():
    toks = [
        TimestampedToken(0, 0, 1, 0.9),  # hello
        TimestampedToken(3, 2, 3, 0.8),  # done.
        TimestampedToken(4, 4, 5, 0.7),  # next
        TimestampedToken(5, 6, 7, 0.6),  # !
        TimestampedToken(6, 8, 9, 1.0),  # ok (no terminator — flushed)
    ]
    sents = group_timestamps(toks, PIECES, TimestampMode.SENTENCES)
    assert [s.word for s in sents] == ["hello done.", "next!", "ok"]
    assert abs(sents[0].confidence - 0.8) < 1e-6
    assert sents[0].start == 0.0
    assert abs(sents[1].end - 7 * FRAME_DURATION_S) < 1e-6
