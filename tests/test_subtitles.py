"""SRT/WebVTT subtitle rendering (text/subtitles.py) — cue grouping rules,
timecode formatting, and the CLI writer helper."""

import pytest

from parakeet_tpu.cli import _write_subtitles, main
from parakeet_tpu.decode.timestamp import WordTimestamp
from parakeet_tpu.text.subtitles import (
    build_cues,
    format_srt,
    format_vtt,
)


def W(word, start, end, conf=1.0):
    return WordTimestamp(word, start, end, conf)


def test_gap_splits_cues():
    words = [W("hello", 0.0, 0.4), W("world", 0.5, 0.9),
             W("again", 2.5, 3.0)]  # 1.6 s gap > max_gap=1.0
    cues = build_cues(words)
    assert [c.text for c in cues] == ["hello world", "again"]
    assert cues[0].start == 0.0 and cues[1].start == 2.5


def test_sentence_end_splits_cues():
    words = [W("Done.", 0.0, 0.5), W("Next", 0.6, 1.0)]
    cues = build_cues(words)
    assert [c.text for c in cues] == ["Done.", "Next"]


def test_max_duration_splits_cues():
    words = [W(f"w{i}", i * 0.9, i * 0.9 + 0.5) for i in range(10)]
    cues = build_cues(words, max_duration=3.0, max_gap=5.0)
    assert len(cues) > 1
    for c in cues:
        assert c.end - c.start <= 3.0 + 0.5  # last word may finish the window


def test_wrapping_and_text_budget():
    # 8 words x 6 chars ≈ 55 chars > 2 lines x 20 → must split into cues,
    # and each cue's lines respect the 20-char budget
    words = [W("abcdef", i * 0.2, i * 0.2 + 0.1) for i in range(8)]
    cues = build_cues(words, max_line_chars=20, max_lines=2, max_gap=9.0)
    assert len(cues) >= 2
    for c in cues:
        assert len(c.lines) <= 2
        for line in c.lines:
            assert len(line) <= 20


def test_overlong_word_gets_own_line():
    cues = build_cues([W("x" * 50, 0.0, 1.0)], max_line_chars=10)
    assert cues[0].lines == ["x" * 50]


def test_min_duration_padding_clamped_to_next_cue():
    words = [W("Hi.", 0.0, 0.1), W("There.", 0.3, 2.0)]
    cues = build_cues(words, min_duration=0.5)
    assert cues[0].end == 0.3  # padded 0.1 → 0.5 would overlap; clamp to next start
    assert cues[1].end == 2.0


def test_min_duration_padding_last_cue():
    cues = build_cues([W("Hi", 0.0, 0.1)], min_duration=0.5)
    assert cues[0].end == pytest.approx(0.5)


def test_srt_format_exact():
    words = [W("Hello", 0.0, 0.5), W("world.", 0.6, 1.25),
             W("Bye.", 3.0, 3.75)]
    out = format_srt(words)
    assert out == (
        "1\n00:00:00,000 --> 00:00:01,250\nHello world.\n\n"
        "2\n00:00:03,000 --> 00:00:03,750\nBye.\n\n"
    )


def test_vtt_format_exact():
    words = [W("Hi.", 7322.5, 7323.125)]  # 2h 2m 2.5s
    out = format_vtt(words)
    assert out == (
        "WEBVTT\n\n02:02:02.500 --> 02:02:03.125\nHi.\n\n"
    )


def test_empty_inputs():
    assert format_srt([]) == ""
    assert format_vtt([]) == "WEBVTT\n\n"
    assert build_cues([]) == []


class _Res:
    def __init__(self, words):
        self.word_timestamps = words


def test_write_subtitles_single_file(tmp_path):
    target = tmp_path / "out.srt"
    _write_subtitles(str(target), "srt", format_srt, ["a.wav"],
                     [_Res([W("hi", 0.0, 1.0)])])
    assert target.read_text().startswith("1\n00:00:00,000")


def test_write_subtitles_multi_input_directory(tmp_path):
    target = tmp_path / "subs"
    _write_subtitles(str(target), "vtt", format_vtt, ["a.wav", "b/c.flac"],
                     [_Res([W("hi", 0.0, 1.0)]), _Res([W("yo", 0.0, 1.0)])])
    assert (target / "a.vtt").read_text().startswith("WEBVTT")
    assert "yo" in (target / "c.vtt").read_text()


def test_write_subtitles_stdout(capsys):
    _write_subtitles("-", "srt", format_srt, ["a.wav"],
                     [_Res([W("hi", 0.0, 1.0)])])
    assert "00:00:00,000" in capsys.readouterr().out


def test_cli_srt_implies_timestamps():
    # hits the early audio-vs-features exit (1); parsing must accept --srt
    rc = main(["--srt", "out.srt", "clip.wav", "--features", "f.npy"])
    assert rc == 1


def test_write_subtitles_colliding_stems(tmp_path):
    """Same basename from two dirs (or --features 'x.npy[i]' pseudo-names)
    must not silently overwrite — colliding stems get the input index."""
    target = tmp_path / "subs"
    _write_subtitles(str(target), "srt", format_srt,
                     ["d1/x.wav", "d2/x.wav", "y.wav"],
                     [_Res([W("one", 0.0, 1.0)]), _Res([W("two", 0.0, 1.0)]),
                      _Res([W("three", 0.0, 1.0)])])
    assert "one" in (target / "x.0.srt").read_text()
    assert "two" in (target / "x.1.srt").read_text()
    assert "three" in (target / "y.srt").read_text()  # unique stem unchanged

    target2 = tmp_path / "subs2"
    _write_subtitles(str(target2), "srt", format_srt,
                     ["batch.npy[0]", "batch.npy[1]"],
                     [_Res([W("a", 0.0, 1.0)]), _Res([W("b", 0.0, 1.0)])])
    assert sorted(p.name for p in target2.iterdir()) == ["batch.0.srt", "batch.1.srt"]


def test_srt_rejected_for_streaming_models(capsys):
    """--srt/--vtt are offline-only and must fail loudly, like --vad/--lm
    (previously they were silently ignored: exit 0, no file written)."""
    rc = main(["clip.wav", "--model", "eou-120m", "--random-weights",
               "--srt", "out.srt"])
    assert rc == 1
    assert "--srt" in capsys.readouterr().err


def test_wrap_never_exceeds_max_lines():
    """Three 22-char words pass a 2x42 char budget but no layout fits them
    in 2 lines; the cue builder must wrap-test, not char-count."""
    long = "x" * 22
    words = [W(long, i * 0.5, i * 0.5 + 0.4) for i in range(3)]
    cues = build_cues(words)
    assert all(len(c.lines) <= 2 for c in cues)
    assert sum(len(c.lines) for c in cues) >= 2  # all words still present
    got = " ".join(" ".join(c.lines) for c in cues).split()
    assert got == [long] * 3
