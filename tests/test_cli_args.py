"""CLI argument-parsing regression tests (no model execution)."""

import pytest

from parakeet_tpu.cli import main


def test_timestamps_flag_before_positional():
    """--timestamps must not swallow a following audio path (regression:
    nargs='?' made argparse consume the positional as the mode value,
    exit 2). Reaching the audio-vs-features error (exit 1) proves parsing
    succeeded."""
    rc = main(["--timestamps", "clip.wav", "--features", "f.npy"])
    assert rc == 1


def test_timestamp_mode_implies_timestamps():
    # hit the early audio-vs-features exit; parsing must accept the combo
    rc = main(["--timestamp-mode", "sentences", "clip.wav", "--features", "f.npy"])
    assert rc == 1


def test_bad_timestamp_mode_rejected():
    with pytest.raises(SystemExit):
        main(["--timestamp-mode", "bogus", "clip.wav"])


def test_quantize_choices():
    with pytest.raises(SystemExit):
        main(["--quantize", "int2", "clip.wav"])
    # valid mode parses through to the audio-vs-features error (exit 1)
    rc = main(["--quantize", "int4", "clip.wav", "--features", "f.npy"])
    assert rc == 1


def test_align_rejected_with_features(capsys):
    rc = main(["--align", "hello world", "--features", "f.npy"])
    assert rc == 1
    assert "--align" in capsys.readouterr().err


def test_align_rejects_decode_flags(capsys):
    rc = main(["--align", "hi", "--beam-size", "4", "clip.wav"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "--beam-size" in err and "--align" in err


def test_align_rejected_for_streaming_models(capsys):
    rc = main(["--model", "eou-120m", "--align", "hi", "--random-weights",
               "clip.wav"])
    assert rc == 1
    assert "--align" in capsys.readouterr().err


def test_quantize_rejected_for_streaming_models(capsys):
    rc = main(["--model", "eou-120m", "--quantize", "int4", "--random-weights",
               "clip.wav"])
    assert rc == 1
    assert "--quantize" in capsys.readouterr().err
