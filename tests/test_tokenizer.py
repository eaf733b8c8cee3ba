"""Tokenizer tests (ported strategy from reference test_all.cpp:434-477)."""

import pytest

from parakeet_tpu.text.tokenizer import Tokenizer, SP_MARKER


@pytest.fixture
def tok(tmp_path):
    vocab = ["<unk>", f"{SP_MARKER}the", f"{SP_MARKER}cat", "s", f"{SP_MARKER}sat", ".",
             f"{SP_MARKER}on", f"{SP_MARKER}mat", "ting"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    t = Tokenizer()
    t.load(p)
    return t


def test_load_counts(tok):
    assert tok.vocab_size() == 9
    assert tok.loaded


def test_load_with_scores(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text(f"{SP_MARKER}hello\t-2.5\nworld\t-3.0\n")
    t = Tokenizer(p)
    assert t.pieces == [f"{SP_MARKER}hello", "world"]


def test_decode_basic(tok):
    assert tok.decode([1, 2, 3]) == "the cats"


def test_decode_strips_single_leading_space(tok):
    assert tok.decode([1]) == "the"


def test_decode_oov(tok):
    assert tok.decode([1, 99]) == "the[99]"
    assert tok.decode([-1]) == "[-1]"


def test_decode_empty(tok):
    assert tok.decode([]) == ""


def test_encode_greedy_longest_match(tok):
    # "the cats" → ▁the ▁cat s
    assert tok.encode("the cats") == [1, 2, 3]


def test_encode_skips_unknown(tok):
    # 'z' not representable; skipped
    assert tok.encode("the z cats") == [1, 2, 3]


def test_encode_decode_roundtrip(tok):
    text = "the cat sat on mat"
    assert tok.decode(tok.encode(text)) == text


def test_encode_empty(tok):
    assert tok.encode("") == []
