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


def test_encode_matches_reference_byte_semantics():
    """vocab.cpp matches raw BYTES: a raw-byte piece (loaded via
    surrogateescape) must match inside multi-byte characters, and the
    no-match skip advances one byte, not one code point."""
    t = Tokenizer()
    # piece 1 is the raw byte 0xE2 (first byte of '€' = E2 82 AC)
    t.load_pieces(["▁a", b"\xe2".decode("utf-8", "surrogateescape"), "▁x"])
    ids = t.encode("a €x")
    # input bytes: ▁a | ▁(E2 96 81) € (E2 82 AC) x. '▁a' → 0. Then the
    # unmatched ▁'s FIRST byte is 0xE2 → matches the raw-byte piece (1),
    # 96 81 skipped; €'s first byte E2 → 1 again, 82 AC skipped; 'x' has
    # no piece. Byte-level greedy matching, exactly vocab.cpp's semantics
    # (code-point matching would emit [0] only — the raw-byte piece could
    # never match).
    assert ids == [0, 1, 1]


def test_encode_multibyte_unknown_skips_bytewise_consistently():
    """ASCII vocab + multi-byte unknown char: results must equal the old
    code-point matching for well-formed UTF-8 (byte-level is a superset)."""
    t = Tokenizer()
    t.load_pieces(["▁hello", "▁world"])
    assert t.encode("hello € world") == [0, 1]
