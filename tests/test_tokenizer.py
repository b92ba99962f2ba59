"""CLIP BPE tokenizer algorithm tests with a synthetic merges table."""

import gzip

import numpy as np
import pytest

from camc2v_tpu.data.tokenizer import (
    HashTokenizer,
    SimpleTokenizer,
    bytes_to_unicode,
    default_tokenizer,
    whitespace_clean,
)


@pytest.fixture(scope="module")
def bpe_file(tmp_path_factory):
    # minimal merges: enough to merge 'h e', 'he l', 'hel l', 'hell o</w>'
    path = tmp_path_factory.mktemp("bpe") / "merges.txt"
    merges = [
        "#version: 0.2",
        "h e",
        "l l",
        "he ll",
        "hell o</w>",
        "w o",
        "r l",
        "wo rl",
        "worl d</w>",
    ]
    path.write_text("\n".join(merges) + "\n")
    return str(path)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_bpe_merges(bpe_file):
    tok = SimpleTokenizer(bpe_file, context_length=16)
    ids = tok.encode("hello world")
    # both words fully merged into single tokens
    assert ids == [tok.encoder["hello</w>"], tok.encoder["world</w>"]]


def test_call_padding_and_specials(bpe_file):
    tok = SimpleTokenizer(bpe_file, context_length=8)
    out = tok(["hello"])
    assert out.shape == (1, 8)
    assert out[0, 0] == tok.sot
    assert out[0, 2] == tok.eot
    assert (out[0, 3:] == 0).all()


def test_truncation_keeps_eot(bpe_file):
    tok = SimpleTokenizer(bpe_file, context_length=4)
    out = tok(["hello hello hello hello hello"])
    assert out.shape == (1, 4)
    assert out[0, -1] == tok.eot


def test_gzip_support(bpe_file, tmp_path):
    gz = tmp_path / "merges.txt.gz"
    with open(bpe_file, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    tok = SimpleTokenizer(str(gz), context_length=8)
    assert tok.encode("hello") == [tok.encoder["hello</w>"]]


def test_text_cleanup():
    assert whitespace_clean("  a \n\t b  ") == "a b"


def test_hash_tokenizer_fallback():
    tok = default_tokenizer(None, context_length=10)
    assert isinstance(tok, HashTokenizer)
    out = tok("a simple caption")
    assert out.shape == (1, 10)
    assert out[0, 0] == tok.sot
    # deterministic
    np.testing.assert_array_equal(out, tok("a simple caption"))
