"""Tokenizer tests: byte-level BPE machinery with a synthetic vocab, and the
byte fallback used in hermetic environments."""
import json

import pytest

from video_caption_tpu.decode.tokenizer import (
    ByteTokenizer,
    GPT2Tokenizer,
    _bytes_to_unicode,
)


def _tiny_tokenizer():
    b2u = _bytes_to_unicode()
    # base vocab: all 256 byte symbols, then merges building "he", "hel", "hell", "hello"
    symbols = [b2u[i] for i in range(256)]
    merge_strs = [("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o"),
                  ("Ġ", "w"), ("Ġw", "o")]  # Ġ = space marker
    vocab = {s: i for i, s in enumerate(symbols)}
    for a, b in merge_strs:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|endoftext|>"] = len(vocab)
    return GPT2Tokenizer(vocab, merge_strs)


def test_bpe_applies_merges_greedily():
    tok = _tiny_tokenizer()
    ids = tok.encode("hello")
    assert len(ids) == 1
    assert tok.decode(ids) == "hello"


def test_bpe_space_handling_roundtrip():
    tok = _tiny_tokenizer()
    text = "hello world"
    assert tok.decode(tok.encode(text)) == text


def test_bpe_unknown_bytes_roundtrip():
    tok = _tiny_tokenizer()
    text = "zq!?"
    assert tok.decode(tok.encode(text)) == text


def test_byte_fallback_roundtrip():
    tok = ByteTokenizer()
    text = "A man is riding a horse."
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert tok.pad_token_id == tok.eos_token_id == 50256


def test_bytes_to_unicode_reversible():
    m = _bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


@pytest.mark.skipif(
    not pytest.importorskip("transformers"), reason="transformers unavailable"
)
def test_bpe_matches_hf_slow_tokenizer(tmp_path):
    """When real vocab files exist, our BPE must match HF's GPT2Tokenizer.
    Build a small but real vocab from HF's own byte alphabet + no merges."""
    from transformers import GPT2Tokenizer as HFTok

    b2u = _bytes_to_unicode()
    vocab = {b2u[i]: i for i in range(256)}
    vocab["<|endoftext|>"] = 256
    merges = []
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    hf = HFTok(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ours = GPT2Tokenizer(vocab, merges)
    for text in ["hello world", "A man, riding!", "  spaces  ", "café"]:
        assert ours.encode(text) == hf.encode(text), text
