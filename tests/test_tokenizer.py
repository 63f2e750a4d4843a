"""BPE tokenizer behavior (CLIP semantics; synthetic merges — the official merges file
reproduces OpenAI ids bit-exactly when supplied)."""

import os

import numpy as np
import pytest

from embodied_clip_tpu.models.tokenizer import SimpleTokenizer, bytes_to_unicode, tokenize


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_byte_fallback_roundtrip():
    tok = SimpleTokenizer()
    # BPE decode re-inserts a space at each </w> boundary (openai/CLIP semantics), so
    # punctuation comes back space-separated.
    cases = {
        "hello world": "hello world",
        "a photo of a dog.": "a photo of a dog .",
        # single-digit tokens ([\p{N}] in the CLIP pattern) decode space-separated
        "Teleport 42": "teleport 4 2",
    }
    for text, expected in cases.items():
        assert tok.decode(tok.encode(text)) == expected


def test_merges_apply():
    # With merges (h,e),(he,l),(hel,l),(hell,o</w>) the word "hello" collapses.
    merges = [("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o</w>")]
    tok = SimpleTokenizer(merges=merges)
    ids = tok.encode("hello")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "hello</w>"
    assert tok.decode(ids) == "hello"


def test_tokenize_layout():
    tok = SimpleTokenizer()
    arr = tokenize(["hi", "a longer sentence here"], tok, context_length=32)
    assert arr.shape == (2, 32) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot_token
    # EOT is the max id in the vocab → argmax recovers its position (text tower relies
    # on this, clip_text.py).
    assert arr[0].argmax() == len(tok.encode("hi")) + 1
    assert arr[0, arr[0].argmax()] == tok.eot_token
    assert arr[0, arr[0].argmax() + 1 :].sum() == 0


def test_tokenize_truncation():
    tok = SimpleTokenizer()
    long = "word " * 50
    with pytest.raises(RuntimeError):
        tokenize([long], tok, context_length=8)
    arr = tokenize([long], tok, context_length=8, truncate=True)
    assert arr[0, -1] == tok.eot_token


@pytest.mark.skipif("ECT_BPE_PATH" not in os.environ,
                    reason="set ECT_BPE_PATH to the official bpe_simple_vocab_16e6.txt.gz")
def test_official_vocab_reproduces_openai_ids():
    """With the official merges file, token ids match the openai/CLIP tokenizer."""
    tok = SimpleTokenizer(bpe_path=os.environ["ECT_BPE_PATH"])
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    ids = tok.encode("a photo of a cat")
    # openai/CLIP: 'a'=320, 'photo'=1125, 'of'=539, 'cat'=2368
    assert ids == [320, 1125, 539, 320, 2368], ids
