"""Tokenizer golden tests.

``golden_tokens.json`` holds token IDs produced by the reference
``SimpleTokenizer`` (lib/dataset/languages/simple_tokenizer.py) on ASCII
inputs; our from-scratch BPE must match exactly (SURVEY.md §4.2).
"""

import json
import os

import numpy as np
import pytest

from msclip_tpu.data import ClipTokenizer, get_classnames, get_templates

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tokens.json")


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer()


def test_vocab_size(tok):
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


def test_golden_ids(tok):
    with open(GOLDEN) as f:
        golden = json.load(f)
    for text, expected in golden.items():
        got = tok.tokenize(text)[0].tolist()
        assert got == expected, f"mismatch for {text!r}"


def test_output_shape_dtype(tok):
    out = tok.tokenize(["a", "b", "c"])
    assert out.shape == (3, 77)
    assert out.dtype == np.int32


def test_truncation(tok):
    out = tok.tokenize("word " * 200)[0]
    assert out.shape == (77,)
    # truncation cuts the EOT off; all 77 slots are filled
    assert (out != 0).all()


def test_roundtrip(tok):
    ids = tok.encode("a photo of a dog.")
    # decode emits a space at every </w>, so punctuation is space-separated
    # (same as the reference decoder).
    assert tok.decode(ids).strip() == "a photo of a dog ."


def test_all_imagenet_prompts_tokenize(tok):
    """Every (template, classname) pair used by zero-shot eval must fit in
    77 tokens and end with EOT."""
    classnames = get_classnames("imagenet")
    templates = get_templates("imagenet")
    assert len(classnames) == 1000 and len(templates) == 80
    # Check a stratified sample of classes against every template.
    for cls in classnames[::97]:
        texts = [t.format(cls) for t in templates]
        out = tok.tokenize(texts)
        assert out.shape == (80, 77)
        for row in out:
            nonzero = row[row != 0]
            assert nonzero[0] == tok.sot_token
            assert nonzero[-1] == tok.eot_token
