"""Vocabulary construction semantics (reference: vocabulary.py)."""

import pickle

from icd_tpu.vocabulary import (
    END_TOKEN, PAD_TOKEN, START_TOKEN, UNK_TOKEN,
    Vocabulary, build_vocab, load_vocab, save_vocab)


def test_token_order(use_coco_root):
    """<pad>=0 first, then corpus words, then <start>, <end>, <unk>
    (reference: vocabulary.py:52-58)."""
    vocab = build_vocab(threshold=1)
    assert vocab(PAD_TOKEN) == 0
    n = len(vocab)
    assert vocab(START_TOKEN) == n - 3
    assert vocab(END_TOKEN) == n - 2
    assert vocab(UNK_TOKEN) == n - 1
    # Corpus words occupy 1..n-4.
    assert vocab("a") >= 1
    assert vocab("man") < n - 3


def test_threshold_filters_rare_words(use_coco_root):
    vocab_all = build_vocab(threshold=1)
    vocab_thresh = build_vocab(threshold=2)
    assert len(vocab_thresh) < len(vocab_all)
    # 'a' appears many times -> kept either way.
    assert vocab_thresh("a") != vocab_thresh(UNK_TOKEN)
    # 'beach' appears once -> dropped at threshold 2, maps to <unk>.
    assert vocab_thresh("beach") == vocab_thresh(UNK_TOKEN)


def test_oov_maps_to_unk(tiny_vocab):
    assert tiny_vocab("zzz-not-a-word") == tiny_vocab(UNK_TOKEN)


def test_roundtrip_pickle(use_coco_root, tmp_path):
    vocab = build_vocab(threshold=1)
    path = str(tmp_path / "v.pkl")
    save_vocab(vocab, path)
    loaded = load_vocab(path)
    assert loaded.w2i == vocab.w2i
    assert loaded.i2w == vocab.i2w


def test_lowercasing(use_coco_root):
    """Captions are lowercased before tokenization (vocabulary.py:45)."""
    vocab = build_vocab(threshold=1)
    assert "A" not in vocab.w2i
    assert "a" in vocab.w2i
