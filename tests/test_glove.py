"""GloVe embedding matrix construction + --use_glove training path."""

import os
import pickle

import numpy as np
import pytest

import icd_tpu.training.baseline as tb
from icd_tpu.data.embed import generate_glove_vectors, load_glove_vectors
from icd_tpu.vocabulary import load_vocab

from helpers import (
    SMALL_DIM, make_train_args, small_init_encoder,
    small_init_encoder_attention)


def _write_glove_txt(path, words, dim=300, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for w in words:
            vec = rng.normal(size=dim)
            f.write(w + " " + " ".join("{:.5f}".format(v) for v in vec)
                    + "\n")


def test_generate_and_load(use_coco_root, tmp_path):
    vocab = load_vocab()
    known = ["a", "man", "dog", "horse", "the"]
    txt = str(tmp_path / "glove.6B.300d.txt")
    _write_glove_txt(txt, known)
    out = str(tmp_path / "glove_vectors.pkl")
    matrix = generate_glove_vectors(vocab=vocab, glove_txt=txt,
                                    out_path=out)
    assert matrix.shape == (len(vocab), 300)

    loaded = load_glove_vectors(out)
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, matrix.astype(np.float32))

    # Known words got their GloVe rows; OOV rows are random-normal.
    with open(txt) as f:
        first = np.asarray(f.readline().split()[1:], np.float64)
    np.testing.assert_allclose(matrix[vocab("a")], first, atol=1e-5)
    assert matrix[vocab("<pad>")].std() > 0  # random, not zeros


def test_use_glove_driver(use_coco_root, tmp_path, monkeypatch):
    monkeypatch.setattr(tb, "init_encoder", small_init_encoder)
    vocab = load_vocab()
    txt = str(tmp_path / "g.txt")
    _write_glove_txt(txt, ["a", "man", "dog"], dim=300)
    glove_dir = os.path.join(use_coco_root, "glove.6B")
    os.makedirs(glove_dir, exist_ok=True)
    generate_glove_vectors(
        vocab=vocab, glove_txt=txt,
        out_path=os.path.join(glove_dir, "glove_vectors.pkl"))

    args = make_train_args(
        model_name="bl_glove", batch_size=4, epochs=1, embed_size=300,
        decoder_dim=12, workers=0, use_glove=True)
    params = tb.train(args)
    # The decoder embedding must be the GloVe matrix (frozen by default).
    glove = load_glove_vectors(
        os.path.join(glove_dir, "glove_vectors.pkl"))
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embedding"]), glove, atol=1e-6)


def test_use_glove_attention_driver(use_coco_root, tmp_path, monkeypatch):
    import functools

    import icd_tpu.models.attention as ma
    import icd_tpu.training.attention as ta

    monkeypatch.setattr(
        ta, "init_encoder_attention", small_init_encoder_attention)
    monkeypatch.setattr(
        ta, "init_attention_decoder",
        functools.partial(ma.init_attention_decoder,
                          encoder_dim=SMALL_DIM))
    vocab = load_vocab()
    txt = str(tmp_path / "g.txt")
    _write_glove_txt(txt, ["a", "man", "horse"], dim=300)
    glove_dir = os.path.join(use_coco_root, "glove.6B")
    os.makedirs(glove_dir, exist_ok=True)
    generate_glove_vectors(
        vocab=vocab, glove_txt=txt,
        out_path=os.path.join(glove_dir, "glove_vectors.pkl"))

    args = make_train_args(
        model_name="att_glove", model="attention", batch_size=4,
        epochs=1, embed_size=300, decoder_dim=12, attention_dim=10,
        workers=0, use_glove=True)
    params = ta.train(args)
    glove = load_glove_vectors(
        os.path.join(glove_dir, "glove_vectors.pkl"))
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embedding"]), glove, atol=1e-6)


def test_reference_bug_compat_all_random(use_coco_root, tmp_path):
    """ICD_TPU_GLOVE_REFBUG reproduces the reference's broken id-keyed
    lookup (embed.py:51-56 iterates the i2w dict's int keys): every row
    random, zero words found, regardless of GloVe coverage."""
    vocab = load_vocab()
    known = [vocab.i2w[i] for i in range(len(vocab))]  # full coverage
    txt = str(tmp_path / "glove.6B.300d.txt")
    _write_glove_txt(txt, known)
    out = str(tmp_path / "gv.pkl")

    rng = np.random.default_rng(3)
    compat = generate_glove_vectors(
        vocab, glove_txt=txt, out_path=out, rng=rng,
        reference_bug_compat=True)
    glove = {}
    with open(txt, "rb") as f:
        for raw in f:
            line = raw.decode().split()
            glove[line[0]] = np.asarray(line[1:], np.float64)
    # No row matches its GloVe vector: the reference never finds a word.
    for i in range(len(vocab)):
        assert not np.allclose(compat[i], glove[vocab.i2w[i]])

    # Default mode finds every covered word.
    fixed = generate_glove_vectors(
        vocab, glove_txt=txt, out_path=out,
        rng=np.random.default_rng(3), reference_bug_compat=False)
    for i in range(len(vocab)):
        np.testing.assert_allclose(fixed[i], glove[vocab.i2w[i]],
                                   atol=1e-4)
