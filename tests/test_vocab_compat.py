"""Reference-produced vocab.pkl files (module 'vocabulary') load."""

import pickle
import sys
import types


def test_reference_vocab_pickle_loads(tmp_path):
    # Fabricate what the reference's save_vocab produces: an instance
    # whose class path is vocabulary.Vocabulary (vocabulary.py:63-65).
    mod = types.ModuleType("vocabulary")

    class Vocabulary:
        pass

    Vocabulary.__module__ = "vocabulary"
    Vocabulary.__qualname__ = "Vocabulary"
    mod.Vocabulary = Vocabulary
    sys.modules["vocabulary"] = mod
    try:
        v = Vocabulary()
        v.w2i = {"<pad>": 0, "a": 1}
        v.i2w = {0: "<pad>", 1: "a"}
        v.idx = 2
        path = tmp_path / "vocab.pkl"
        with open(path, "wb") as f:
            pickle.dump(v, f)
    finally:
        del sys.modules["vocabulary"]

    from icd_tpu.vocabulary import Vocabulary as Ours, load_vocab

    loaded = load_vocab(str(path))
    assert isinstance(loaded, Ours)
    assert loaded("a") == 1
    assert len(loaded) == 2
