"""Vocabulary: word <-> id maps with COCO-caption construction.

Reproduces the reference semantics exactly (reference: vocabulary.py):
 - special tokens ``<pad>`` / ``<start>`` / ``<end>`` / ``<unk>``
 - token id order: ``<pad>`` = 0 first, then corpus words in first-seen
   order, then ``<start>``, ``<end>``, ``<unk>`` (vocabulary.py:53-58)
 - built from train2014 captions via word_tokenize(caption.lower()) with a
   frequency threshold (default 6, vocabulary.py:38-60)
 - ``vocab(word)`` maps OOV words to ``<unk>`` (vocabulary.py:29-32)
 - pickled to ``pkldata/vocab.pkl`` (vocabulary.py:63-71)
"""

import pickle
from collections import Counter

from .pathconf import PathConfig
from .data.tokenize import word_tokenize

PAD_TOKEN = "<pad>"  # Padding
START_TOKEN = "<start>"  # Start of sentence
END_TOKEN = "<end>"  # End of sentence
UNK_TOKEN = "<unk>"  # Out of vocabulary (unknown)


class Vocabulary:
    """Word <-> id bijection with <unk> fallback (reference: vocabulary.py:15-35)."""

    def __init__(self):
        self.w2i = {}
        self.i2w = {}
        self.idx = 0

    def add_word(self, word):
        if word not in self.w2i:
            self.w2i[word] = self.idx
            self.i2w[self.idx] = word
            self.idx += 1

    def __call__(self, word):
        if word not in self.w2i:
            return self.w2i[UNK_TOKEN]
        return self.w2i[word]

    def __len__(self):
        return len(self.w2i)


def build_vocab(threshold=6, coco=None):
    """Build the vocabulary from train2014 captions.

    Args:
        threshold: Minimum corpus frequency for a word to be kept
            (reference: vocabulary.py:38, default 6).
        coco: Optional pre-built COCO index (icd_tpu.data.coco.COCO); loaded
            from PathConfig.train_anno_file when None.
    """
    if coco is None:
        from .data.coco import COCO

        coco = COCO(PathConfig.train_anno_file)

    counter = Counter()
    for ann_id in coco.anns.keys():
        caption = str(coco.anns[ann_id]["caption"])
        counter.update(word_tokenize(caption.lower()))

    # Insertion order of Counter preserves first-seen order, matching the
    # reference's dict-iteration order on CPython 3.7+.
    words = [word for word, cnt in counter.items() if cnt >= threshold]

    vocab = Vocabulary()
    vocab.add_word(PAD_TOKEN)
    for word in words:
        vocab.add_word(word)
    vocab.add_word(START_TOKEN)
    vocab.add_word(END_TOKEN)
    vocab.add_word(UNK_TOKEN)
    return vocab


def save_vocab(vocab, path=None):
    """Pickle the vocabulary (reference: vocabulary.py:63-65).

    MIGRATION NOTE: vocabularies are tokenizer-dependent. icd_tpu's
    default tokenizer is the built-in Treebank implementation
    (icd_tpu/data/tokenize.py); a vocab.pkl built under real NLTK (the
    reference, or ICD_TPU_USE_NLTK=1) can assign different ids on
    inputs where the two disagree (punkt abbreviation-style sentence
    boundaries). Keep using ICD_TPU_USE_NLTK=1 with such a vocab, or
    rebuild it with ``init.py --vocab True``. (See README 'Tokenizer
    migration'.)"""
    path = path or PathConfig.vocab_file
    with open(path, "wb") as f:
        pickle.dump(vocab, f)


class _CompatUnpickler(pickle.Unpickler):
    """Resolves the reference's pickled class path ('vocabulary.
    Vocabulary', vocabulary.py:63-71) to this module, so vocab.pkl files
    produced by the reference load unchanged."""

    def find_class(self, module, name):
        if module == "vocabulary":
            module = __name__
        return super().find_class(module, name)


def load_vocab(path=None):
    path = path or PathConfig.vocab_file
    with open(path, "rb") as f:
        return _CompatUnpickler(f).load()
