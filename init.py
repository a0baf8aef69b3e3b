"""Init CLI — flag-compatible with the reference init.py (init.py:20-39).

Builds the vocabulary pickle and/or the GloVe weight matrix.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icd_tpu.pathconf import PathConfig


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Create resized dataset and vocabulary.")
    parser.add_argument("--vocab", nargs="?", type=bool, default=False,
                        help="Build vocabulary.")
    parser.add_argument("--vocab_threshold", nargs="?", type=int, default=6,
                        help="Vocabulary frequency threshold.")
    parser.add_argument("--glove", nargs="?", type=bool, default=False,
                        help="Generate glove vectors.")
    args = parser.parse_args()

    if args.vocab:
        print("Building vocabulary...")
        from icd_tpu.vocabulary import build_vocab, save_vocab

        vocab = build_vocab(args.vocab_threshold)
        os.makedirs(PathConfig.pkldata_dir, exist_ok=True)
        save_vocab(vocab)
        print("Vocabulary saved to {}.".format(PathConfig.vocab_file))

    if args.glove:
        from icd_tpu.data.embed import generate_glove_vectors

        generate_glove_vectors()
