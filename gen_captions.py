"""Caption generation via beam search (reference: gen_captions.py).

Library functions mirroring the reference surface, plus a CLI the
reference lacked (its ``args.beam_size`` was never wired to a parser —
gen_captions.py:33):

    python gen_captions.py <checkpoint> <image> [--beam_size 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def attention_caption_image_beam_search(args, img, encoder, decoder, vocab):
    """Beam-search caption one image (reference: gen_captions.py:16-131).

    Returns (seq, alphas, Caption_End).
    """
    from icd_tpu.decoding.beam import (
        attention_caption_image_beam_search as _impl)

    return _impl(args, img, encoder, decoder, vocab)


def load_img(path):
    """Load an image the way the reference's beam-search loader does:
    /255 scaling WITHOUT ImageNet mean/std (gen_captions.py:133-143),
    resized to 224x224, shaped (1, H, W, 3) float32 NHWC."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((224, 224), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return arr[None]


def main():
    parser = argparse.ArgumentParser(description="Caption generation")
    parser.add_argument("checkpoint", type=str,
                        help="checkpoint of trained attention model.")
    parser.add_argument("image", type=str, help="path to image.")
    parser.add_argument("--beam_size", type=int, default=5,
                        help="beam size.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
    from icd_tpu.vocabulary import load_vocab

    chkpt = load_checkpoint(args)
    _, encoder, decoder, _, _, _ = unpack_checkpoint(chkpt)
    encoder = jax.tree_util.tree_map(jnp.asarray, encoder)
    decoder = jax.tree_util.tree_map(jnp.asarray, decoder)
    vocab = load_vocab()

    img = load_img(args.image)
    seq, alphas, found = attention_caption_image_beam_search(
        args, img, encoder, decoder, vocab)
    words = [vocab.i2w[t] for t in seq]
    print(" ".join(words))
    if not found:
        print("(beam search did not complete a caption)")


if __name__ == "__main__":
    main()
