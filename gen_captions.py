"""Caption generation via beam search (reference: gen_captions.py).

Library functions mirroring the reference surface, plus a CLI the
reference lacked (its ``args.beam_size`` was never wired to a parser —
gen_captions.py:33):

    python gen_captions.py <checkpoint> <image> [--beam_size 5]
        [--encoder int8|float] [--dtype bf16|f32]

The CLI defaults to the fastest measured serving configuration — the
static-int8 encoder backbone (calibrated on the input image) feeding
the bf16 beam loop — which is token-identical to the float path on the
oracle fixture at the proven parity floors (tests/test_int8_parity.py).
``--encoder float --dtype f32`` is the reference-numerics opt-out.
The library wrapper ``attention_caption_image_beam_search`` stays
reference-exact f32 regardless.
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


def _beam_search_int8(args, img, encoder, decoder, vocab, dtype):
    """int8-encoder + ``dtype`` beam — the serving default.

    Mirrors tools/beam_eval.py's fast path at batch 1: per-channel int8
    conv weights with activation maxes calibrated on the input image
    itself, beam loop in ``dtype``. Note the beam loader's /255-only
    scaling (no ImageNet normalize) is part of the reference protocol
    (gen_captions.py:133-143), so the raw image feeds the grid directly.
    """
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.beam import beam_search
    from icd_tpu.models.encoder import ATTENTION_GRID
    from icd_tpu.models.resnet import adaptive_avg_pool2d
    from icd_tpu.models.resnet_int8 import (
        calibrate_act_maxes, quantize_resnet, resnet_int8_forward)
    from icd_tpu.vocabulary import END_TOKEN, START_TOKEN

    encoder = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(dtype), encoder)
    decoder = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(dtype), decoder)
    x = jnp.asarray(img).astype(dtype)
    act_maxes = calibrate_act_maxes(encoder["resnet"], x, dtype)
    qresnet = quantize_resnet(encoder["resnet"], act_maxes)
    feats = resnet_int8_forward(qresnet, x, out_dtype=dtype)
    grid = adaptive_avg_pool2d(feats, ATTENTION_GRID)
    gh, gw = grid.shape[1], grid.shape[2]
    flat = grid.reshape(1, -1, grid.shape[-1])[0]
    out = beam_search(decoder, flat, args.beam_size,
                      start_id=vocab(START_TOKEN),
                      end_id=vocab(END_TOKEN))
    found = bool(out["found"])
    if not found:
        return [vocab(START_TOKEN), vocab(END_TOKEN)], [], False
    n = int(out["seq_len"])
    seq = [int(t) for t in np.asarray(out["seq"])[:n]]
    alphas = [np.asarray(a).reshape(gh, gw)
              for a in np.asarray(out["alphas"])[:n]]
    return seq, alphas, True


def main():
    parser = argparse.ArgumentParser(description="Caption generation")
    parser.add_argument("checkpoint", type=str,
                        help="checkpoint of trained attention model.")
    parser.add_argument("image", type=str, help="path to image.")
    parser.add_argument("--beam_size", type=int, default=5,
                        help="beam size.")
    parser.add_argument("--encoder", type=str, default="int8",
                        choices=["int8", "float"],
                        help="encoder backbone: static-int8 (default, "
                             "fastest measured) or float")
    parser.add_argument("--dtype", type=str, default="bf16",
                        choices=["bf16", "f32"],
                        help="compute dtype for the float path / the "
                             "int8 path's non-conv math. '--encoder "
                             "float --dtype f32' reproduces reference "
                             "numerics exactly")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
    from icd_tpu.vocabulary import load_vocab

    chkpt = load_checkpoint(args)
    _, encoder, decoder, _, _, _ = unpack_checkpoint(chkpt)
    vocab = load_vocab()
    img = load_img(args.image)

    if args.encoder == "int8":
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        seq, alphas, found = _beam_search_int8(
            args, img, encoder, decoder, vocab, dtype)
    else:
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        encoder = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(dtype), encoder)
        decoder = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(dtype), decoder)
        seq, alphas, found = attention_caption_image_beam_search(
            args, img, encoder, decoder, vocab)
    words = [vocab.i2w[t] for t in seq]
    print(" ".join(words))
    if not found:
        print("(beam search did not complete a caption)")


if __name__ == "__main__":
    main()
