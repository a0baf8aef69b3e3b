"""Batched beam-search captioning of the val split.

The free-running counterpart of eval.py's teacher-forced protocol:
beam-search-caption every val image fully on device at a large batch
size (reference gen_captions.py does one image at a time in Python) and
write a COCO-results-format JSON
(``[{"image_id": ..., "caption": ...}]``) that loadRes/COCOeval-style
tooling consumes.

Usage: python tools/beam_eval.py <attention checkpoint> [--beam_size 5]
       [--batch_size 64] [--out eval_data/<name>_beam.json]

Defaults to the fastest measured config (static-int8 encoder + bf16
beam, README beam rows); ``--no-int8 --dtype f32`` is the
reference-numerics parity opt-out.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("--beam_size", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--max_caption_length", type=int, default=-1)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="bf16",
                        choices=["bf16", "f32"],
                        help="compute dtype (bf16 is the TPU serving "
                             "default; f32 matches reference numerics)")
    parser.add_argument("--int8", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="static-calibration int8 encoder backbone "
                             "(calibrated on the first val batch). ON by "
                             "default — the fastest measured beam config "
                             "(README beam rows) at proven caption-parity "
                             "floors (tests/test_int8_parity.py); "
                             "--no-int8 --dtype f32 is the reference-"
                             "numerics parity opt-out")
    parser.add_argument("--fused", action="store_true",
                        help="decode with the fused Pallas beam kernel "
                             "(ops/fused_beam.py): all 51 steps in one "
                             "launch, weights VMEM-resident")
    parser.add_argument("--int8_grid", action="store_true",
                        help="XLA beam loop only: int8 encoder grid + "
                             "attention projection inside the decode loop")
    parser.add_argument("--act_maxes", type=str, default=None,
                        help="with --int8: .npy of calibrated activation "
                             "maxes; loaded if present, else written "
                             "after calibration")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
    from icd_tpu.data.dataset import COCODataset
    from icd_tpu.decoding.beam import beam_search_batched
    from icd_tpu.models.encoder import encoder_attention_forward
    from icd_tpu.pathconf import PathConfig
    from icd_tpu.vocabulary import END_TOKEN, START_TOKEN

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.fused and args.int8_grid:
        parser.error("--int8_grid applies to the XLA beam loop only; "
                     "it cannot be combined with --fused")
    if args.fused:
        from icd_tpu.ops.fused_beam import beam_search_fused

        def beam_search_batched(dec, grid, k, s, e):  # noqa: F811
            return beam_search_fused(dec, grid, k, s, e)
    else:
        _beam = beam_search_batched

        def beam_search_batched(dec, grid, k, s, e):  # noqa: F811
            return _beam(dec, grid, k, s, e, int8_grid=args.int8_grid)

    chkpt = load_checkpoint(args)
    _, encoder, decoder, _, _, _ = unpack_checkpoint(chkpt)
    encoder = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(dtype), encoder)
    decoder = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(dtype), decoder)

    dataset = COCODataset("val", caption_max_len=args.max_caption_length)
    vocab = dataset.vocab
    start_id, end_id = vocab(START_TOKEN), vocab(END_TOKEN)

    # One entry per unique image.
    img_ids = dataset.img_ids
    batch_size = max(1, min(args.batch_size, len(img_ids)))

    if args.int8:
        from icd_tpu.models.encoder import ATTENTION_GRID
        from icd_tpu.models.resnet import adaptive_avg_pool2d
        from icd_tpu.models.resnet_int8 import (
            calibrate_act_maxes, quantize_resnet, resnet_int8_forward)
        from icd_tpu.ops.image import normalize_imagenet

        if args.act_maxes and os.path.exists(args.act_maxes):
            act_maxes = np.load(args.act_maxes)
            print("Loaded act_maxes from {}".format(args.act_maxes))
        else:
            calib = jnp.asarray(
                dataset.load_image_batch(img_ids[:batch_size]))
            act_maxes = calibrate_act_maxes(encoder["resnet"], calib,
                                            dtype)
            if args.act_maxes:
                np.save(args.act_maxes, np.asarray(act_maxes))
                print("Saved act_maxes to {}".format(args.act_maxes))
        qresnet = quantize_resnet(encoder["resnet"], act_maxes)

        @jax.jit
        def caption(imgs):
            x = normalize_imagenet(imgs).astype(dtype)
            feats = resnet_int8_forward(qresnet, x, out_dtype=dtype)
            grid = adaptive_avg_pool2d(feats, ATTENTION_GRID)
            return beam_search_batched(
                decoder, grid, args.beam_size, start_id, end_id)
    else:
        @jax.jit
        def caption(imgs):
            grid, _ = encoder_attention_forward(
                encoder, imgs, train=False, compute_dtype=dtype)
            return beam_search_batched(
                decoder, grid.astype(dtype), args.beam_size, start_id,
                end_id)

    results = []
    for i in range(0, len(img_ids), batch_size):
        chunk = img_ids[i: i + batch_size]
        imgs = dataset.load_image_batch(chunk)
        valid = len(chunk)
        if valid < batch_size:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch_size - valid, 0)])
        out = caption(jnp.asarray(imgs))
        seqs = np.asarray(out["seq"])[:valid]
        lens = np.asarray(out["seq_len"])[:valid]
        for img_id, seq, n in zip(chunk, seqs, lens):
            words = [vocab.i2w[int(t)] for t in seq[1: int(n) - 1]]
            results.append({"image_id": int(img_id),
                            "caption": " ".join(words)})
        print("captioned {}/{}".format(
            min(i + batch_size, len(img_ids)), len(img_ids)))

    out_path = args.out or os.path.join(
        PathConfig.eval_data,
        "{}_beam.json".format(args.checkpoint.split(".")[0]))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f)
    print("Wrote {} captions to {}".format(len(results), out_path))


if __name__ == "__main__":
    main()
