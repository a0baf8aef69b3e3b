"""High-throughput greedy captioning of the val split (serving path).

Like tools/beam_eval.py but using the bf16 fused encode+greedy-decode
serving pipeline (icd_tpu.decoding.serve) — the configuration behind
the headline captions/s numbers. Works for both model families.

Usage: python tools/greedy_eval.py <ckpt> --model_type attention
       [--batch_size 64] [--max_len 25] [--out ...]
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
    parser.add_argument("--model_type", type=str, default="attention",
                        choices=["baseline", "attention"])
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--max_len", type=int, default=25)
    parser.add_argument("--max_caption_length", type=int, default=-1)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--int8", action="store_true",
                        help="serve the encoder with the static-"
                             "calibration int8 backbone (calibrated on "
                             "the first val batch)")
    parser.add_argument("--act_maxes", type=str, default=None,
                        help="with --int8: .npy file of calibrated "
                             "activation maxes; loaded if it exists, "
                             "else written after calibration (calibrate "
                             "once, serve many)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
    from icd_tpu.data.dataset import COCODataset
    from icd_tpu.decoding.serve import (
        make_attention_captioner, make_captioner, make_int8_captioner)
    from icd_tpu.pathconf import PathConfig
    from icd_tpu.vocabulary import END_TOKEN, START_TOKEN

    chkpt = load_checkpoint(args)
    _, encoder, decoder, _, _, _ = unpack_checkpoint(chkpt)
    encoder = jax.tree_util.tree_map(jnp.asarray, encoder)
    decoder = jax.tree_util.tree_map(jnp.asarray, decoder)

    dataset = COCODataset("val", caption_max_len=args.max_caption_length)
    vocab = dataset.vocab
    start_id, end_id = vocab(START_TOKEN), vocab(END_TOKEN)

    calib = act_maxes = None
    if args.int8:
        if args.act_maxes and os.path.exists(args.act_maxes):
            act_maxes = np.load(args.act_maxes)
            print("Loaded act_maxes from {}".format(args.act_maxes))
        else:
            calib = jnp.asarray(dataset.load_image_batch(
                dataset.img_ids[:args.batch_size]))
    if args.model_type == "baseline":
        if args.int8:
            captioner = make_int8_captioner(
                encoder, decoder, start_id, end_id, max_len=args.max_len,
                calib_imgs=calib, act_maxes=act_maxes)
        else:
            captioner = make_captioner(encoder, decoder, start_id, end_id,
                                       max_len=args.max_len)
    else:
        if args.int8:
            from icd_tpu.decoding.serve import make_int8_attention_captioner
            att = make_int8_attention_captioner(
                encoder, decoder, start_id, end_id, max_len=args.max_len,
                calib_imgs=calib, act_maxes=act_maxes)
            captioner = lambda imgs: att(imgs)[0]  # noqa: E731
        else:
            att = make_attention_captioner(encoder, decoder, start_id,
                                           end_id, max_len=args.max_len)
            captioner = lambda imgs: att(imgs)[0]  # noqa: E731
    if args.int8:
        inner = captioner if args.model_type == "baseline" else att
        if args.act_maxes and act_maxes is None:
            np.save(args.act_maxes, np.asarray(inner.act_maxes))
            print("Saved act_maxes to {}".format(args.act_maxes))

    img_ids = dataset.img_ids
    batch_size = max(1, min(args.batch_size, len(img_ids)))
    results = []
    for i in range(0, len(img_ids), batch_size):
        chunk = img_ids[i: i + batch_size]
        imgs = dataset.load_image_batch(chunk)
        valid = len(chunk)
        if valid < batch_size:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch_size - valid, 0)])
        toks = np.asarray(captioner(jnp.asarray(imgs)))[:valid]
        for img_id, row in zip(chunk, toks):
            words = []
            for t in row:
                if int(t) == end_id:
                    break
                words.append(vocab.i2w[int(t)])
            results.append({"image_id": int(img_id),
                            "caption": " ".join(words)})
        print("captioned {}/{}".format(
            min(i + batch_size, len(img_ids)), len(img_ids)))

    out_path = args.out or os.path.join(
        PathConfig.eval_data,
        "{}_greedy.json".format(args.checkpoint.split(".")[0]))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f)
    print("Wrote {} captions to {}".format(len(results), out_path))


if __name__ == "__main__":
    main()
