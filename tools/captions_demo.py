"""Side-by-side caption comparison across trained checkpoints.

Script equivalent of the reference's captions.ipynb (cells 0-5): loads
each listed checkpoint, teacher-forced-argmax captions N random val
images with every model side by side, and prints image path, ground
truth, and per-model captions. Seeded like the notebook
(torch.manual_seed(67) -> here a fixed numpy seed).

Usage: python tools/captions_demo.py ckpt1[:baseline] ckpt2[:attention] ...
       [--num_images 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def caption_teacher_forced(model_type, encoder, decoder, img, caption,
                           vocab, bert_embedder=None):
    """Argmax caption under teacher forcing, like captions.ipynb.

    For BERT-trained checkpoints the notebook's pickled decoder module
    teacher-forces with BERT embeddings (its forward checks
    ``self.use_bert``, reference attention.py:242-247); pass
    ``bert_embedder`` to reproduce that."""
    import jax
    import jax.numpy as jnp

    from icd_tpu.models.attention import attention_decoder_forward
    from icd_tpu.models.baseline import baseline_decoder_forward
    from icd_tpu.models.encoder import (
        encoder_attention_forward, encoder_forward)
    from icd_tpu.vocabulary import END_TOKEN, PAD_TOKEN, START_TOKEN

    special = {vocab(START_TOKEN), vocab(END_TOKEN), vocab(PAD_TOKEN)}
    imgs = jnp.asarray(img[None])
    caps = jnp.asarray(caption[None])
    if model_type == "baseline":
        feats, _ = encoder_forward(encoder, imgs, train=False)
        scores = baseline_decoder_forward(decoder, feats, caps)
    else:
        grid, _ = encoder_attention_forward(encoder, imgs, train=False)
        embeddings = (bert_embedder(np.asarray(caps))
                      if bert_embedder is not None else None)
        scores, _ = attention_decoder_forward(
            decoder, grid, caps,
            jnp.asarray([caps.shape[1] - 1], jnp.int32),
            embeddings=embeddings)
    preds = np.asarray(jnp.argmax(scores, axis=-1))[0]
    words = [vocab.i2w[int(t)] for t in preds if int(t) not in special]
    return " ".join(words)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoints", nargs="+",
                        help="name.ckpt[:model_type] entries")
    parser.add_argument("--num_images", type=int, default=3)
    parser.add_argument("--seed", type=int, default=67)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
    from icd_tpu.data.dataset import COCODataset

    models = []
    bert_embedder = None
    dataset = COCODataset("val", caption_max_len=-1)
    for entry in args.checkpoints:
        name, _, mtype = entry.partition(":")
        mtype = mtype or ("attention" if "att" in name else "baseline")
        chkpt = load_checkpoint(name=name, verbose=False)
        _, enc, dec, _, _, _ = unpack_checkpoint(chkpt)
        enc = jax.tree_util.tree_map(jnp.asarray, enc)
        dec = jax.tree_util.tree_map(jnp.asarray, dec)
        embedder = None
        if (chkpt.get("config") or {}).get("use_bert", False):
            if bert_embedder is None:
                from icd_tpu.models.bert_embed import BertCaptionEmbedder

                # Host torch forward by default, like evaluate(): the
                # demo reproduces the notebook's captions, and device
                # BERT's bf16-truncated matmuls can flip near-tie
                # argmaxes. ICD_TPU_BERT_DEVICE=1 opts into the device
                # path.
                bert_embedder = BertCaptionEmbedder(
                    dataset.vocab,
                    device=bool(os.environ.get("ICD_TPU_BERT_DEVICE")))
            embedder = bert_embedder
        models.append((name, mtype, enc, dec, embedder))
    rng = np.random.default_rng(args.seed)
    for idx in rng.choice(len(dataset), args.num_images, replace=False):
        img, caption, img_path, _ = dataset[int(idx)]
        truth = " ".join(dataset.vocab.i2w[int(t)] for t in caption[1:-1])
        print("=" * 60)
        print("image:", img_path)
        print("truth:", truth)
        for name, mtype, enc, dec, embedder in models:
            cap = caption_teacher_forced(
                mtype, enc, dec, img, caption, dataset.vocab,
                bert_embedder=embedder)
            print("{:>24}: {}".format(name, cap))


if __name__ == "__main__":
    main()
