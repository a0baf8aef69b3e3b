"""Create a small local BERT checkpoint for offline --use_bert drives.

The reference downloads bert-base-uncased at runtime
(reference: models/attention.py:96-100); zero-egress environments
instead point BERT_MODEL_DIR at a local save_pretrained directory.
This builds one with bert-base's interface geometry (hidden 768, the
train CLI asserts --embed_size 768) but few layers, with a wordpiece
vocab derived from the current ICD_TPU_ROOT caption vocabulary so the
tokenizer covers the fixture captions.

Usage: ICD_TPU_ROOT=/tmp/synth python tools/make_tiny_bert.py /tmp/tinybert768
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--hidden_size", type=int, default=768)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    from icd_tpu.vocabulary import load_vocab

    vocab = load_vocab()
    pieces = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "<", ">"]
    pieces += sorted({w.strip("<>").lower() for w in vocab.w2i} - {""})
    os.makedirs(args.out_dir, exist_ok=True)
    vocab_txt = os.path.join(args.out_dir, "vocab.txt")
    with open(vocab_txt, "w") as f:
        f.write("\n".join(pieces))
    tokenizer = BertTokenizer(vocab_txt, do_lower_case=True)

    torch.manual_seed(args.seed)
    config = BertConfig(
        vocab_size=len(pieces), hidden_size=args.hidden_size,
        num_hidden_layers=args.layers, num_attention_heads=12,
        intermediate_size=args.hidden_size * 2,
        max_position_embeddings=128)
    model = BertModel(config)
    model.save_pretrained(args.out_dir)
    tokenizer.save_pretrained(args.out_dir)
    print("saved {} ({} wordpieces, hidden {}, {} layers); "
          "export BERT_MODEL_DIR={}".format(
              args.out_dir, len(pieces), args.hidden_size, args.layers,
              args.out_dir))


if __name__ == "__main__":
    main()
