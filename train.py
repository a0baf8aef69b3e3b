"""Train CLI — flag-compatible with the reference train.py (train.py:11-79).

Note: bool flags use truthy-string parsing exactly like the reference
(``type=bool``: any non-empty string is True).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icd_tpu.pathconf import PathConfig


def _strict_bool(value):
    """Real boolean parsing for the TPU-extension flags (the reference's
    truthy-string ``type=bool`` quirk is preserved only on reference
    flags, where parity depends on it; '--amp False' must mean False)."""
    lowered = value.strip().lower()
    if lowered in ("true", "1", "yes", "on"):
        return True
    if lowered in ("false", "0", "no", "off", ""):
        return False
    raise argparse.ArgumentTypeError(
        "expected a boolean, got {!r}".format(value))


def build_parser():
    parser = argparse.ArgumentParser(description="Train")
    parser.add_argument("model_name", type=str,
                        help="unique name of model setting; saved with this "
                             "name in checkpoints folder.")
    parser.add_argument("--model", type=str,
                        choices=["baseline", "attention"],
                        help="Model to train")
    parser.add_argument("--attention_dim", type=int, default=512,
                        help="attention dimension.")
    parser.add_argument("--decoder_dim", type=int, default=512,
                        help="decoder dimension.")
    parser.add_argument("--decoder_dropout", type=float, default=0.5,
                        help="decoder dropout probability.")
    parser.add_argument("--embed_size", type=int, default=512,
                        help="embedding dimension. If using pre-trained "
                             "glove vectors, use 300.")
    parser.add_argument("--epochs", type=int, default=1,
                        help="number of epochs to train for (if early "
                             "stopping is not triggered).")
    parser.add_argument("--batch_size", type=int, default=32,
                        help="batch_size.")
    parser.add_argument("--workers", type=int, default=1,
                        help="for data-loading.")
    parser.add_argument("--encoder_lr", type=float, default=1e-4,
                        help="learning rate for encoder if fine-tuning.")
    parser.add_argument("--decoder_lr", type=float, default=1e-4,
                        help="learning rate for decoder.")
    parser.add_argument("--grad_clip", type=float, default=5.,
                        help="clip gradients at an absolute value of.")
    parser.add_argument("--alpha_c", type=float, default=1.,
                        help="regularization parameter for doubly stochastic "
                             "attention, as in the paper.")
    parser.add_argument("--fine_tune_encoder", type=bool, default=False,
                        help="whether to fine-tune encoder or not.")
    parser.add_argument("--fine_tune_embedding", type=bool, default=False,
                        help="whether to fine-tune word embeddings or not.")
    parser.add_argument("--checkpoint", default=None, type=str,
                        help="name of checkpoint in ./checkpoints folder; "
                             "None if none.")
    parser.add_argument("--print_freq", type=int, default=1,
                        help="print training/validation stats every __ "
                             "batches.")
    parser.add_argument("--use_glove", type=bool, default=False,
                        help="whether to use pre-trained glove embeddings.")
    parser.add_argument("--max_caption_length", type=int, default=-1,
                        help="only use captions with caption length <= 50 "
                             "when training.")
    parser.add_argument("--use_bert", type=bool, default=False,
                        help="whether to use BERT embeddigns for attention "
                             "model.")
    # TPU extension (not in the reference CLI): bf16 mixed precision.
    parser.add_argument("--amp", type=_strict_bool, default=False,
                        help="bf16 mixed-precision training (f32 master "
                             "weights, loss, optimizer and BN statistics); "
                             "TPU extension, default off for reference-"
                             "parity f32 numerics.")
    parser.add_argument("--int8_encoder", type=_strict_bool, default=False,
                        help="run the FROZEN encoder backbone as the "
                             "static-calibration int8 trunk during "
                             "training (calibrated on one batch). TPU "
                             "extension, default off: features are "
                             "int8-perturbed and BN running statistics "
                             "do not update during training.")
    return parser


def main():
    args = build_parser().parse_args()

    if not os.path.exists(PathConfig.vocab_file):
        raise SystemError(
            'Must run "python init.py --vocab True" before training.')

    if args.use_glove:
        if not os.path.exists(PathConfig.glove_vectors):
            raise SystemError(
                'Must run "python init.py --glove True" when using glove '
                'vectors.')
        assert args.embed_size == 300, (
            "Expected embedding size of 300 for glove vectors.")

    if args.use_bert:
        assert args.model == "attention", (
            "BERT is only used for attention model.")
        assert args.embed_size == 768, (
            "Expected embedding size of 768 for BERT.")

    if args.model == "baseline":
        print("Training baseline model...")
        from icd_tpu.training.baseline import train

        train(args)
        return

    if args.model == "attention":
        print("Training attention model...")
        from icd_tpu.training.attention import train

        train(args)
        return


if __name__ == "__main__":
    main()
