"""Eval CLI — flag-compatible with the reference eval.py (eval.py:21-45).

Loads a checkpoint, runs teacher-forced evaluation, dumps the metric
dict (incl. per-sample losses) to eval_data/<name>.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
from icd_tpu.pathconf import PathConfig


def save_eval_data(name, d):
    os.makedirs(PathConfig.eval_data, exist_ok=True)
    path = os.path.join(PathConfig.eval_data, "{}.json".format(name))
    with open(path, "w") as f:
        json.dump(d, f)


def main():
    parser = argparse.ArgumentParser(description="Evaluation")
    parser.add_argument("checkpoint", type=str,
                        help="checkpoint of trained model.")
    parser.add_argument("--model_type", type=str,
                        choices=["baseline", "attention"],
                        help="type of model to evaluate")
    parser.add_argument("--max_caption_length", type=int, default=-1,
                        help="only use captions with caption length <= 50 "
                             "when training.")
    parser.add_argument("--print_freq", type=int, default=1,
                        help="print training/validation stats every __ "
                             "batches.")
    args = parser.parse_args()

    # Probe METEOR before the (expensive) eval loop: a missing jar/Java
    # should fail NOW, not after the full teacher-forced decode.
    from icd_tpu.metric import probe_meteor

    probe_meteor()

    chkpt = load_checkpoint(args)
    _, encoder, decoder, _, _, _ = unpack_checkpoint(chkpt)

    if args.model_type == "attention":
        from icd_tpu.training.attention import evaluate

        # The reference's pickled decoder module carries use_bert into
        # eval (its forward checks self.use_bert, attention.py:242-247);
        # our checkpoints record it in config instead.
        use_bert = (chkpt.get("config") or {}).get("use_bert", False)
        metrics = evaluate(args, encoder, decoder, use_bert=use_bert)
        print(metrics)
        save_eval_data(args.checkpoint.split(".")[0], metrics)
    elif args.model_type == "baseline":
        from icd_tpu.training.baseline import evaluate

        metrics = evaluate(args, encoder, decoder)
        print(metrics)
        save_eval_data(args.checkpoint.split(".")[0], metrics)


if __name__ == "__main__":
    main()
