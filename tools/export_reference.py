"""Export an icd_tpu checkpoint to the reference's .pth.tar format.

The reverse of the transparent .pth.tar import: writes a whole-module
PyTorch checkpoint the UNMODIFIED reference code can consume (eval.py,
gen_captions.py, notebooks, --checkpoint resume). See icd_tpu/export.py
for layout inverses and caveats (fresh optimizers; BERT checkpoints
need the compat shim on the loading side too).

Usage: ICD_TPU_ROOT=... python tools/export_reference.py <name>_<epoch>.ckpt \
           out.pth.tar [--reference_root /root/reference]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="icd_tpu checkpoint filename "
                                           "(under checkpoints/)")
    parser.add_argument("out_path", help="destination .pth.tar")
    parser.add_argument("--reference_root", default="/root/reference")
    parser.add_argument("--decoder_lr", type=float, default=4e-4)
    args = parser.parse_args()

    from icd_tpu.checkpoint import load_checkpoint
    from icd_tpu.export import export_reference_checkpoint

    chkpt = load_checkpoint(name=args.checkpoint, verbose=True)
    out = export_reference_checkpoint(
        chkpt, args.out_path, reference_root=args.reference_root,
        decoder_lr=args.decoder_lr)
    print("Exported reference checkpoint to {}".format(out))


if __name__ == "__main__":
    main()
