"""Training-loss plots from checkpoints.

Script equivalent of the reference's training_plots.ipynb (cells 2-8):
reads the ``epoch_losses`` metric history out of each model's latest
checkpoint, plots the running-average loss per model and a combined
figure saved to ``train_loss.jpg``.

Usage: python tools/training_plots.py [ckpt ...]
       (defaults to every *.ckpt in the checkpoints dir)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from icd_tpu.checkpoint import load_checkpoint  # noqa: E402
from icd_tpu.pathconf import PathConfig  # noqa: E402


def avg_losses(epoch_losses):
    """Flatten epochs and compute the running average (reference:
    training_plots.ipynb avg_losses)."""
    flat = [loss for epoch in epoch_losses for loss in epoch]
    avgs, total = [], 0.0
    for i, loss in enumerate(flat):
        total += loss
        avgs.append(total / (i + 1))
    return avgs


def create_losses_plot(histories, out_path="train_loss.jpg"):
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, losses in histories.items():
        ax.plot(avg_losses(losses), label=name)
    ax.set_xlabel("batch")
    ax.set_ylabel("running avg loss")
    ax.legend()
    ax.set_title("Training loss")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    print("Saved {}".format(out_path))


def main():
    paths = sys.argv[1:]
    if not paths:
        paths = sorted(glob.glob(
            os.path.join(PathConfig.checkpoints_dir, "*.ckpt")))
    histories = {}
    for path in paths:
        name = os.path.basename(path)
        chkpt = load_checkpoint(name=name, verbose=False)
        losses = chkpt.get("metrics", {}).get("epoch_losses")
        if losses:
            # keep the latest checkpoint per model prefix
            model = name.rsplit("_", 1)[0]
            histories[model] = losses
    if not histories:
        print("No checkpoints with epoch_losses found.")
        return
    create_losses_plot(histories)


if __name__ == "__main__":
    main()
