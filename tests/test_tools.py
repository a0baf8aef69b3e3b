"""Notebook-equivalent tools run end to end (subprocess smoke)."""

import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tool, *args, root):
    env = dict(os.environ, ICD_TPU_ROOT=root, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        cwd=root, env=env, capture_output=True, text=True)


def test_training_plots(use_coco_root, tmp_path):
    state = {"epoch": 0,
             "metrics": {"epoch_losses": [[3.0, 2.5], [2.0, 1.5]]},
             "encoder": {}, "decoder": {},
             "encoder_optimizer": None, "decoder_optimizer": None}
    path = os.path.join(use_coco_root, "checkpoints", "plotme_1.ckpt")
    with open(path, "wb") as f:
        pickle.dump(state, f)
    out = _run("training_plots.py", path, root=use_coco_root)
    assert out.returncode == 0, out.stderr
    assert "Saved train_loss.jpg" in out.stdout
    assert os.path.exists(os.path.join(use_coco_root, "train_loss.jpg"))


def test_validation_plots(use_coco_root):
    data = {"Bleu_1": 0.5, "Bleu_2": 0.4, "Bleu_3": 0.3, "Bleu_4": 0.2,
            "METEOR": 0.0, "ROUGE_L": 0.45, "CIDEr": 1.2,
            "losses": [2.0, 2.2]}
    os.makedirs(os.path.join(use_coco_root, "eval_data"), exist_ok=True)
    with open(os.path.join(use_coco_root, "eval_data",
                           "toolsmoke_3.json"), "w") as f:
        json.dump(data, f)
    out = _run("validation_plots.py", root=use_coco_root)
    assert out.returncode == 0, out.stderr
    assert "toolsmoke_3" in out.stdout
    assert "0.5" in out.stdout
    assert "begin{tabular}" in out.stdout  # latex table too


def test_make_synthetic_coco(tmp_path):
    out = _run("make_synthetic_coco.py", str(tmp_path / "root"),
               "--train", "6", "--val", "3", root=str(tmp_path))
    assert out.returncode == 0, out.stderr
    with open(tmp_path / "root" / "cocoapi" / "annotations"
              / "captions_train2014.json") as f:
        d = json.load(f)
    assert len(d["images"]) == 6
    assert all("image" in a["caption"] for a in d["annotations"])
