"""Notebook-equivalent tools run end to end (subprocess smoke)."""

import json
import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tool, *args, root):
    env = dict(os.environ, ICD_TPU_ROOT=root, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        cwd=root, env=env, capture_output=True, text=True)


@pytest.fixture(scope="module")
def demo_checkpoint(coco_root):
    """One tiny attention checkpoint trained through the real train.py
    CLI, shared by the captioner-tool smokes below."""
    name = "toolsdemo"
    ckpt = os.path.join(coco_root, "checkpoints", name + "_0.ckpt")
    if not os.path.exists(ckpt):
        env = dict(os.environ, ICD_TPU_ROOT=coco_root,
                   JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"), name,
             "--model", "attention", "--attention_dim", "32",
             "--decoder_dim", "32", "--embed_size", "32",
             "--epochs", "1", "--batch_size", "2", "--workers", "0",
             "--print_freq", "1000"],
            cwd=coco_root, env=env, capture_output=True, text=True)
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert os.path.exists(ckpt)
    return name + "_0.ckpt"


def test_captions_demo(coco_root, demo_checkpoint):
    """captions.ipynb equivalent: teacher-forced side-by-side captions
    (reference: captions.ipynb cells 3-5)."""
    out = _run("captions_demo.py", demo_checkpoint + ":attention",
               "--num_images", "1", root=coco_root)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "truth:" in out.stdout and demo_checkpoint in out.stdout


def test_greedy_eval(coco_root, demo_checkpoint, tmp_path):
    """Serving-path greedy captioner over the val split writes the
    {image_id, caption} JSON."""
    out_json = str(tmp_path / "greedy.json")
    out = _run("greedy_eval.py", demo_checkpoint, "--model_type",
               "attention", "--batch_size", "2", "--max_len", "6",
               "--out", out_json, root=coco_root)
    assert out.returncode == 0, out.stderr[-3000:]
    with open(out_json) as f:
        rows = json.load(f)
    assert rows and {"image_id", "caption"} <= set(rows[0])


def test_beam_eval(coco_root, demo_checkpoint, tmp_path):
    """Batched beam-search captioner over the val split (f32 on CPU,
    --no-int8 = the reference-numerics opt-out; the int8-encoder default
    path is covered by tests/test_int8_parity.py)."""
    out_json = str(tmp_path / "beam.json")
    out = _run("beam_eval.py", demo_checkpoint, "--beam_size", "2",
               "--batch_size", "2", "--dtype", "f32", "--no-int8",
               "--out", out_json, root=coco_root)
    assert out.returncode == 0, out.stderr[-3000:]
    with open(out_json) as f:
        rows = json.load(f)
    assert rows and {"image_id", "caption"} <= set(rows[0])


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


def test_validation_table_matches_published_notebook():
    """Golden test against the reference's PUBLISHED results: the
    tables embedded in validation_plots.ipynb's stored cell outputs
    (reference: validation_plots.ipynb cells 4-5) were produced from
    the eval_data/*.json files shipped in the reference snapshot. Our
    get_metrices must reproduce every published number from those same
    JSONs (the notebook's get_metrices drops METEOR/CIDEr from its
    table; ours reports them — compare on the published columns)."""
    import pytest

    eval_dir = "/root/reference/eval_data"
    if not os.path.isdir(eval_dir):
        pytest.skip("reference snapshot not available")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from validation_plots import get_metrices

    # [Bleu_1, Bleu_2, Bleu_3, Bleu_4, ROUGE_L, mean loss] per model,
    # verbatim from the notebook's stored latex-table outputs.
    published = {
        "baseline_3": [0.4930, 0.3101, 0.1985, 0.1306, 0.4779, 2.1997],
        "glove_baseline_3": [0.4901, 0.3074, 0.1959, 0.1282, 0.4772,
                             2.2058],
        "basic_att_3": [0.4750, 0.2964, 0.1872, 0.1208, 0.4631, 3.4244],
        "glove_att_3": [0.4982, 0.3175, 0.2046, 0.1347, 0.4850, 3.2496],
        "bert_attention_3": [0.6945, 0.5645, 0.4651, 0.3872, 0.6881,
                             2.3319],
    }
    for stem, want in published.items():
        row = get_metrices(os.path.join(eval_dir, stem + ".json"))
        # row = [B1, B2, B3, B4, METEOR, ROUGE_L, CIDEr, mean loss]
        got = [row[0], row[1], row[2], row[3], row[5], row[7]]
        for g, w in zip(got, want):
            assert abs(g - w) <= 5.1e-5, (stem, got, want)


def test_make_synthetic_coco(tmp_path):
    out = _run("make_synthetic_coco.py", str(tmp_path / "root"),
               "--train", "6", "--val", "3", root=str(tmp_path))
    assert out.returncode == 0, out.stderr
    with open(tmp_path / "root" / "cocoapi" / "annotations"
              / "captions_train2014.json") as f:
        d = json.load(f)
    assert len(d["images"]) == 6
    assert all("image" in a["caption"] for a in d["annotations"])
