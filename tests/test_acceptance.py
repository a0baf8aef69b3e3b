"""tools/acceptance.py — the day-1 environmental-unlock dispatcher.

The real acceptance needs artifacts absent from this container (real
COCO, pinned checkpoints, the METEOR jar — NOTES.md "Environmental
unlocks"); these tests fake the artifact layout to exercise detection
and the full eval-and-diff dispatch end to end.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import acceptance  # noqa: E402


def test_detect_locked(tmp_path):
    """An empty root + the real (blob-stripped) reference: everything
    locked, exit 0 with acceptance='locked'."""
    rc = acceptance.main(["--root", str(tmp_path), "--detect_only"])
    assert rc == 0


def test_detect_fields(tmp_path, capsys):
    root = str(tmp_path)
    rc = acceptance.main(["--root", root, "--reference",
                          "/root/reference", "--detect_only"])
    assert rc == 0
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert verdict["acceptance"] == "locked"
    assert verdict["unlocked"]["coco_val"] is False
    assert verdict["unlocked"]["meteor_jar"] is False  # stripped blob
    assert verdict["unlocked"]["meteor_py_fallback"] is True
    # The published eval_data JSONs ARE in the reference snapshot.
    assert all(not v for v in verdict["checkpoints"].values())
    assert verdict["blocked"]["baseline_3"].startswith("missing:")
    assert "checkpoint" in verdict["blocked"]["baseline_3"]


@pytest.fixture(scope="module")
def accepted_root(tmp_path_factory):
    """A faked 'real-artifact' root: synthetic COCO + a 1-epoch trained
    baseline_3 checkpoint + a 'published' reference eval_data JSON that
    our own eval produced (so the dispatcher's diff must come out
    exactly zero)."""
    root = str(tmp_path_factory.mktemp("acceptance"))
    env = {k: v for k, v in os.environ.items() if k != "ICD_TPU_ROOT"}
    env.update(ICD_TPU_ROOT=root, JAX_PLATFORMS="cpu",
               ICD_TPU_METEOR_PY="1")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "make_synthetic_coco.py"),
         root, "--train", "24", "--val", "8"], check=True, env=env)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "init.py"), "--vocab", "True",
         "--vocab_threshold", "1"], check=True, env=env, cwd=root)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "baseline",
         "--model", "baseline", "--epochs", "4",
         "--batch_size", "8", "--workers", "0", "--print_freq", "1000"],
        check=True, env=env, cwd=root)
    ckpt = os.path.join(root, "checkpoints", "baseline_3.ckpt")
    assert os.path.exists(ckpt)

    # Produce the faked "published" JSON with one eval run, then move it
    # into a fake reference dir (acceptance must re-derive it freshly).
    subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"), "baseline_3.ckpt",
         "--model_type", "baseline", "--print_freq", "1000"],
        check=True, env=env, cwd=root)
    fake_ref = os.path.join(root, "fake_reference")
    os.makedirs(os.path.join(fake_ref, "eval_data"))
    os.rename(os.path.join(root, "eval_data", "baseline_3.json"),
              os.path.join(fake_ref, "eval_data", "baseline_3.json"))
    return root, fake_ref


def test_dispatch_runs_unlocked_family(accepted_root):
    root, fake_ref = accepted_root
    env = {k: v for k, v in os.environ.items() if k != "ICD_TPU_ROOT"}
    env.update(JAX_PLATFORMS="cpu", ICD_TPU_METEOR_PY="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--root", root, "--reference", fake_ref,
         "--families", "baseline_3"],
        env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["acceptance"] == "ok", verdict
    assert verdict["runnable"] == ["baseline_3"]
    (rep,) = verdict["results"]
    assert rep["ok"] and rep["family"] == "baseline_3", rep
    assert rep["max_metric_diff"] == 0.0, rep
    assert rep["meteor"] == "python"


def test_dispatch_blocks_family_without_checkpoint(accepted_root):
    root, fake_ref = accepted_root
    env = {k: v for k, v in os.environ.items() if k != "ICD_TPU_ROOT"}
    env.update(JAX_PLATFORMS="cpu", ICD_TPU_METEOR_PY="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--root", root, "--reference", fake_ref,
         "--families", "basic_att_3"],
        env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["acceptance"] == "locked"
    assert "checkpoint" in verdict["blocked"]["basic_att_3"]
    # No published JSON for this family in the fake reference either.
    assert "reference_eval_data" in verdict["blocked"]["basic_att_3"]
