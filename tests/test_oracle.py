"""Reference-as-oracle parity: run the ACTUAL reference torch code
(train + eval) on the synthetic fixture, then reproduce its eval_data
JSON with icd_tpu on the converted checkpoint.

This is the end-to-end weld over the per-component differentials: the
reference's own driver code (reference: train.py:11-79, eval.py:21-45,
checkpoint.py:39-62) produces a genuine whole-module ``.pth.tar`` and a
metric JSON; icd_tpu auto-converts the checkpoint and must reproduce
the metric dict (BLEU/METEOR*/ROUGE/CIDEr near-exactly, per-sample
losses to f32 tolerance). *METEOR on both sides is the pure-Python
METEOR 1.5 stdio server (tools/meteor_stdio.py — faithful on the
id-string eval protocol, see icd_tpu/eval_func/meteor_py.py) since the
jar is absent from the environment and from the reference snapshot
itself.

Orchestrated via subprocesses (tools/ref_oracle.py) so the reference's
shims and our CPU-forced JAX runtime can't pollute the test process.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "tools", "ref_oracle.py")


def _clean_env():
    env = dict(os.environ)
    # The conftest's ICD_TPU_ROOT (tiny COCO fixture) must not leak into
    # the oracle subprocesses, which root themselves explicitly.
    env.pop("ICD_TPU_ROOT", None)
    return env


@pytest.fixture(scope="session")
def oracle_root(tmp_path_factory):
    """Persistent oracle root: reference-side artifacts (fixture data,
    vocab, reference-trained checkpoints, reference eval JSONs) are
    deterministic given the inputs hashed by ref_oracle.cache_key, so
    they are cached across pytest sessions under ~/.cache/icd_tpu_oracle
    and the oracle stages skip reference work whose outputs exist —
    icd_tpu's convert/eval/export (the code under test) still runs
    fresh every session. ICD_TPU_ORACLE_CACHE=0 restores the
    build-from-scratch behavior (or point it at another directory)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import ref_oracle

    root = ref_oracle.cached_root(n_train=48, n_val=24, seed=0)
    if root is not None:
        return root
    root = str(tmp_path_factory.mktemp("oracle"))
    subprocess.run(
        [sys.executable, ORACLE, "prepare", root,
         "--train", "48", "--val", "24"],
        check=True, env=_clean_env(), cwd=REPO)
    return root


def _run_family(oracle_root, family):
    proc = subprocess.run(
        [sys.executable, ORACLE, "full", oracle_root,
         "--families", family, "--epochs", "1", "--batch_size", "8"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, (
        "oracle loop failed:\n--- stdout:\n{}\n--- stderr:\n{}".format(
            proc.stdout[-4000:], proc.stderr[-4000:]))
    # The compare step prints one JSON report line per family.
    reports = [json.loads(line) for line in proc.stdout.splitlines()
               if line.startswith("{") and '"max_metric_diff"' in line]
    assert len(reports) == 1, proc.stdout[-2000:]
    rep = reports[0]
    assert rep["ok"] and rep["n_losses"] == 24, rep
    return rep


def test_oracle_baseline(oracle_root):
    _run_family(oracle_root, "baseline")


def test_oracle_attention(oracle_root):
    _run_family(oracle_root, "attention")


def test_oracle_glove_attention(oracle_root):
    """GloVe path with the reference's broken fill reproduced
    (ICD_TPU_GLOVE_REFBUG=1 at prepare time — both sides consume the
    identical pickle, icd_tpu/data/embed.py:9-17)."""
    _run_family(oracle_root, "glove_attention")


def test_oracle_glove_baseline(oracle_root):
    """Same GloVe pickle through the baseline decoder's
    load_pretrained_embeddins path (reference: models/baseline.py:59-79),
    completing the reference's published model matrix minus BERT."""
    _run_family(oracle_root, "glove_baseline")


def _run_beam(oracle_root, family):
    proc = subprocess.run(
        [sys.executable, ORACLE, "beam", oracle_root, "--family", family,
         "--k", "5", "--n_images", "4", "--epochs", "3",
         "--batch_size", "8"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, (
        "beam oracle failed:\n--- stdout:\n{}\n--- stderr:\n{}".format(
            proc.stdout[-4000:], proc.stderr[-4000:]))
    reports = [json.loads(line) for line in proc.stdout.splitlines()
               if line.startswith("{") and '"beam_exact"' in line]
    assert len(reports) == 1, proc.stdout[-2000:]
    rep = reports[0]
    assert rep["ok"] and rep["beam_exact"] and rep["n_images"] == 4, rep
    return rep


def test_oracle_beam_attention(oracle_root):
    """Decoding parity against the reference's ACTUAL beam search
    (reference: gen_captions.py:16-131, the captions.ipynb generation
    path): the reference's attention_caption_image_beam_search and
    icd_tpu's lax.while_loop beam (icd_tpu/decoding/beam.py) must emit
    token-identical sequences on the same converted checkpoint and val
    images (incl. the un-normalized /255 loader quirk,
    gen_captions.py:133-143). Uses a dedicated seeded 3-epoch
    checkpoint (the reference CLIs never seed; the bootstrap seeds
    torch so this model reproducibly completes captions)."""
    rep = _run_beam(oracle_root, "attention")
    # The fixture model completes captions — this exercises the full
    # dynamic-k retirement path, not just the step-budget fallback.
    assert rep["n_found"] >= 1, rep


def _run_export(oracle_root, family):
    proc = subprocess.run(
        [sys.executable, ORACLE, "export", oracle_root,
         "--families", family, "--epochs", "1", "--batch_size", "8"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, (
        "export oracle failed:\n--- stdout:\n{}\n--- stderr:\n{}".format(
            proc.stdout[-4000:], proc.stderr[-4000:]))
    reports = [json.loads(line) for line in proc.stdout.splitlines()
               if line.startswith("{") and '"max_metric_diff"' in line]
    assert len(reports) == 1, proc.stdout[-2000:]
    rep = reports[0]
    assert rep["ok"] and rep["n_losses"] == 24, rep
    return rep


def test_oracle_export_baseline(oracle_root):
    """The REVERSE weld: icd_tpu trains, icd_tpu/export.py writes a
    reference-format whole-module .pth.tar, and the UNMODIFIED reference
    eval.py (reference: eval.py:21-45 + checkpoint.py:7-35) evaluates it
    — metric dicts bit-identical to our own eval of the same
    checkpoint. Proves icd_tpu-trained models are consumable by the
    reference ecosystem."""
    _run_export(oracle_root, "baseline")


def test_oracle_export_attention(oracle_root):
    """Reverse weld for the attention decoder (reference AttentionDecoder
    constructed with a reference-Vocabulary instance, attention.py:84,
    and state loaded through the layout inverses in icd_tpu/export.py)."""
    _run_export(oracle_root, "attention")


def test_oracle_bert_attention(oracle_root):
    """The reference's --use_bert path run LIVE (not just unpickled):
    its _create_bert_embeddings loop (reference: models/attention.py:
    166-215) executes through the functional pytorch_pretrained_bert
    compat shim against the same local 12-layer BERT_MODEL_DIR weights
    icd_tpu's BertCaptionEmbedder reads, and the whole-module pickle —
    including the live BertModel/BertTokenizer objects — round-trips
    through conversion with eval-metric parity."""
    _run_family(oracle_root, "bert_attention")
