"""Transparent loading of reference-style torch .pth.tar checkpoints."""

import os

import numpy as np
import torch
import torch.nn as nn

from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint

from test_convert import RefNamedAttentionDecoder, RefNamedBaselineDecoder
from test_resnet import DEPTHS, WIDTHS, TorchMiniResNet


class RefEncoder(nn.Module):
    """Module-level (picklable) replica of the reference Encoder layout."""

    def __init__(self, backbone, embed_out=16):
        super().__init__()
        self.resnet = nn.Sequential(
            backbone.conv1, backbone.bn1, nn.ReLU(),
            backbone.maxpool, backbone.layer1, backbone.layer2,
            backbone.layer3, backbone.layer4)
        self.embed = nn.Linear(WIDTHS[-1] * 4, embed_out)


def test_load_reference_pth_tar(use_coco_root):
    torch.manual_seed(0)
    backbone = TorchMiniResNet(DEPTHS, WIDTHS).eval()
    encoder = RefEncoder(backbone)
    decoder = RefNamedBaselineDecoder(15, 16, 12)
    state = {
        "epoch": 3,
        "metrics": {"epoch_losses": [[1.0, 0.9]]},
        "encoder": encoder,
        "decoder": decoder,
        "encoder_optimizer": None,
        "decoder_optimizer": torch.optim.Adam(decoder.parameters()),
    }
    path = os.path.join(use_coco_root, "checkpoints",
                        "refmodel_3.pth.tar")
    torch.save(state, path)

    chkpt = load_checkpoint(name="refmodel_3.pth.tar")
    epoch, enc, dec, _, _, metrics = unpack_checkpoint(chkpt)
    assert epoch == 3
    assert metrics["epoch_losses"] == [[1.0, 0.9]]
    # Converted trees carry the torch weights.
    np.testing.assert_allclose(
        dec["embedding"],
        decoder.embedding.weight.detach().numpy(), atol=1e-7)
    assert enc["resnet"]["stem"]["conv"].shape == (7, 7, 3, WIDTHS[0])
    assert enc["embed"]["w"].shape == (WIDTHS[-1] * 4, 16)
    assert chkpt["config"]["model"] == "baseline"  # auto-detected


def test_eval_cli_on_reference_checkpoint(use_coco_root):
    """A user's reference-trained .pth.tar runs through our eval.py CLI
    and produces the metrics JSON — the full switching path."""
    import json
    import subprocess
    import sys

    from icd_tpu.vocabulary import load_vocab

    torch.manual_seed(2)
    vocab = load_vocab()
    backbone = TorchMiniResNet(DEPTHS, WIDTHS).eval()
    encoder = RefEncoder(backbone, embed_out=16)
    decoder = RefNamedBaselineDecoder(len(vocab), 16, 12)
    state = {"epoch": 0, "metrics": {}, "encoder": encoder,
             "decoder": decoder, "encoder_optimizer": None,
             "decoder_optimizer": None}
    path = os.path.join(use_coco_root, "checkpoints",
                        "refcli_0.pth.tar")
    torch.save(state, path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, ICD_TPU_ROOT=use_coco_root,
               JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + ":" + os.path.dirname(
                   os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "eval.py"),
         "refcli_0.pth.tar", "--model_type", "baseline",
         "--print_freq", "10"],
        cwd=use_coco_root, env=env, capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    result = os.path.join(use_coco_root, "eval_data", "refcli_0.json")
    with open(result) as f:
        metrics = json.load(f)
    assert "Bleu_4" in metrics and len(metrics["losses"]) == 4


def test_load_reference_attention_pth_tar(use_coco_root):
    torch.manual_seed(1)
    backbone = TorchMiniResNet(DEPTHS, WIDTHS).eval()
    encoder = RefEncoder(backbone)
    decoder = RefNamedAttentionDecoder(WIDTHS[-1] * 4, 10, 12, 8, 19)
    state = {"epoch": 1, "metrics": {}, "encoder": encoder,
             "decoder": decoder, "encoder_optimizer": None,
             "decoder_optimizer": None}
    path = os.path.join(use_coco_root, "checkpoints", "refatt_1.pth.tar")
    torch.save(state, path)

    chkpt = load_checkpoint(name="refatt_1.pth.tar")
    assert chkpt["config"]["model"] == "attention"  # auto-detected
    dec = chkpt["decoder"]
    assert set(dec) >= {"attention", "lstm", "h_lin", "c_lin", "f_beta",
                        "fc", "embedding"}
    np.testing.assert_allclose(
        dec["fc"]["w"], decoder.fc.weight.detach().numpy().T, atol=1e-7)


def test_async_checkpoint_save_roundtrip(use_coco_root, monkeypatch):
    """ICD_TPU_CKPT_ASYNC=1 defers fetch+pickle to a background writer;
    wait_pending_saves() flushes (and re-raises writer failures), after
    which the checkpoint loads identically to a synchronous save."""
    import jax.numpy as jnp

    from icd_tpu.checkpoint import save_checkpoint, wait_pending_saves

    class _Args:
        model_name = "asyncsave"
        model = "baseline"
        embed_size = 4
        use_bert = False

    enc = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    dec = {"b": jnp.ones((3,), jnp.float32)}
    monkeypatch.setenv("ICD_TPU_CKPT_ASYNC", "1")
    path = save_checkpoint(_Args(), 0, enc, dec, None, None,
                           {"epoch_losses": [[1.0]]}, verbose=False)
    wait_pending_saves()
    assert os.path.exists(path)
    chkpt = load_checkpoint(name="asyncsave_0.ckpt", verbose=False)
    epoch, enc2, dec2, _, _, metrics = unpack_checkpoint(chkpt)
    assert epoch == 0 and metrics == {"epoch_losses": [[1.0]]}
    np.testing.assert_array_equal(enc2["w"], np.asarray(enc["w"]))
    np.testing.assert_array_equal(dec2["b"], np.asarray(dec["b"]))
    assert isinstance(enc2["w"], np.ndarray)

    # Writer failures surface at the flush, not silently.
    import icd_tpu.checkpoint as ck

    monkeypatch.setattr(ck.PathConfig, "checkpoints_dir",
                        os.path.join(use_coco_root, "nope", "deep",
                                     "missing"))
    monkeypatch.setattr(ck.os, "makedirs", lambda *a, **k: None)
    save_checkpoint(_Args(), 1, enc, dec, None, None, {}, verbose=False)
    import pytest

    with pytest.raises(OSError):
        wait_pending_saves()


def test_checkpoint_write_is_atomic(use_coco_root, monkeypatch):
    """Saves publish via temp + os.replace so a crash mid-pickle never
    leaves a truncated file under the checkpoint's real name."""
    import pickle as _pickle

    import icd_tpu.checkpoint as ck

    class _Args:
        model_name = "atomic"
        model = "baseline"

    calls = {}
    real_dump = _pickle.dump

    def exploding_dump(obj, f, *a, **k):
        calls["path"] = f.name
        real_dump(obj, f, *a, **k)
        raise RuntimeError("die mid-write")

    monkeypatch.setattr(ck.pickle, "dump", exploding_dump)
    import pytest

    with pytest.raises(RuntimeError):
        ck.save_checkpoint(_Args(), 0, {}, {}, None, None, {},
                           verbose=False)
    final = os.path.join(use_coco_root, "checkpoints", "atomic_0.ckpt")
    assert calls["path"].endswith(".tmp")
    assert not os.path.exists(final)

    monkeypatch.setattr(ck.pickle, "dump", real_dump)
    ck.save_checkpoint(_Args(), 0, {}, {}, None, None, {}, verbose=False)
    assert os.path.exists(final)
    assert not os.path.exists(final + ".tmp")
