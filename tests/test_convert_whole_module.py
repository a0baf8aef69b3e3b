"""Whole-module reference checkpoint round-trip differential.

The reference pickles *entire* nn.Module / optimizer objects into its
``.pth.tar`` checkpoints (reference: checkpoint.py:51-60). This test
constructs checkpoints in that exact format using the reference's own
classes imported from /root/reference (with icd_tpu.compat shims
standing in for torchvision / pytorch_pretrained_bert / bcolz), then
round-trips them through ``load_checkpoint`` →
``convert_reference_checkpoint`` and asserts forward parity of the
converted pytrees — the parity-critical path that loads the reference's
real artifacts.
"""

import importlib
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
from icd_tpu.compat import (
    install_reference_shims, uninstall_reference_shims)
from icd_tpu.models.attention import attention_decoder_forward
from icd_tpu.models.baseline import baseline_decoder_forward
from icd_tpu.models.encoder import encoder_forward

from test_resnet import _randomize_bn_stats

ref_encoder_mod = None
ref_baseline_mod = None
ref_attention_mod = None
ref_vocabulary_mod = None


@pytest.fixture(scope="module", autouse=True)
def reference_modules():
    """Install the unpickling shims for THIS module only and de-pollute
    afterwards: a collection-time install leaked /root/reference onto
    sys.path (shadowing the repo's root-level ``train``) and a spec-less
    torchvision stub into sys.modules (transformers' availability probe
    raises on it), breaking unrelated tests later in the session."""
    global ref_encoder_mod, ref_baseline_mod
    global ref_attention_mod, ref_vocabulary_mod
    state = install_reference_shims()
    ref_encoder_mod = importlib.import_module("models.encoder")
    ref_baseline_mod = importlib.import_module("models.baseline")
    ref_attention_mod = importlib.import_module("models.attention")
    ref_vocabulary_mod = importlib.import_module("vocabulary")
    assert ref_encoder_mod.__file__.startswith("/root/reference"), (
        ref_encoder_mod.__file__)
    yield
    uninstall_reference_shims(state)
    ref_encoder_mod = ref_baseline_mod = None
    ref_attention_mod = ref_vocabulary_mod = None


def _small_torch_resnet(seed=0):
    """A [1,1,1,1]-depth Bottleneck ResNet with torchvision's exact
    module layout (children order, 2048-dim features, .fc head)."""
    resnet_mod = sys.modules["torchvision.models.resnet"]
    torch.manual_seed(seed)
    model = resnet_mod.ResNet(resnet_mod.Bottleneck, [1, 1, 1, 1])
    with torch.no_grad():
        _randomize_bn_stats(model, seed=seed)
    return model


def _ref_vocab(n_words=19):
    vocab = ref_vocabulary_mod.Vocabulary()
    vocab.add_word(ref_vocabulary_mod.PAD_TOKEN)
    for i in range(n_words):
        vocab.add_word("w{}".format(i))
    vocab.add_word(ref_vocabulary_mod.START_TOKEN)
    vocab.add_word(ref_vocabulary_mod.END_TOKEN)
    vocab.add_word(ref_vocabulary_mod.UNK_TOKEN)
    return vocab


def _save_reference_format(tmp_root, name, epoch, encoder, decoder):
    """torch.save the reference's exact checkpoint dict
    (checkpoint.py:51-60): whole modules + whole optimizers + metrics."""
    decoder_optimizer = torch.optim.Adam(
        filter(lambda p: p.requires_grad, decoder.parameters()), lr=4e-4)
    # One real step so the pickled optimizer carries exp_avg state.
    decoder.train()
    loss = sum(p.float().sum() for p in decoder.parameters()
               if p.requires_grad)
    loss.backward()
    decoder_optimizer.step()
    decoder_optimizer.zero_grad()
    decoder.eval()

    os.makedirs(os.path.join(tmp_root, "checkpoints"), exist_ok=True)
    path = os.path.join(tmp_root, "checkpoints",
                        "{}_{}.pth.tar".format(name, epoch))
    torch.save({
        "epoch": epoch,
        "metrics": {"epoch_losses": [[3.1, 2.9], [2.5, 2.4]]},
        "encoder": encoder,
        "decoder": decoder,
        "encoder_optimizer": None,
        "decoder_optimizer": decoder_optimizer,
    }, path)
    return "{}_{}.pth.tar".format(name, epoch)


@pytest.fixture()
def tmp_root(tmp_path, monkeypatch):
    monkeypatch.setenv("ICD_TPU_ROOT", str(tmp_path))
    return str(tmp_path)


def _to_jax(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def test_whole_module_baseline_roundtrip(tmp_root, monkeypatch):
    monkeypatch.setattr(ref_encoder_mod, "_load_resnet101_model",
                        _small_torch_resnet)
    torch.manual_seed(3)
    encoder = ref_encoder_mod.Encoder(embed_size=12).eval()

    params = ref_baseline_mod.BaselineDecoderParams()
    params.vocab_size = 23
    params.embed_size = 12
    params.hidden_size = 14
    decoder = ref_baseline_mod.BaselineDecoder(params).eval()

    name = _save_reference_format(tmp_root, "wholemod_base", 1,
                                  encoder, decoder)

    chkpt = load_checkpoint(name=name, verbose=False)
    epoch, enc_tree, dec_tree, enc_opt, dec_opt, metrics = (
        unpack_checkpoint(chkpt))
    assert epoch == 1
    assert metrics["epoch_losses"] == [[3.1, 2.9], [2.5, 2.4]]
    assert chkpt["config"]["model"] == "baseline"

    # Encoder parity: pre-normalized float input drives the identical
    # backbone+pool+Linear path on both sides (uint8 normalization is
    # fused on-device on ours and host-side in the reference pipeline).
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_feats = encoder(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    ours_feats, _ = encoder_forward(_to_jax(enc_tree), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_feats), ref_feats,
                               atol=2e-4, rtol=1e-3)

    # Decoder parity on the converted pytree.
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(3, 12)).astype(np.float32)
    caps = rng.integers(0, 23, size=(3, 7)).astype(np.int32)
    with torch.no_grad():
        ref_scores = decoder(torch.from_numpy(feats),
                             torch.from_numpy(caps.astype(np.int64))).numpy()
    ours_scores = baseline_decoder_forward(
        _to_jax(dec_tree), jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(ours_scores), ref_scores,
                               atol=1e-5)


def test_whole_module_attention_roundtrip(tmp_root, monkeypatch):
    monkeypatch.setattr(ref_encoder_mod, "_load_resnet101_model",
                        _small_torch_resnet)
    torch.manual_seed(5)
    encoder = ref_attention_mod.EncoderAttention().eval()

    params = ref_attention_mod.AttentionDecoderParams()
    params.attention_dim = 9
    params.decoder_dim = 10
    params.embed_size = 7
    params.dropout = 0.5
    params.use_bert = False
    params.vocab = _ref_vocab()
    decoder = ref_attention_mod.AttentionDecoder(
        torch.device("cpu"), params).eval()

    name = _save_reference_format(tmp_root, "wholemod_att", 2,
                                  encoder, decoder)

    chkpt = load_checkpoint(name=name, verbose=False)
    assert chkpt["epoch"] == 2
    assert chkpt["config"]["model"] == "attention"
    assert chkpt["config"]["use_bert"] is False
    enc_tree, dec_tree = chkpt["encoder"], chkpt["decoder"]

    # EncoderAttention parity: 14x14x2048 grid (reference permutes
    # NCHW->NHWC at models/encoder.py:107-109; ours is NHWC already).
    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_grid = encoder(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()
    from icd_tpu.models.encoder import encoder_attention_forward

    ours_grid, _ = encoder_attention_forward(_to_jax(enc_tree),
                                             jnp.asarray(x))
    assert ours_grid.shape == ref_grid.shape == (2, 14, 14, 2048)
    np.testing.assert_allclose(np.asarray(ours_grid), ref_grid,
                               atol=2e-4, rtol=1e-3)

    # Genuine reference AttentionDecoder.forward vs our converted scan.
    vocab_size = len(params.vocab)
    rng = np.random.default_rng(3)
    grid = rng.normal(size=(2, 3, 3, 2048)).astype(np.float32) * 0.1
    caps = rng.integers(0, vocab_size, size=(2, 6)).astype(np.int32)
    lengths = [6, 6]  # uniform post-padding lengths, the reference quirk
    with torch.no_grad():
        ref_preds, _, decode_lengths, ref_alphas = decoder(
            torch.from_numpy(grid),
            torch.from_numpy(caps.astype(np.int64)), lengths)
    assert decode_lengths == [5, 5]
    ours_preds, ours_alphas = attention_decoder_forward(
        _to_jax(dec_tree), jnp.asarray(grid.reshape(2, 9, 2048)),
        jnp.asarray(caps), jnp.asarray(lengths, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours_preds), ref_preds.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_alphas), ref_alphas.numpy(),
                               atol=1e-5)


def test_whole_module_bert_decoder_extra_keys(tmp_root, monkeypatch):
    """A bert_attention checkpoint's decoder carries bert_model.* keys in
    its state dict; the converter must ignore them and still detect the
    attention model type."""
    monkeypatch.setattr(ref_encoder_mod, "_load_resnet101_model",
                        _small_torch_resnet)
    torch.manual_seed(7)
    encoder = ref_attention_mod.EncoderAttention().eval()
    params = ref_attention_mod.AttentionDecoderParams()
    params.attention_dim = 5
    params.decoder_dim = 6
    params.embed_size = 4
    params.use_bert = False
    params.vocab = _ref_vocab(n_words=9)
    decoder = ref_attention_mod.AttentionDecoder(
        torch.device("cpu"), params).eval()
    # Simulate the use_bert module graph: an extra frozen submodule and
    # the flag the reference's eval-time forward branches on
    # (attention.py:96,242). Set post-construction: __init__ with
    # use_bert=True would download the real bert-base-uncased.
    decoder.bert_model = nn.Linear(3, 3)
    decoder.use_bert = True
    assert any(k.startswith("bert_model.")
               for k in decoder.state_dict())

    name = _save_reference_format(tmp_root, "wholemod_bert", 3,
                                  encoder, decoder)
    chkpt = load_checkpoint(name=name, verbose=False)
    assert chkpt["config"]["model"] == "attention"
    # eval.py restores BERT teacher forcing from this recorded flag.
    assert chkpt["config"]["use_bert"] is True
    assert "bert_model" not in chkpt["decoder"]
    assert chkpt["decoder"]["embedding"].shape == (len(params.vocab), 4)
