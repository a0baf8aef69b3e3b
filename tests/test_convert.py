"""Reference-artifact converters: torch modules with reference naming ->
our pytrees, verified by forward-output parity."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax.numpy as jnp

from icd_tpu.convert import (
    convert_attention_decoder_state_dict, convert_baseline_decoder_state_dict,
    convert_encoder_state_dict)
from icd_tpu.models.attention import attention_decoder_forward
from icd_tpu.models.baseline import baseline_decoder_forward
from icd_tpu.models.resnet import resnet_forward

from test_attention import TorchAttentionDecoder
from test_resnet import DEPTHS, WIDTHS, TorchMiniResNet, _randomize_bn_stats


class RefNamedBaselineDecoder(nn.Module):
    """Module with the reference BaselineDecoder's parameter names
    (models/baseline.py:43-57)."""

    def __init__(self, v, e, h):
        super().__init__()
        self.embedding = nn.Embedding(v, e)
        self.lstm = nn.LSTM(e, h, batch_first=True)
        self.linear = nn.Linear(h, v)

    def forward(self, feats, captions):
        emb = self.embedding(captions[:, :-1])
        x = torch.cat([feats.unsqueeze(1), emb], dim=1)
        out, _ = self.lstm(x)
        return self.linear(out)


class RefNamedAttentionDecoder(TorchAttentionDecoder):
    """Reference AttentionDecoder naming: attention.{enc,dec,full}_att,
    decode_step, h_lin, c_lin, f_beta, fc, embedding
    (models/attention.py:102-123)."""

    def __init__(self, enc_dim, att_dim, dec_dim, emb_dim, vocab):
        nn.Module.__init__(self)
        self.attention = nn.Module()
        self.attention.enc_att = nn.Linear(enc_dim, att_dim)
        self.attention.dec_att = nn.Linear(dec_dim, att_dim)
        self.attention.full_att = nn.Linear(att_dim, 1)
        self.h_lin = nn.Linear(enc_dim, dec_dim)
        self.c_lin = nn.Linear(enc_dim, dec_dim)
        self.f_beta = nn.Linear(dec_dim, enc_dim)
        self.fc = nn.Linear(dec_dim, vocab)
        self.embedding = nn.Embedding(vocab, emb_dim)
        self.decode_step = nn.LSTMCell(emb_dim + enc_dim, dec_dim)
        # aliases used by the parent forward
        self.enc_att = self.attention.enc_att
        self.dec_att = self.attention.dec_att
        self.full_att = self.attention.full_att
        self.cell = self.decode_step


def test_baseline_decoder_conversion():
    torch.manual_seed(0)
    tmod = RefNamedBaselineDecoder(15, 6, 8).eval()
    tree = convert_baseline_decoder_state_dict(tmod.state_dict())
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 6)).astype(np.float32)
    caps = rng.integers(0, 15, size=(3, 7)).astype(np.int32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(feats),
                   torch.from_numpy(caps.astype(np.int64))).numpy()
    ours = baseline_decoder_forward(
        {k: jnp.asarray(v) if not isinstance(v, dict) else
         {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in
         tree.items()},
        jnp.asarray(feats), jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_attention_decoder_conversion():
    torch.manual_seed(1)
    tmod = RefNamedAttentionDecoder(12, 9, 10, 7, 17).eval()
    tree = convert_attention_decoder_state_dict(tmod.state_dict())
    rng = np.random.default_rng(1)
    enc = rng.normal(size=(2, 5, 12)).astype(np.float32)
    caps = rng.integers(0, 17, size=(2, 6)).astype(np.int32)
    lengths = [5, 5]
    with torch.no_grad():
        refp, refa = tmod(torch.from_numpy(enc),
                          torch.from_numpy(caps.astype(np.int64)), lengths)
    import jax

    jt = jax.tree_util.tree_map(jnp.asarray, tree)
    jp, ja = attention_decoder_forward(
        jt, jnp.asarray(enc), jnp.asarray(caps),
        jnp.asarray(lengths, jnp.int32))
    np.testing.assert_allclose(np.asarray(jp), refp.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ja), refa.numpy(), atol=1e-5)


def test_encoder_sequential_conversion():
    """Reference wraps the backbone in nn.Sequential -> resnet.N.* keys
    (models/encoder.py:38-39)."""
    torch.manual_seed(2)
    backbone = TorchMiniResNet(DEPTHS, WIDTHS).eval()
    with torch.no_grad():
        _randomize_bn_stats(backbone, seed=2)

    class RefEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            children = [backbone.conv1, backbone.bn1, nn.ReLU(),
                        backbone.maxpool, backbone.layer1, backbone.layer2,
                        backbone.layer3, backbone.layer4]
            self.resnet = nn.Sequential(*children)
            self.embed = nn.Linear(WIDTHS[-1] * 4, 10)

    enc = RefEncoder().eval()
    tree = convert_encoder_state_dict(enc.state_dict())
    assert "embed" in tree

    x = np.random.default_rng(3).normal(size=(1, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = enc.resnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    import jax

    jt = jax.tree_util.tree_map(jnp.asarray, tree["resnet"])
    ours, _ = resnet_forward(jt, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3)
