"""Attention decoder parity vs a torch replica of the reference forward."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from icd_tpu.models.attention import (
    AttentionDecoderParams, attention_decoder_forward, decode_step,
    init_attention_decoder, init_hidden_state, soft_attention)
from icd_tpu.models.lstm import from_torch_lstm
from icd_tpu.training.common import doubly_stochastic_regularizer


class TorchAttentionDecoder(nn.Module):
    """Replica of the reference attention decoder forward semantics
    (attention.py:218-284) for differential testing."""

    def __init__(self, enc_dim, att_dim, dec_dim, emb_dim, vocab):
        super().__init__()
        self.enc_att = nn.Linear(enc_dim, att_dim)
        self.dec_att = nn.Linear(dec_dim, att_dim)
        self.full_att = nn.Linear(att_dim, 1)
        self.h_lin = nn.Linear(enc_dim, dec_dim)
        self.c_lin = nn.Linear(enc_dim, dec_dim)
        self.f_beta = nn.Linear(dec_dim, enc_dim)
        self.fc = nn.Linear(dec_dim, vocab)
        self.embedding = nn.Embedding(vocab, emb_dim)
        self.cell = nn.LSTMCell(emb_dim + enc_dim, dec_dim)

    def forward(self, enc_out, captions, decode_lengths):
        b, p, _ = enc_out.shape
        max_t = max(decode_lengths)
        vocab = self.fc.out_features
        emb = self.embedding(captions)
        h = self.h_lin(enc_out.mean(1))
        c = self.c_lin(enc_out.mean(1))
        preds = torch.zeros(b, max_t, vocab)
        alphas = torch.zeros(b, max_t, p)
        for t in range(max_t):
            bt = sum(1 for l in decode_lengths if l > t)
            e = self.full_att(torch.relu(
                self.enc_att(enc_out[:bt])
                + self.dec_att(h[:bt]).unsqueeze(1))).squeeze(2)
            alpha = F.softmax(e, dim=1)
            awe = (enc_out[:bt] * alpha.unsqueeze(2)).sum(1)
            awe = torch.sigmoid(self.f_beta(h[:bt])) * awe
            h_t, c_t = self.cell(
                torch.cat([emb[:bt, t], awe], dim=1), (h[:bt], c[:bt]))
            h = torch.cat([h_t, h[bt:]], 0)
            c = torch.cat([c_t, c[bt:]], 0)
            preds[:bt, t] = self.fc(h[:bt])
            alphas[:bt, t] = alpha
        return preds, alphas


def _convert(tmod):
    def lin(m):
        return {"w": jnp.asarray(m.weight.detach().numpy().T),
                "b": jnp.asarray(m.bias.detach().numpy())}

    return {
        "attention": {"enc_att": lin(tmod.enc_att),
                      "dec_att": lin(tmod.dec_att),
                      "full_att": lin(tmod.full_att)},
        "lstm": from_torch_lstm(tmod.cell.weight_ih, tmod.cell.weight_hh,
                                tmod.cell.bias_ih, tmod.cell.bias_hh),
        "h_lin": lin(tmod.h_lin),
        "c_lin": lin(tmod.c_lin),
        "f_beta": lin(tmod.f_beta),
        "fc": lin(tmod.fc),
        "embedding": jnp.asarray(tmod.embedding.weight.detach().numpy()),
    }


ENC, ATT, DEC, EMB, V = 16, 10, 12, 8, 21


def _setup(seed=0):
    torch.manual_seed(seed)
    tmod = TorchAttentionDecoder(ENC, ATT, DEC, EMB, V).eval()
    params = _convert(tmod)
    rng = np.random.default_rng(seed)
    b, p, t = 4, 9, 7
    enc_out = rng.normal(size=(b, p, ENC)).astype(np.float32)
    captions = rng.integers(0, V, size=(b, t)).astype(np.int32)
    return tmod, params, enc_out, captions


def test_uniform_lengths_match_torch():
    tmod, params, enc_out, captions = _setup(0)
    lengths = [captions.shape[1] - 1] * captions.shape[0]
    with torch.no_grad():
        tp, ta = tmod(torch.from_numpy(enc_out),
                      torch.from_numpy(captions.astype(np.int64)), lengths)
    jp, ja = attention_decoder_forward(
        params, jnp.asarray(enc_out), jnp.asarray(captions),
        jnp.asarray(lengths, jnp.int32))
    np.testing.assert_allclose(np.asarray(jp), tp.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-5)


def test_variable_lengths_match_torch():
    """Masked scan == reference shrinking-batch loop (sorted lengths)."""
    tmod, params, enc_out, captions = _setup(1)
    lengths = [6, 5, 3, 2]  # sorted desc, as pack_padded requires
    with torch.no_grad():
        tp, ta = tmod(torch.from_numpy(enc_out),
                      torch.from_numpy(captions.astype(np.int64)), lengths)
    jp, ja = attention_decoder_forward(
        params, jnp.asarray(enc_out), jnp.asarray(captions),
        jnp.asarray(lengths, jnp.int32))
    assert jp.shape == tp.shape
    np.testing.assert_allclose(np.asarray(jp), tp.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-5)


def test_grid_input_flattened():
    _, params, enc_out, captions = _setup(2)
    lengths = jnp.asarray([6, 6, 6, 6], jnp.int32)
    grid = enc_out.reshape(4, 3, 3, ENC)
    jp1, _ = attention_decoder_forward(
        params, jnp.asarray(grid), jnp.asarray(captions), lengths)
    jp2, _ = attention_decoder_forward(
        params, jnp.asarray(enc_out), jnp.asarray(captions), lengths)
    np.testing.assert_allclose(np.asarray(jp1), np.asarray(jp2))


def test_regularizer():
    alphas = jnp.ones((2, 5, 3)) / 3.0  # sum_t = 5/3 per pixel
    val = float(doubly_stochastic_regularizer(alphas, 1.0))
    assert abs(val - (1.0 - 5.0 / 3.0) ** 2) < 1e-6


def test_dropout_train_vs_eval():
    _, params, enc_out, captions = _setup(3)
    lengths = jnp.asarray([6] * 4, jnp.int32)
    jp_eval, _ = attention_decoder_forward(
        params, jnp.asarray(enc_out), jnp.asarray(captions), lengths)
    jp_train, _ = attention_decoder_forward(
        params, jnp.asarray(enc_out), jnp.asarray(captions), lengths,
        rng=jax.random.PRNGKey(0), dropout_rate=0.5)
    # Dropout changes outputs in train mode.
    assert not np.allclose(np.asarray(jp_eval), np.asarray(jp_train))


def test_decode_step_standalone():
    """The single-step API (used by beam search) matches the scan body."""
    _, params, enc_out, captions = _setup(4)
    enc = jnp.asarray(enc_out)
    att = params["attention"]
    att_enc = enc @ att["enc_att"]["w"] + att["enc_att"]["b"]
    h, c = init_hidden_state(params, enc)
    emb_t = params["embedding"][jnp.asarray(captions[:, 0])]
    h2, c2, preds, alpha = decode_step(params, enc, att_enc, emb_t, h, c)
    jp, ja = attention_decoder_forward(
        params, enc, jnp.asarray(captions),
        jnp.asarray([6] * 4, jnp.int32))
    np.testing.assert_allclose(np.asarray(preds), np.asarray(jp[:, 0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ja[:, 0]),
                               atol=1e-6)
