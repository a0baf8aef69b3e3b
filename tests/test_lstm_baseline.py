"""LSTM + baseline decoder parity vs torch, and loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from icd_tpu.models.baseline import (
    BaselineDecoderParams, baseline_decoder_forward, init_baseline_decoder)
from icd_tpu.models.lstm import from_torch_lstm, init_lstm, lstm_cell, lstm_scan
from icd_tpu.training.common import (
    cross_entropy, merge, partition)


def test_lstm_cell_matches_torch():
    torch.manual_seed(0)
    cell = nn.LSTMCell(6, 5)
    params = from_torch_lstm(cell.weight_ih, cell.weight_hh,
                             cell.bias_ih, cell.bias_hh)
    x = np.random.default_rng(0).normal(size=(3, 6)).astype(np.float32)
    h = np.random.default_rng(1).normal(size=(3, 5)).astype(np.float32)
    c = np.random.default_rng(2).normal(size=(3, 5)).astype(np.float32)
    with torch.no_grad():
        th, tc = cell(torch.from_numpy(x),
                      (torch.from_numpy(h), torch.from_numpy(c)))
    jh, jc = lstm_cell(params, jnp.asarray(x), jnp.asarray(h),
                       jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-6)


def test_lstm_scan_matches_torch():
    torch.manual_seed(1)
    lstm = nn.LSTM(6, 5, batch_first=True)
    params = from_torch_lstm(lstm.weight_ih_l0, lstm.weight_hh_l0,
                             lstm.bias_ih_l0, lstm.bias_hh_l0)
    xs = np.random.default_rng(3).normal(size=(2, 7, 6)).astype(np.float32)
    with torch.no_grad():
        tout, (th, tc) = lstm(torch.from_numpy(xs))
    jout, (jh, jc) = lstm_scan(params, jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jh), th.numpy()[0], atol=1e-6)


def test_baseline_decoder_matches_torch():
    """Full decoder forward vs a torch replica (embedding + LSTM + Linear
    with image feature prepended, reference baseline.py:81-111)."""
    torch.manual_seed(2)
    V, E, H, B, T = 11, 6, 5, 3, 8
    emb = nn.Embedding(V, E)
    lstm = nn.LSTM(E, H, batch_first=True)
    lin = nn.Linear(H, V)

    params = {
        "embedding": jnp.asarray(emb.weight.detach().numpy()),
        "lstm": from_torch_lstm(lstm.weight_ih_l0, lstm.weight_hh_l0,
                                lstm.bias_ih_l0, lstm.bias_hh_l0),
        "linear": {"w": jnp.asarray(lin.weight.detach().numpy().T),
                   "b": jnp.asarray(lin.bias.detach().numpy())},
    }
    rng = np.random.default_rng(4)
    captions = rng.integers(0, V, size=(B, T)).astype(np.int32)
    img_feat = rng.normal(size=(B, E)).astype(np.float32)

    with torch.no_grad():
        e = emb(torch.from_numpy(captions[:, :-1].astype(np.int64)))
        x = torch.cat([torch.from_numpy(img_feat).unsqueeze(1), e], dim=1)
        out, _ = lstm(x)
        ref = lin(out).numpy()

    ours = baseline_decoder_forward(
        params, jnp.asarray(img_feat), jnp.asarray(captions))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(7, 13)).astype(np.float32)
    targets = rng.integers(0, 13, size=(7,))
    targets[2] = 0
    targets[5] = 0

    ref_plain = nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)).item()
    ref_ignore = nn.CrossEntropyLoss(ignore_index=0)(
        torch.from_numpy(logits), torch.from_numpy(targets)).item()

    ours_plain = float(cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(targets)))
    ours_ignore = float(cross_entropy(jnp.asarray(logits),
                                      jnp.asarray(targets), ignore_index=0))
    assert abs(ours_plain - ref_plain) < 1e-6
    assert abs(ours_ignore - ref_ignore) < 1e-6


def test_partition_merge_roundtrip():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2), "d": jnp.ones(1)}}
    mask = {"a": True, "b": {"c": False, "d": True}}
    trainable, frozen = partition(tree, mask)
    assert trainable["b"]["c"] is None
    assert frozen["a"] is None
    back = merge(trainable, frozen)
    assert set(back) == {"a", "b"}
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.zeros(2))


def test_grad_skips_frozen():
    tree = {"w": jnp.ones(2), "frozen": jnp.ones(2)}
    mask = {"w": True, "frozen": False}
    trainable, frozen = partition(tree, mask)

    def loss(trainable):
        full = merge(trainable, frozen)
        return jnp.sum(full["w"] * full["frozen"])

    g = jax.grad(loss)(trainable)
    assert g["frozen"] is None
    np.testing.assert_array_equal(np.asarray(g["w"]), np.ones(2))


def test_decoder_init_shapes():
    p = BaselineDecoderParams()
    p.vocab_size = 20
    p.embed_size = 8
    p.hidden_size = 6
    d = init_baseline_decoder(jax.random.PRNGKey(0), p)
    assert d["embedding"].shape == (20, 8)
    assert d["lstm"]["wi"].shape == (8, 24)
    assert d["linear"]["w"].shape == (6, 20)
