"""Serving pipeline + attention greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from icd_tpu.decoding.greedy_attention import greedy_decode_attention
from icd_tpu.decoding.serve import make_captioner
from icd_tpu.models.attention import (
    AttentionDecoderParams, decode_step, init_attention_decoder,
    init_hidden_state)
from icd_tpu.models.baseline import (
    BaselineDecoderParams, init_baseline_decoder)

from helpers import small_init_encoder


class FakeVocab:
    def __len__(self):
        return 23


def test_make_captioner_shapes():
    p = BaselineDecoderParams()
    p.vocab_size = 23
    p.embed_size = 16
    p.hidden_size = 12
    enc = small_init_encoder(jax.random.PRNGKey(0), 16)
    dec = init_baseline_decoder(jax.random.PRNGKey(1), p)
    captioner = make_captioner(enc, dec, start_id=20, end_id=21,
                               max_len=7, compute_dtype=jnp.float32)
    imgs = jnp.zeros((4, 64, 64, 3), jnp.uint8)
    toks = captioner(imgs)
    assert toks.shape == (4, 7)
    assert toks.dtype == jnp.int32


def test_greedy_attention_matches_stepwise():
    p = AttentionDecoderParams()
    p.attention_dim = 8
    p.decoder_dim = 10
    p.embed_size = 6
    p.vocab = FakeVocab()
    params = init_attention_decoder(jax.random.PRNGKey(0), p,
                                    encoder_dim=12)
    grid = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 12))
    toks, alphas = greedy_decode_attention(params, grid, 20, 21,
                                           max_len=8)
    assert toks.shape == (3, 8)
    assert alphas.shape == (3, 8, 5)

    # stepwise reference
    att = params["attention"]
    att_enc = grid @ att["enc_att"]["w"] + att["enc_att"]["b"]
    h, c = init_hidden_state(params, grid)
    tok = jnp.full((3,), 20, jnp.int32)
    finished = np.zeros(3, bool)
    for t in range(8):
        emb = params["embedding"][tok]
        h2, c2, logits, _ = decode_step(params, grid, att_enc, emb, h, c)
        nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        nxt = np.where(finished, 21, nxt)
        h = jnp.where(jnp.asarray(finished)[:, None], h, h2)
        c = jnp.where(jnp.asarray(finished)[:, None], c, c2)
        finished = finished | (nxt == 21)
        np.testing.assert_array_equal(np.asarray(toks[:, t]), nxt)
        tok = jnp.asarray(nxt)


def test_greedy_attention_end_masking():
    p = AttentionDecoderParams()
    p.attention_dim = 8
    p.decoder_dim = 10
    p.embed_size = 6
    p.vocab = FakeVocab()
    params = init_attention_decoder(jax.random.PRNGKey(3), p,
                                    encoder_dim=12)
    # Force <end> to dominate immediately.
    params["fc"]["b"] = params["fc"]["b"].at[21].add(100.0)
    grid = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 12))
    toks, _ = greedy_decode_attention(params, grid, 20, 21, max_len=6)
    np.testing.assert_array_equal(np.asarray(toks), np.full((2, 6), 21))
