"""Baseline LSTM decoder (reference: models/baseline.py:19-111).

Image feature vector is prepended as timestep 0 of the embedded caption
(minus its last token), a single-layer LSTM runs over the whole sequence
in one ``lax.scan``, and a Linear projects to vocab logits. Scores align
position-for-position with the *full* caption (including <start>), which
is exactly what the reference trains against
(models/baseline.py:224-225).
"""

import math

import jax
import jax.numpy as jnp

from .lstm import init_lstm, lstm_scan


class BaselineDecoderParams:
    """Hyperparameters (reference: models/baseline.py:19-22)."""

    hidden_size = 512
    embed_size = 512  # Use 300 if glove.
    vocab_size = None  # Must override.


def init_baseline_decoder(key, params, dtype=jnp.float32):
    assert params.vocab_size is not None
    k_emb, k_lstm, k_lin = jax.random.split(key, 3)
    v, e, h = params.vocab_size, params.embed_size, params.hidden_size
    bound = 1.0 / math.sqrt(h)
    k_w, k_b = jax.random.split(k_lin)
    return {
        # torch nn.Embedding default: N(0, 1).
        "embedding": jax.random.normal(k_emb, (v, e), dtype),
        "lstm": init_lstm(k_lstm, e, h, dtype),
        "linear": {
            "w": jax.random.uniform(k_w, (h, v), dtype, -bound, bound),
            "b": jax.random.uniform(k_b, (v,), dtype, -bound, bound),
        },
    }


def load_pretrained_embeddings(decoder_params, embeddings):
    """Swap in a pretrained embedding table (GloVe), reference
    baseline.py:59-66."""
    return dict(decoder_params, embedding=jnp.asarray(embeddings))


def baseline_decoder_forward(decoder_params, img_features, captions):
    """Teacher-forced forward.

    Args:
        img_features: (B, embed_size) encoder output.
        captions: (B, T) int token ids (padded).

    Returns:
        (B, T, vocab_size) logits; logits[:, t] predicts captions[:, t]
        (t=0 is predicted from the image feature alone).
    """
    emb = decoder_params["embedding"][captions[:, :-1]]  # (B, T-1, E)
    xs = jnp.concatenate(
        [img_features[:, None, :].astype(emb.dtype), emb], axis=1)
    outs, _ = lstm_scan(decoder_params["lstm"], xs)
    lin = decoder_params["linear"]
    return outs @ lin["w"] + lin["b"]
