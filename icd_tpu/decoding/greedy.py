"""Batched on-device greedy decoding.

Free-running caption generation as a fixed-length ``lax.scan`` with
finished-beam masking — the TPU-shaped replacement for per-step Python
loops. The reference only implements beam search for generation
(gen_captions.py); greedy decode is the throughput path benchmarked in
BASELINE.md (encode + greedy decode, batch 64).
"""

import jax
import jax.numpy as jnp

from ..models.lstm import lstm_cell

MAX_STEPS = 50  # reference caps generation at 50 steps (gen_captions.py:119)


def greedy_decode_baseline(decoder_params, img_features, start_id, end_id,
                           max_len=MAX_STEPS):
    """Greedy decode from the baseline LSTM decoder.

    Args:
        img_features: (B, embed_size) encoder output.

    Returns:
        (B, max_len) int32 tokens; positions after <end> are padded with
        end_id.
    """
    emb = decoder_params["embedding"]
    lin = decoder_params["linear"]
    lstm = decoder_params["lstm"]
    batch = img_features.shape[0]
    hidden = lstm["wh"].shape[0]

    h = jnp.zeros((batch, hidden), img_features.dtype)
    c = jnp.zeros((batch, hidden), img_features.dtype)
    # Timestep 0 consumes the image feature (baseline.py:102-106).
    h, c = lstm_cell(lstm, img_features, h, c)
    first = jnp.argmax(h @ lin["w"] + lin["b"], axis=-1).astype(jnp.int32)
    finished = first == end_id

    # while_loop with an all-finished exit, not a fixed-length scan:
    # positions after <end> are end_id either way (identical output),
    # but on a trained model most captions finish well before max_len
    # and the remaining steps are pure waste. Matches beam.py's
    # load-bearing early-exit design.
    toks = jnp.full((batch, max_len), end_id, jnp.int32)
    toks = toks.at[:, 0].set(first)

    def cond(s):
        return (s[5] < max_len) & jnp.logical_not(jnp.all(s[3]))

    def body(s):
        h, c, tok, finished, toks, i = s
        x = emb[tok]
        h, c = lstm_cell(lstm, x, h, c)
        logits = h @ lin["w"] + lin["b"]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        finished = finished | (nxt == end_id)
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        return (h, c, nxt, finished, toks, i + 1)

    out = jax.lax.while_loop(
        cond, body, (h, c, first, finished, toks, jnp.int32(1)))
    return out[4]


def quantize_baseline_decoder(decoder_params):
    """Baseline decoder params -> W8 int8 serving weights (ops/qlinear).

    The embedding table stays in its float dtype: the per-step gather
    reads only B rows, so quantizing it saves nothing and would cost
    exactness of the looked-up values.
    """
    from ..ops.qlinear import quantize_linear, quantize_lstm

    wq, ws = quantize_linear(decoder_params["linear"]["w"])
    return {
        "embedding": decoder_params["embedding"],
        "lstm": quantize_lstm(decoder_params["lstm"]),
        "linear": {"wq": wq, "ws": ws,
                   "b": decoder_params["linear"]["b"]
                   .astype(jnp.float32)},
    }


def greedy_decode_baseline_int8(qdec, img_features, start_id, end_id,
                                max_len=MAX_STEPS):
    """greedy_decode_baseline over quantize_baseline_decoder weights.

    Same early-exit while_loop and output contract; per-step weight HBM
    traffic halves (the decode loop's bound — see ops/qlinear.py).
    Token-level parity vs the float path is validated on a trained
    checkpoint (tests + NOTES), not guaranteed: near-tie argmaxes can
    flip under quantization noise.
    """
    from ..ops.qlinear import qlstm_cell, qmatmul

    emb = qdec["embedding"]
    lin = qdec["linear"]
    batch = img_features.shape[0]

    def logits_of(h):
        return qmatmul(h, lin["wq"], lin["ws"]) + lin["b"]

    h = jnp.zeros((batch, qdec["lstm"]["whq"].shape[0]), jnp.float32)
    c = jnp.zeros_like(h)
    h, c = qlstm_cell(qdec["lstm"], img_features.astype(jnp.float32),
                      h, c)
    first = jnp.argmax(logits_of(h), axis=-1).astype(jnp.int32)
    finished = first == end_id

    toks = jnp.full((batch, max_len), end_id, jnp.int32)
    toks = toks.at[:, 0].set(first)

    def cond(s):
        return (s[5] < max_len) & jnp.logical_not(jnp.all(s[3]))

    def body(s):
        h, c, tok, finished, toks, i = s
        x = emb[tok].astype(jnp.float32)
        h, c = qlstm_cell(qdec["lstm"], x, h, c)
        nxt = jnp.argmax(logits_of(h), axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        finished = finished | (nxt == end_id)
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        return (h, c, nxt, finished, toks, i + 1)

    out = jax.lax.while_loop(
        cond, body, (h, c, first, finished, toks, jnp.int32(1)))
    return out[4]
