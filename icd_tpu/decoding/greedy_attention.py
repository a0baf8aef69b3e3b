"""Batched greedy decoding for the attention decoder.

Free-running generation from the soft-attention model as a fixed-length
``lax.scan`` (the attention counterpart of greedy.py; the reference only
ships beam search, gen_captions.py, so greedy here is the
high-throughput serving addition benchmarked against it).
"""

import jax
import jax.numpy as jnp

from ..models.attention import decode_step, init_hidden_state

MAX_STEPS = 50


def greedy_decode_attention(decoder_params, encoder_grid, start_id, end_id,
                            max_len=MAX_STEPS):
    """Greedy decode from (B, gh, gw, D) or (B, P, D) encoder grids.

    Returns (tokens (B, max_len), alphas (B, max_len, P) f32); alpha
    rows past a caption's <end> are zero, in-caption rows are softmax
    rows over the P pixels.
    """
    if encoder_grid.ndim == 4:
        b = encoder_grid.shape[0]
        encoder_grid = encoder_grid.reshape(b, -1, encoder_grid.shape[-1])
    att = decoder_params["attention"]
    att_enc = (encoder_grid @ att["enc_att"]["w"] + att["enc_att"]["b"])

    batch = encoder_grid.shape[0]
    h, c = init_hidden_state(decoder_params, encoder_grid)
    tok = jnp.full((batch,), start_id, jnp.int32)
    finished = jnp.zeros((batch,), bool)

    p = encoder_grid.shape[1]

    # while_loop with an all-finished exit (see greedy.py): tokens are
    # identical to the fixed-length scan (post-<end> slots are end_id),
    # and trained-model batches stop as soon as every caption has
    # finished. CONTRACT: alpha rows after a caption's <end> are ZERO
    # f32 (the scan used to repeat the frozen-state attention row
    # there); only in-caption rows are meaningful softmax rows.
    toks = jnp.full((batch, max_len), end_id, jnp.int32)
    alphas = jnp.zeros((batch, max_len, p), jnp.float32)

    def cond(s):
        return (s[6] < max_len) & jnp.logical_not(jnp.all(s[3]))

    def body(s):
        h, c, tok, finished, toks, alphas, i = s
        emb = decoder_params["embedding"][tok]
        h2, c2, logits, alpha = decode_step(
            decoder_params, encoder_grid, att_enc, emb, h, c)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        h = jnp.where(finished[:, None], h, h2)
        c = jnp.where(finished[:, None], c, c2)
        alpha = jnp.where(finished[:, None], 0.0,
                          alpha.astype(jnp.float32))
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        alphas = jax.lax.dynamic_update_slice(
            alphas, alpha[:, None, :], (0, i, 0))
        finished = finished | (nxt == end_id)
        return (h, c, nxt, finished, toks, alphas, i + 1)

    out = jax.lax.while_loop(
        cond, body, (h, c, tok, finished, toks, alphas, jnp.int32(0)))
    return out[4], out[5]


def quantize_attention_decoder(decoder_params):
    """int8 weights for the attention decode loop's HBM-heavy matmuls.

    Only the LSTM gates ((E+D, 4H), the widest weight in the model) and
    the vocab projection quantize; the attention/gate projections are
    small and stay float (see ops/qlinear.py for the cost model)."""
    from ..ops.qlinear import quantize_linear, quantize_lstm

    wq, ws = quantize_linear(decoder_params["fc"]["w"])
    return {
        "lstm": quantize_lstm(decoder_params["lstm"]),
        "fc": {"wq": wq, "ws": ws,
               "b": decoder_params["fc"]["b"].astype(jnp.float32)},
    }


def greedy_decode_attention_int8(decoder_params, qdec, encoder_grid,
                                 start_id, end_id, max_len=MAX_STEPS):
    """greedy_decode_attention with W8A8 LSTM/fc weights (``qdec`` from
    quantize_attention_decoder). Same early-exit contract; near-tie
    argmax tokens can flip vs the float path."""
    from ..models.attention import soft_attention
    from ..ops.qlinear import qlstm_cell, qmatmul

    if encoder_grid.ndim == 4:
        b = encoder_grid.shape[0]
        encoder_grid = encoder_grid.reshape(b, -1, encoder_grid.shape[-1])
    att = decoder_params["attention"]
    att_enc = (encoder_grid @ att["enc_att"]["w"] + att["enc_att"]["b"])

    batch, p = encoder_grid.shape[0], encoder_grid.shape[1]
    h, c = init_hidden_state(decoder_params, encoder_grid)
    h = h.astype(jnp.float32)
    c = c.astype(jnp.float32)
    tok = jnp.full((batch,), start_id, jnp.int32)
    finished = jnp.zeros((batch,), bool)
    toks = jnp.full((batch, max_len), end_id, jnp.int32)
    alphas = jnp.zeros((batch, max_len, p), jnp.float32)
    fb = decoder_params["f_beta"]

    def cond(s):
        return (s[6] < max_len) & jnp.logical_not(jnp.all(s[3]))

    def body(s):
        h, c, tok, finished, toks, alphas, i = s
        emb = decoder_params["embedding"][tok]
        hc = h.astype(encoder_grid.dtype)
        weighted, alpha = soft_attention(att, encoder_grid, hc, att_enc)
        gate = jax.nn.sigmoid(hc @ fb["w"] + fb["b"])
        # Segments quantize separately (per-segment row scales): the
        # embedding and the gated context differ in dynamic range on
        # trained models, and one shared abs-max costs caption parity
        # (see ops/qlinear.qlstm_cell).
        x = (emb.astype(jnp.float32),
             (gate * weighted).astype(jnp.float32))
        h2, c2 = qlstm_cell(qdec["lstm"], x, h, c)
        logits = qmatmul(h2, qdec["fc"]["wq"], qdec["fc"]["ws"]) \
            + qdec["fc"]["b"]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        h = jnp.where(finished[:, None], h, h2)
        c = jnp.where(finished[:, None], c, c2)
        alpha = jnp.where(finished[:, None], 0.0,
                          alpha.astype(jnp.float32))
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
        alphas = jax.lax.dynamic_update_slice(
            alphas, alpha[:, None, :], (0, i, 0))
        finished = finished | (nxt == end_id)
        return (h, c, nxt, finished, toks, alphas, i + 1)

    out = jax.lax.while_loop(
        cond, body, (h, c, tok, finished, toks, alphas, jnp.int32(0)))
    return out[4], out[5]
