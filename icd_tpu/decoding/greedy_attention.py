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

    Returns (tokens (B, max_len), alphas (B, max_len, P)).
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

    def step(carry, _):
        h, c, tok, finished = carry
        emb = decoder_params["embedding"][tok]
        h2, c2, logits, alpha = decode_step(
            decoder_params, encoder_grid, att_enc, emb, h, c)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        h = jnp.where(finished[:, None], h, h2)
        c = jnp.where(finished[:, None], c, c2)
        finished = finished | (nxt == end_id)
        return (h, c, nxt, finished), (nxt, alpha)

    (_, _, _, _), (toks, alphas) = jax.lax.scan(
        step, (h, c, tok, finished), None, length=max_len)
    return jnp.swapaxes(toks, 0, 1), jnp.swapaxes(alphas, 0, 1)
