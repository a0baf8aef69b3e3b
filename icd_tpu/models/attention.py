"""Bahdanau soft-attention LSTM decoder (reference: models/attention.py:18-284).

TPU-native design notes:
 - the per-timestep Python loop with shrinking ``batch_size_t``
   (attention.py:260-265) becomes one full-batch ``lax.scan`` with
   length masking — mathematically identical because the reference's
   collate computes caption_lengths *after* padding, making decode
   lengths uniform per batch (attention.py:311-313), and because
   predictions/alphas at masked steps are zeros exactly like the
   reference's preallocated zero tensors (attention.py:252-257)
 - the encoder-side attention projection enc_att(encoder_out) is
   invariant across timesteps, so it is computed once before the scan
   instead of inside every step as the reference does (attention.py:55)
 - the teacher-forced forward keeps only the truly sequential work in
   the scan body. Everything step-invariant is batched outside it:
   the embedding half of the LSTM input matmul (``emb @ wi[:E]``) is
   one (B, T, E) x (E, 4H) matmul before the scan, and the dropout +
   vocab projection run once on the stacked hidden states after it —
   a (B*T, H) x (H, V) matmul with full MXU row utilization instead
   of T thin (B, H) x (H, V) ones, which also removes the fc weight
   (the largest decoder matrix) from the per-step HBM traffic.
   Inside the body, the three matmuls consuming ``h`` (attention
   query, f_beta gate, LSTM recurrent half) are packed into a single
   (B, H) x (H, A+D_enc+4H) matmul.
"""

import jax
import jax.numpy as jnp

from .encoder import _torch_linear_init as _linear
from .lstm import gates_to_state, init_lstm, lstm_cell


class AttentionDecoderParams:
    """Hyperparameters (reference: models/attention.py:64-70)."""

    attention_dim = 512
    decoder_dim = 512
    embed_size = 512  # Use 300 if glove and 768 if BERT.
    dropout = 0.5
    use_bert = False
    vocab = None  # Must override.


ENCODER_DIM = 2048  # reference: attention.py:87 'Set in stone'.


def init_attention_decoder(key, params, encoder_dim=ENCODER_DIM,
                           dtype=jnp.float32):
    assert isinstance(params, AttentionDecoderParams)
    # Any vocabulary-like object with a size works (reference asserts the
    # concrete Vocabulary class, attention.py:84).
    assert params.vocab is not None and hasattr(params.vocab, "__len__")

    vocab_size = len(params.vocab)
    a, d, e = params.attention_dim, params.decoder_dim, params.embed_size
    keys = jax.random.split(key, 9)

    fc_w = jax.random.uniform(keys[0], (d, vocab_size), dtype, -0.1, 0.1)
    embedding = jax.random.uniform(
        keys[1], (vocab_size, e), dtype, -0.1, 0.1)

    return {
        "attention": {
            "enc_att": _linear(keys[2], encoder_dim, a, dtype),
            "dec_att": _linear(keys[3], d, a, dtype),
            "full_att": _linear(keys[4], a, 1, dtype),
        },
        "lstm": init_lstm(keys[5], e + encoder_dim, d, dtype),
        "h_lin": _linear(keys[6], encoder_dim, d, dtype),
        "c_lin": _linear(keys[7], encoder_dim, d, dtype),
        "f_beta": _linear(keys[8], d, encoder_dim, dtype),
        # fc: uniform(-0.1, 0.1) weight, zero bias (attention.py:120-121).
        "fc": {"w": fc_w, "b": jnp.zeros((vocab_size,), dtype)},
        "embedding": embedding,
    }


def load_pretrained_embeddings(decoder_params, embeddings):
    """Swap in a pretrained (GloVe) table (attention.py:128-136)."""
    return dict(decoder_params, embedding=jnp.asarray(embeddings))


def soft_attention(att_params, encoder_out, h, att_enc=None):
    """Additive attention over pixels (reference: attention.py:43-61).

    Args:
        encoder_out: (B, P, D) pixel features.
        h: (B, H) decoder hidden state.
        att_enc: optional precomputed enc_att(encoder_out) (B, P, A).

    Returns:
        (weighted encoding (B, D), attention weights (B, P)).
    """
    if att_enc is None:
        att_enc = (encoder_out @ att_params["enc_att"]["w"]
                   + att_params["enc_att"]["b"])
    att_dec = h @ att_params["dec_att"]["w"] + att_params["dec_att"]["b"]
    act = jax.nn.relu(att_enc + att_dec[..., None, :])
    # Multiply-reduce instead of `act @ w` (a dot): XLA cannot fuse
    # elementwise producers into dot operands, so the dot form
    # materializes the (..., P, A) activation to HBM — 64 MB/step in the
    # batch-64 beam loop. As a reduce it fuses into one pass (f32
    # accumulation, matching the MXU's f32 accumulator).
    w_full = att_params["full_att"]["w"][:, 0]
    scores = (jnp.sum(act * w_full, axis=-1, dtype=jnp.float32)
              + att_params["full_att"]["b"][0]).astype(act.dtype)
    alpha = jax.nn.softmax(scores, axis=-1)
    weighted = jnp.sum(encoder_out * alpha[..., None], axis=-2)
    return weighted, alpha


def init_hidden_state(decoder_params, encoder_out):
    """h, c from the mean pixel feature (reference: attention.py:151-164)."""
    mean_enc = jnp.mean(encoder_out, axis=1)
    h = mean_enc @ decoder_params["h_lin"]["w"] + decoder_params["h_lin"]["b"]
    c = mean_enc @ decoder_params["c_lin"]["w"] + decoder_params["c_lin"]["b"]
    return h, c


def decode_step(decoder_params, encoder_out, att_enc, emb_t, h, c,
                dropout_rng=None, dropout_rate=0.0):
    """One decode step: attention -> gate -> LSTMCell -> fc.

    (reference: attention.py:260-281 loop body, and the identical beam
    search step gen_captions.py:64-74.)
    """
    weighted, alpha = soft_attention(
        decoder_params["attention"], encoder_out, h, att_enc)
    gate = jax.nn.sigmoid(
        h @ decoder_params["f_beta"]["w"] + decoder_params["f_beta"]["b"])
    weighted = gate * weighted
    x = jnp.concatenate([emb_t, weighted], axis=-1)
    h, c = lstm_cell(decoder_params["lstm"], x, h, c)
    out = h
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    preds = out @ decoder_params["fc"]["w"] + decoder_params["fc"]["b"]
    return h, c, preds, alpha


def attention_decoder_forward(decoder_params, encoder_out, captions,
                              decode_lengths, rng=None, dropout_rate=0.0,
                              embeddings=None):
    """Teacher-forced forward over the whole batch.

    Args:
        encoder_out: (B, gh, gw, D) or (B, P, D) encoder grid.
        captions: (B, T) token ids.
        decode_lengths: (B,) int, caption_lengths - 1
            (attention.py:236-240).
        rng: dropout PRNG key (None disables dropout = eval mode).
        embeddings: optional precomputed (B, T, E) embeddings (the BERT
            path, attention.py:242-247); defaults to the learned table.

    Returns:
        (predictions (B, maxT, V), attention_weights (B, maxT, P)) with
        zeros at masked timesteps, exactly like the reference's
        preallocated tensors (attention.py:252-257).
    """
    if encoder_out.ndim == 4:
        b = encoder_out.shape[0]
        encoder_out = encoder_out.reshape(b, -1, encoder_out.shape[-1])
    att = decoder_params["attention"]
    att_enc = encoder_out @ att["enc_att"]["w"] + att["enc_att"]["b"]

    if embeddings is None:
        embeddings = decoder_params["embedding"][captions]  # (B, T, E)
    max_decode = captions.shape[1] - 1

    h, c = init_hidden_state(decoder_params, encoder_out)

    lstm = decoder_params["lstm"]
    e = embeddings.shape[-1]
    # Step-invariant half of the LSTM input matmul, batched over time
    # (biases folded in here so the scan body adds none).
    emb_x = (embeddings[:, :max_decode] @ lstm["wi"][:e]
             + (lstm["bi"] + lstm["bh"]))
    emb_x_tm = jnp.swapaxes(emb_x, 0, 1)  # (T-1, B, 4H)
    w_x_enc = lstm["wi"][e:]  # (D_enc, 4H), the context half

    # Pack the three h-consuming matmuls into one.
    a_dim = att["dec_att"]["w"].shape[1]
    enc_dim = decoder_params["f_beta"]["w"].shape[1]
    w_h_packed = jnp.concatenate(
        [att["dec_att"]["w"], decoder_params["f_beta"]["w"], lstm["wh"]],
        axis=1)
    b_h_packed = jnp.concatenate(
        [att["dec_att"]["b"], decoder_params["f_beta"]["b"],
         jnp.zeros_like(lstm["bh"])])

    w_full = att["full_att"]["w"][:, 0]
    b_full = att["full_att"]["b"][0]
    t_steps = jnp.arange(max_decode)

    def body(carry, xs):
        h, c = carry
        emb_x_t, t = xs
        hp = h @ w_h_packed + b_h_packed
        att_dec = hp[:, :a_dim]
        gate_pre = hp[:, a_dim:a_dim + enc_dim]
        h_gates = hp[:, a_dim + enc_dim:]

        act = jax.nn.relu(att_enc + att_dec[:, None, :])
        # Multiply-reduce (see soft_attention) — fuses into one pass.
        scores = (jnp.sum(act * w_full, axis=-1, dtype=jnp.float32)
                  + b_full).astype(act.dtype)
        alpha = jax.nn.softmax(scores, axis=-1)
        weighted = jnp.sum(encoder_out * alpha[..., None], axis=-2)
        weighted = jax.nn.sigmoid(gate_pre) * weighted

        gates = emb_x_t + weighted @ w_x_enc + h_gates
        new_h, new_c = gates_to_state(gates, c)
        active = (t < decode_lengths)[:, None]
        # Masked rows keep their previous state (the reference never
        # advances h/c for retired rows, attention.py:262-265).
        h = jnp.where(active, new_h, h)
        c = jnp.where(active, new_c, c)
        alpha = jnp.where(active, alpha, 0.0)
        return (h, c), (h, alpha)

    # Two measured dead ends on this scan (tools/bench_train.py
    # --attention, f32 step): unroll=2 regresses 12.5 -> 14.5 ms (the
    # body is fusion-bound, not loop-overhead-bound), and
    # jax.checkpoint(body) regresses 12.5 -> 14.4 ms (recomputing the
    # (B, P, A) attention activation in the backward costs more than
    # the saved HBM residual traffic). Keep the plain scan.
    (_, _), (hs, alphas) = jax.lax.scan(
        body, (h, c), (emb_x_tm, t_steps))

    # Dropout + vocab projection on the stacked states, one big matmul.
    out = jnp.swapaxes(hs, 0, 1)  # (B, T-1, H)
    if rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    preds = out @ decoder_params["fc"]["w"] + decoder_params["fc"]["b"]
    # Masked timesteps read zero, exactly like the reference's
    # preallocated tensors (attention.py:252-257).
    active = t_steps[None, :, None] < decode_lengths[:, None, None]
    preds = jnp.where(active, preds, 0.0)
    return preds, jnp.swapaxes(alphas, 0, 1)
