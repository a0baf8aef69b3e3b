"""Attention f32 train-step decomposition: measure the floor.

VERDICT round-2 #6 asks either to push the attention f32 training row
past 11x or to PROVE 12.7 ms/step is the floor. This tool produces the
proof-side evidence: it times the full step and its components
(encoder-only forward, decoder-only fwd+bwd, decoder forward, and a
P=1 "attention reads ablated" decoder step), then compares the scan's
share against the HBM roofline of its per-step attention traffic —
reading att_enc (B,P,A) and encoder_out (B,P,D) every timestep in
forward AND backward is ~4.6 GB per step at these shapes, ~5.6 ms at
the v5e's 819 GB/s even at 100% bandwidth efficiency (NOTES.md).

Same tunnel-safe methodology as bench.py (salted fori_loop repeats,
roundtrip subtraction). Run on the real chip:

    python tools/bench_attention_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
CAP_LEN = 25
VOCAB = 10000
REPEATS = 10
TRIALS = 3
HBM_GB_S = 819.0  # v5e marketed HBM bandwidth


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import icd_tpu.training.attention as ta
    from icd_tpu.models.attention import (
        AttentionDecoderParams, attention_decoder_forward,
        init_attention_decoder)
    from icd_tpu.models.encoder import (
        encoder_attention_forward, init_encoder_attention, trainable_mask)
    from icd_tpu.training.common import (
        doubly_stochastic_regularizer, partition)
    from icd_tpu.utils.benchmarking import tunnel_timer

    ap = AttentionDecoderParams()
    ap.vocab = list(range(VOCAB))
    encoder = init_encoder_attention(jax.random.PRNGKey(0))
    decoder = init_attention_decoder(jax.random.PRNGKey(1), ap)
    mask = {
        "encoder": trainable_mask(encoder, fine_tune=False, head=False),
        "decoder": jax.tree_util.tree_map(lambda _: True, decoder),
    }
    trainable, frozen = partition(
        {"encoder": encoder, "decoder": decoder}, mask)
    tx = optax.adam(1e-4)
    opt_state = tx.init(trainable)

    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(2), (BATCH, 224, 224, 3)) * 255).astype(
        jnp.uint8))
    captions = jax.random.randint(
        jax.random.PRNGKey(3), (BATCH, CAP_LEN), 0, VOCAB)
    decode_lengths = jnp.full((BATCH,), CAP_LEN - 1, jnp.int32)
    rng = jax.random.PRNGKey(7)

    grid0, _ = jax.jit(
        lambda im: encoder_attention_forward(encoder, im, train=True))(imgs)
    grid0 = jax.block_until_ready(grid0)

    salt_base, roundtrip = tunnel_timer()

    def timed(label, fn, *args):
        """fn(salt) -> scalar; loops REPEATS inside one jit already."""
        np.asarray(fn(jnp.int32(salt_base + 10), *args))
        np.asarray(fn(jnp.int32(salt_base + 11), *args))
        times = []
        for t in range(TRIALS):
            t0 = time.perf_counter()
            np.asarray(fn(jnp.int32(salt_base + 12 + t), *args))
            times.append(time.perf_counter() - t0)
        ms = (min(times) - roundtrip) / REPEATS * 1e3
        print("%-28s %7.3f ms/step" % (label, ms), flush=True)
        return ms

    # ---- 1. full f32 train step (the README row)
    att_step = ta.make_train_step(mask, tx, alpha_c=1.0, dropout_rate=0.5,
                                  compute_dtype=None, qresnet=None)

    @jax.jit
    def run_full(salt, trainable, frozen, opt_state):
        def body(i, carry):
            t, f, o, acc = carry
            t, f, o, loss = att_step(
                t, f, o, rng, imgs + (i + salt).astype(jnp.uint8),
                captions, decode_lengths)
            return t, f, o, acc + loss
        return jax.lax.fori_loop(
            0, REPEATS, body, (trainable, frozen, opt_state,
                               jnp.float32(0)))[3]

    full_ms = timed("full f32 step", run_full, trainable, frozen,
                    opt_state)

    # ---- 2. encoder-only forward (frozen backbone, train-mode BN)
    @jax.jit
    def run_enc(salt):
        def body(i, acc):
            g, _ = encoder_attention_forward(
                encoder, imgs + (i + salt).astype(jnp.uint8), train=True)
            return acc + jnp.sum(g[:, 0, 0, 0])
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    enc_ms = timed("encoder fwd only", run_enc)

    # ---- decoder-only train step factory (precomputed grid input)
    def make_dec_step(tx):
        def loss_fn(dec, grid):
            scores, alphas = attention_decoder_forward(
                dec, grid, captions, decode_lengths, rng=rng,
                dropout_rate=0.5)
            targets = captions[:, 1:]
            t_idx = jnp.arange(targets.shape[1])[None, :]
            included = t_idx < decode_lengths[:, None]
            logprobs = jax.nn.log_softmax(
                scores.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logprobs, targets[..., None], axis=-1)[..., 0]
            loss = (jnp.sum(jnp.where(included, nll, 0.0))
                    / jnp.maximum(jnp.sum(included), 1))
            return loss + doubly_stochastic_regularizer(
                alphas.astype(jnp.float32), 1.0)

        def step(dec, opt, grid):
            loss, grads = jax.value_and_grad(loss_fn)(dec, grid)
            updates, opt = tx.update(grads, opt, dec)
            return optax.apply_updates(dec, updates), opt, loss
        return step

    dtx = optax.adam(1e-4)
    dec_opt = dtx.init(decoder)
    dec_step = make_dec_step(dtx)

    def run_dec_factory(grid):
        @jax.jit
        def run_dec(salt, decoder, dec_opt):
            def body(i, carry):
                d, o, acc = carry
                g = grid + (i + salt).astype(grid.dtype) * 1e-6
                d, o, loss = dec_step(d, o, g)
                return d, o, acc + loss
            return jax.lax.fori_loop(
                0, REPEATS, body, (decoder, dec_opt, jnp.float32(0)))[2]
        return run_dec

    # ---- 3. decoder fwd+bwd+adam on the real (14,14) grid
    dec_ms = timed("decoder step (P=196)", run_dec_factory(grid0),
                   decoder, dec_opt)

    # ---- 4. decoder step with the attention reads ablated (P=1):
    # same matmuls/LSTM/fc/loss per step, but the (B,P,A)+(B,P,D)
    # per-step HBM traffic collapses ~200x.
    grid_p1 = grid0[:, :1, :1, :]
    p1_ms = timed("decoder step (P=1 ablation)", run_dec_factory(grid_p1),
                  decoder, dec_opt)

    # ---- 5. decoder forward only
    @jax.jit
    def run_fwd(salt, decoder):
        def body(i, acc):
            g = grid0 + (i + salt).astype(grid0.dtype) * 1e-6
            scores, _ = attention_decoder_forward(
                decoder, g, captions, decode_lengths, rng=rng,
                dropout_rate=0.5)
            return acc + jnp.sum(scores[:, 0, 0])
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    fwd_ms = timed("decoder fwd only (P=196)", run_fwd, decoder)

    # ---- roofline
    b, p, a, d = BATCH, 196, ap.attention_dim, 2048
    t_steps = CAP_LEN - 1
    att_bytes_fwd = (b * p * a + b * p * d) * 4
    att_gb = t_steps * 3 * att_bytes_fwd / 1e9  # fwd read + ~2x bwd
    floor_ms = att_gb / HBM_GB_S * 1e3
    print("\nattention-read HBM roofline: %.2f GB/step -> %.2f ms at "
          "%.0f GB/s (100%% efficiency)" % (att_gb, floor_ms, HBM_GB_S))
    print("attention-read share measured: decoder step P=196 minus "
          "P=1 ablation = %.2f ms" % (dec_ms - p1_ms))
    print("encoder + decoder components: %.2f ms vs full step "
          "%.2f ms" % (enc_ms + dec_ms, full_ms))


if __name__ == "__main__":
    main()
