"""Marginal-cost decomposition of the beam-search decode loop.

The beam loop (icd_tpu/decoding/beam.py body) is ~30 XLA fusions/step x
51 steps; this bench isolates where the time goes by compiling nested
subsets of the body and reporting marginal costs:

  core_noatt   fori_loop of gate+LSTM+fc+log_softmax (fixed context)
  core         + soft attention over the (P, D) grid (enc/att_enc reads)
  core_topk    + cumulative scores, flat top-k, candidate split
  full         beam_search_batched (adds gathers/argsort/seqs/best)

All variants run bf16 params at the serving shapes (B=64, k=5, V=10k)
with the tunnel-safe methodology from bench.py (salted inputs, warmup
x2, min-of-trials, roundtrip subtraction). Decode only: the encoder is
not included. Run: python tools/bench_beam_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
VOCAB = 10000
BEAM = 5
STEPS = 51
REPEATS = 4
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.beam import beam_search_batched
    from icd_tpu.models.attention import (
        AttentionDecoderParams, decode_step, init_attention_decoder,
        init_hidden_state)

    p = AttentionDecoderParams()
    p.vocab = list(range(VOCAB))
    dec = init_attention_decoder(jax.random.PRNGKey(1), p)
    dec = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dec)

    grid = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, 196, 2048), jnp.bfloat16)

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    att = dec["attention"]

    def one_image_loop(flat, salt, mode):
        """51 decode steps for one image's k=BEAM beams."""
        att_enc = flat @ att["enc_att"]["w"] + att["enc_att"]["b"]
        h, c = init_hidden_state(
            dec, jnp.broadcast_to(flat, (BEAM,) + flat.shape))
        words0 = jnp.full((BEAM,), (VOCAB - 3 + salt) % VOCAB, jnp.int32)
        cum0 = jnp.zeros((BEAM,), jnp.float32)

        def body(i, carry):
            h, c, words, cum, acc = carry
            emb = dec["embedding"][words]
            if mode == "core_noatt":
                # Skip attention: fixed context, same LSTM/fc shapes.
                gate = jax.nn.sigmoid(
                    h @ dec["f_beta"]["w"] + dec["f_beta"]["b"])
                ctx = gate * flat[0][None, :]
                x = jnp.concatenate([emb, ctx], axis=-1)
                from icd_tpu.models.lstm import lstm_cell
                h, c = lstm_cell(dec["lstm"], x, h, c)
                logits = h @ dec["fc"]["w"] + dec["fc"]["b"]
            else:
                h, c, logits, _ = decode_step(dec, flat, att_enc, emb, h, c)
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), 1)
            if mode == "core_topk":
                cand = cum[:, None] + logprobs
                top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), BEAM)
                words = (top_idx % VOCAB).astype(jnp.int32)
                cum = top_scores
                acc = acc + jnp.sum(top_idx)
            else:
                words = jnp.argmax(logprobs, 1).astype(jnp.int32)
                cum = cum + logprobs[:, 0]
                acc = acc + jnp.sum(words)
            return h, c, words, cum, acc

        out = jax.lax.fori_loop(
            0, STEPS, body, (h, c, words0, cum0, jnp.int32(0)))
        return out[4]

    def make(mode):
        if mode == "full":
            @jax.jit
            def run(grid, salt):
                def body(i, acc):
                    # salt + i: the body must depend on the induction var
                    # or XLA can CSE the REPEATS decodes into one.
                    g = grid * (1 + (salt + i).astype(jnp.bfloat16) * 1e-6)
                    out = beam_search_batched(
                        dec, g, BEAM, VOCAB - 3, VOCAB - 2)
                    return acc + jnp.sum(out["seq"])
                return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))
            return run

        @jax.jit
        def run(grid, salt):
            def body(i, acc):
                g = grid * (1 + salt.astype(jnp.bfloat16) * 1e-6)
                per_img = jax.vmap(
                    lambda f: one_image_loop(f, salt + i, mode))(g)
                return acc + jnp.sum(per_img)
            return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))
        return run

    results = {}
    for mode in ["core_noatt", "core", "core_topk", "full"]:
        fn = make(mode)
        t0 = time.perf_counter()
        np.asarray(fn(grid, jnp.int32(salt_base + 10)))
        print("%s compiled in %.0f s" % (mode, time.perf_counter() - t0),
              flush=True)
        np.asarray(fn(grid, jnp.int32(salt_base + 11)))
        times = []
        for t in range(TRIALS):
            t0 = time.perf_counter()
            np.asarray(fn(grid, jnp.int32(salt_base + 12 + t)))
            times.append(time.perf_counter() - t0)
        step = (min(times) - roundtrip) / REPEATS
        results[mode] = step
        print("%s: %.2f ms/batch decode" % (mode, step * 1e3), flush=True)

    if len(results) == 4:
        print("\nmarginal costs (ms):", flush=True)
        print("  lstm+fc+logprob core : %.2f" % (results["core_noatt"] * 1e3))
        print("  attention (enc reads): %.2f" %
              ((results["core"] - results["core_noatt"]) * 1e3))
        print("  topk+cand            : %.2f" %
              ((results["core_topk"] - results["core"]) * 1e3))
        print("  bookkeeping (beam.py): %.2f" %
              ((results["full"] - results["core_topk"]) * 1e3))


if __name__ == "__main__":
    main()
