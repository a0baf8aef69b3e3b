"""Attention-model serving throughput: bf16 vs static-int8 backbone.

Same tunnel-safe methodology as bench.py. Run: python tools/bench_attention.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
DECODE_LEN = 25
VOCAB = 10000
REPEATS = 10
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.greedy_attention import greedy_decode_attention
    from icd_tpu.models.attention import (
        AttentionDecoderParams, init_attention_decoder)
    from icd_tpu.models.encoder import (
        ATTENTION_GRID, encoder_attention_forward, init_encoder_attention)
    from icd_tpu.models.resnet import adaptive_avg_pool2d
    from icd_tpu.models.resnet_int8 import (
        calibrate_act_maxes, quantize_resnet, resnet_int8_forward)
    from icd_tpu.ops.image import normalize_imagenet

    p = AttentionDecoderParams()
    p.vocab = list(range(VOCAB))
    encoder = init_encoder_attention(jax.random.PRNGKey(0))
    decoder = init_attention_decoder(jax.random.PRNGKey(1), p)
    enc16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), encoder)
    dec16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), decoder)

    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(2), (BATCH, 224, 224, 3)) * 255).astype(
        jnp.uint8))
    maxes = calibrate_act_maxes(encoder["resnet"], imgs)
    qresnet = quantize_resnet(encoder["resnet"], maxes)

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    @jax.jit
    def run_bf16(imgs, salt):
        def body(i, acc):
            grid, _ = encoder_attention_forward(
                enc16, imgs + (i + salt).astype(jnp.uint8), train=False,
                compute_dtype=jnp.bfloat16)
            toks, _ = greedy_decode_attention(
                dec16, grid.astype(jnp.bfloat16), VOCAB - 3, VOCAB - 2,
                max_len=DECODE_LEN)
            return acc + jnp.sum(toks)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))

    @jax.jit
    def run_int8(imgs, salt):
        def body(i, acc):
            x = normalize_imagenet(imgs + (i + salt).astype(jnp.uint8))
            feats = resnet_int8_forward(qresnet, x.astype(jnp.bfloat16))
            grid = adaptive_avg_pool2d(feats, ATTENTION_GRID)
            toks, _ = greedy_decode_attention(
                dec16, grid, VOCAB - 3, VOCAB - 2, max_len=DECODE_LEN)
            return acc + jnp.sum(toks)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))

    from icd_tpu.decoding.greedy_attention import (
        greedy_decode_attention_int8, quantize_attention_decoder)
    # Quantize from full precision, matching the serve.py int8_decoder
    # path (not the bf16 cast).
    qdec = quantize_attention_decoder(decoder)

    @jax.jit
    def run_int8_dec(imgs, salt):
        def body(i, acc):
            x = normalize_imagenet(imgs + (i + salt).astype(jnp.uint8))
            feats = resnet_int8_forward(qresnet, x.astype(jnp.bfloat16))
            grid = adaptive_avg_pool2d(feats, ATTENTION_GRID)
            toks, _ = greedy_decode_attention_int8(
                dec16, qdec, grid, VOCAB - 3, VOCAB - 2,
                max_len=DECODE_LEN)
            return acc + jnp.sum(toks)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))

    for label, fn in (("bf16", run_bf16), ("int8", run_int8),
                      ("int8+dec", run_int8_dec)):
        np.asarray(fn(imgs, jnp.int32(salt_base + 10)))
        np.asarray(fn(imgs, jnp.int32(salt_base + 11)))
        times = []
        for t in range(TRIALS):
            t0 = time.perf_counter()
            np.asarray(fn(imgs, jnp.int32(salt_base + 12 + t)))
            times.append(time.perf_counter() - t0)
        step = (min(times) - roundtrip) / REPEATS
        print("%s: %.3f ms/batch -> %.0f captions/s" %
              (label, step * 1e3, BATCH / step), flush=True)


if __name__ == "__main__":
    main()
