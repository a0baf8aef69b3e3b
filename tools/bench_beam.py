"""Beam-search (k=5) serving throughput: f32 vs bf16 vs int8 encoder.

Tunnel-safe methodology (see bench.py). The beam while_loop is the
slowest-compiling program in the repo — expect minutes of compile per
variant on a fresh cache. Run: python tools/bench_beam.py [--skip-f32]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
VOCAB = 10000
REPEATS = 4
TRIALS = 3
BEAM = 5


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.beam import beam_search_batched
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

    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(2), (BATCH, 224, 224, 3)) * 255).astype(
        jnp.uint8))
    qresnet = quantize_resnet(
        encoder["resnet"], calibrate_act_maxes(encoder["resnet"], imgs))

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    def make(dtype, int8):
        enc = jax.tree_util.tree_map(lambda x: x.astype(dtype), encoder)
        dec = jax.tree_util.tree_map(lambda x: x.astype(dtype), decoder)

        @jax.jit
        def run(imgs, salt):
            def body(i, acc):
                x = imgs + (i + salt).astype(jnp.uint8)
                if int8:
                    feats = resnet_int8_forward(
                        qresnet, normalize_imagenet(x).astype(dtype))
                    grid = adaptive_avg_pool2d(feats, ATTENTION_GRID)
                else:
                    grid, _ = encoder_attention_forward(
                        enc, x, train=False, compute_dtype=dtype)
                out = beam_search_batched(
                    dec, grid.astype(dtype), BEAM, VOCAB - 3, VOCAB - 2)
                return acc + jnp.sum(out["seq"])
            return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))
        return run

    variants = [("bf16", jnp.bfloat16, False),
                ("int8-enc", jnp.bfloat16, True)]
    if "--skip-f32" not in sys.argv:
        variants.insert(0, ("f32", jnp.float32, False))

    for label, dtype, int8 in variants:
        fn = make(dtype, int8)
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
