"""Benchmark: captions/sec/chip, encode (ResNet-101) + greedy decode.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's best sustained throughput is ~246 captions/s
(batch-32 training steps on a CPU cluster, BASELINE.md); the BASELINE.json
north star is >=10x that on a v5e chip for encode + greedy decode at
batch 64.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 64
DECODE_LEN = 25
VOCAB = 10000
BASELINE_CAPTIONS_PER_SEC = 246.0


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.greedy import greedy_decode_baseline
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import encoder_forward, init_encoder

    p = BaselineDecoderParams()
    p.vocab_size = VOCAB
    p.embed_size = 512
    p.hidden_size = 512
    key = jax.random.PRNGKey(0)
    ekey, dkey = jax.random.split(key)
    encoder = init_encoder(ekey, 512)
    decoder = init_baseline_decoder(dkey, p)

    @jax.jit
    def caption_batch(encoder, decoder, imgs):
        feats, _ = encoder_forward(
            encoder, imgs, train=False, compute_dtype=jnp.bfloat16)
        return greedy_decode_baseline(
            decoder, feats.astype(jnp.float32), start_id=VOCAB - 3,
            end_id=VOCAB - 2, max_len=DECODE_LEN)

    imgs = jnp.asarray(
        (jax.random.uniform(key, (BATCH, 224, 224, 3)) * 255).astype(
            jnp.uint8))

    # Warmup / compile.
    caption_batch(encoder, decoder, imgs).block_until_ready()

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        caption_batch(encoder, decoder, imgs).block_until_ready()
        times.append(time.perf_counter() - t0)
    step = sorted(times)[len(times) // 2]
    value = BATCH / step

    print(json.dumps({
        "metric": "captions/sec/chip (encode + greedy decode, batch 64)",
        "value": round(value, 2),
        "unit": "captions/s",
        "vs_baseline": round(value / BASELINE_CAPTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
