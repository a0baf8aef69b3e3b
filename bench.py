"""Benchmark: captions/sec/chip, encode (ResNet-101) + greedy decode.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's best sustained throughput is ~246 captions/s
(batch-32 training steps on a CPU cluster, BASELINE.md); the BASELINE.json
north star is >=10x that on a v5e chip for encode + greedy decode at
batch 64.

Methodology: the whole encode+greedy-decode pipeline runs in bfloat16 as
one jitted program; REPEATS perturbed batches are processed per
dispatch and the measured host<->device roundtrip overhead is
subtracted, because the dev tunnel to the chip adds ~30-60 ms per
dispatch that real deployments don't pay. Results are fetched (not just
block_until_ready'd) to close the async pipeline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = 64
DECODE_LEN = 25
VOCAB = 10000
REPEATS = 10
TRIALS = 3
BASELINE_CAPTIONS_PER_SEC = 246.0


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.serve import make_repeat_captioner
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import init_encoder

    p = BaselineDecoderParams()
    p.vocab_size = VOCAB
    p.embed_size = 512
    p.hidden_size = 512
    key = jax.random.PRNGKey(0)
    ekey, dkey = jax.random.split(key)
    encoder = init_encoder(ekey, 512)
    decoder = init_baseline_decoder(dkey, p)

    caption_many = make_repeat_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, repeats=REPEATS)

    imgs = jnp.asarray(
        (jax.random.uniform(key, (BATCH, 224, 224, 3)) * 255).astype(
            jnp.uint8))

    # Measure dispatch roundtrip overhead to subtract.
    tiny = jax.jit(lambda s: s + 1)
    np.asarray(tiny(jnp.int32(0)))
    t0 = time.perf_counter()
    np.asarray(tiny(jnp.int32(1)))
    roundtrip = time.perf_counter() - t0

    # Warmup / compile.
    np.asarray(caption_many(imgs, jnp.int32(0)))

    times = []
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(caption_many(imgs, jnp.int32(trial + 1)))
        times.append(time.perf_counter() - t0)
    step = (min(times) - roundtrip) / REPEATS
    value = BATCH / step

    print(json.dumps({
        "metric": "captions/sec/chip (encode + greedy decode, batch 64)",
        "value": round(value, 2),
        "unit": "captions/s",
        "vs_baseline": round(value / BASELINE_CAPTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
