"""Measure bf16 vs static-int8 serving throughput on the real chip.

Same methodology as bench.py (repeat captioner, roundtrip subtraction,
fetch-to-host). Run: python tools/bench_int8.py
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


def time_captioner(fn, imgs, roundtrip, salt_base):
    """Per-run random salts defeat the tunnel's replay cache (identical
    (executable, args) calls can be served from a recording)."""
    import jax.numpy as jnp
    np.asarray(fn(imgs, jnp.int32(salt_base)))      # compile
    np.asarray(fn(imgs, jnp.int32(salt_base + 1)))  # first-run warmup
    times = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(fn(imgs, jnp.int32(salt_base + 2 + t)))
        times.append(time.perf_counter() - t0)
    return (min(times) - roundtrip) / REPEATS


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.serve import (
        make_int8_repeat_captioner, make_repeat_captioner)
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

    imgs = jnp.asarray((jax.random.uniform(
        key, (BATCH, 224, 224, 3)) * 255).astype(jnp.uint8))

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    bf16 = make_repeat_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, repeats=REPEATS)
    step = time_captioner(bf16, imgs, roundtrip, salt_base + 10)
    print("bf16 : %.3f ms/batch -> %.0f captions/s" %
          (step * 1e3, BATCH / step), flush=True)

    print("calibrating...", flush=True)
    int8 = make_int8_repeat_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, repeats=REPEATS, calib_imgs=imgs)
    print("compiling int8...", flush=True)
    step8 = time_captioner(int8, imgs, roundtrip, salt_base + 100)
    print("int8 : %.3f ms/batch -> %.0f captions/s" %
          (step8 * 1e3, BATCH / step8), flush=True)

    int8d = make_int8_repeat_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, repeats=REPEATS,
        act_maxes=int8.act_maxes, int8_decoder=True)
    print("compiling int8+dec...", flush=True)
    step8d = time_captioner(int8d, imgs, roundtrip, salt_base + 200)
    print("int8+dec: %.3f ms/batch -> %.0f captions/s" %
          (step8d * 1e3, BATCH / step8d), flush=True)


if __name__ == "__main__":
    main()
