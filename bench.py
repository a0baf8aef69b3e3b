"""Benchmark: captions/sec/chip, encode (ResNet-101) + greedy decode.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's best sustained throughput is ~246 captions/s
(batch-32 training steps on a CPU cluster, BASELINE.md); the BASELINE.json
north star is >=10x that on a v5e chip for encode + greedy decode at
batch 64.

Methodology: the whole encode+greedy-decode pipeline runs as one jitted
program; REPEATS perturbed batches are processed per dispatch and the
measured host<->device roundtrip overhead is subtracted, because the
dev tunnel to the chip adds ~30-60 ms per dispatch that real
deployments don't pay. Results are fetched (not just
block_until_ready'd) to close the async pipeline.

Serving configuration: static-calibration W8A8 int8 backbone
(icd_tpu/models/resnet_int8.py) + W8A8 int8 decoder weights
(ops/qlinear.py, dynamic per-row activation scales) — the production
serving path. Quality-parity is validated on trained checkpoints
(backbone: 94.5% exact caption match, equal BLEU/CIDEr; int8 decoder:
100% caption match on the fixture model; NOTES.md). Set
ICD_TPU_BENCH_BF16=1 to bench the pure-bf16 path instead.
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
    # Pin the <end> logit unreachable: the serving decode early-exits
    # when every caption emits <end>, and random-init weights could
    # (seed-dependently) do that early and silently inflate captions/s.
    # Forcing the full DECODE_LEN steps keeps the bench honest.
    decoder["linear"]["b"] = (
        decoder["linear"]["b"].at[VOCAB - 2].set(-1e9))

    imgs = jnp.asarray(
        (jax.random.uniform(key, (BATCH, 224, 224, 3)) * 255).astype(
            jnp.uint8))

    if os.environ.get("ICD_TPU_BENCH_BF16"):
        label = "bf16"
        caption_many = make_repeat_captioner(
            encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
            max_len=DECODE_LEN, repeats=REPEATS)
    else:
        label = "int8"
        # int8 backbone (static calibration) + int8 decoder weights
        # (dynamic per-row activation scales): measured 13,840 vs
        # 13,352 captions/s backbone-only; 100% caption parity vs the
        # float decode on the trained fixture checkpoint (NOTES.md).
        caption_many = make_int8_repeat_captioner(
            encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
            max_len=DECODE_LEN, repeats=REPEATS, calib_imgs=imgs,
            int8_decoder=True)

    # Salted-roundtrip preamble (replay-cache defeat + dispatch-overhead
    # measurement): icd_tpu/utils/benchmarking.py documents the recipe.
    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer(verbose=False)

    # Warmup / compile (salted so it can't be replay-served), plus one
    # extra warm call: the first execution of a freshly-compiled program
    # can read slow through the dev tunnel (NOTES.md).
    np.asarray(caption_many(imgs, jnp.int32(salt_base + 10)))
    np.asarray(caption_many(imgs, jnp.int32(salt_base + 11)))

    times = []
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(caption_many(imgs, jnp.int32(salt_base + 12 + trial)))
        times.append(time.perf_counter() - t0)
    step = (min(times) - roundtrip) / REPEATS
    value = BATCH / step

    print(json.dumps({
        "metric": "captions/sec/chip ({} encode + greedy decode, "
                  "batch 64)".format(label),
        "value": round(value, 2),
        "unit": "captions/s",
        "vs_baseline": round(value / BASELINE_CAPTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
