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
MAX_ATTEMPTS = 3  # re-exec retries when the axon tunnel is transiently down

# MFU accounting: the encoder dominates the pipeline FLOPs (NOTES.md
# serving decomposition: decode is ~0.4 ms of the 7.5 ms batch).
RESNET101_GFLOP = 15.6  # 2 * 7.8 GMAC forward at 224x224, per image
V5E_INT8_TOPS = 394.0
V5E_BF16_TFLOPS = 197.0


def main():
    # Fault injection for testing the retry/error plumbing without a
    # real tunnel outage: ICD_TPU_BENCH_FAULT=N raises a synthetic
    # UNAVAILABLE on attempts <= N.
    fault_until = int(os.environ.get("ICD_TPU_BENCH_FAULT", "0"))
    attempt = int(os.environ.get("ICD_TPU_BENCH_ATTEMPT", "1"))
    if attempt <= fault_until:
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "injected fault (attempt {})".format(attempt))

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

    # Model FLOPs utilization vs the chip's marketed peak for the
    # arithmetic the path actually runs (int8 conv trunk vs bf16).
    peak_gflop_s = (V5E_INT8_TOPS if label == "int8"
                    else V5E_BF16_TFLOPS) * 1e3
    mfu = value * RESNET101_GFLOP / peak_gflop_s

    print(json.dumps({
        "metric": "captions/sec/chip ({} encode + greedy decode, "
                  "batch 64)".format(label),
        "value": round(value, 2),
        "unit": "captions/s",
        "vs_baseline": round(value / BASELINE_CAPTIONS_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "mfu_peak": ("v5e int8 394 TOPS" if label == "int8"
                     else "v5e bf16 197 TFLOPS"),
    }))


def _is_transient(exc) -> bool:
    """Tunnel/backend failures worth a fresh-process retry (the round-2
    driver run died on exactly this: 'Unable to initialize backend
    "axon": UNAVAILABLE', BENCH_r02.json)."""
    msg = "{}: {}".format(type(exc).__name__, exc)
    return any(s in msg for s in (
        "UNAVAILABLE", "Unable to initialize backend",
        "DEADLINE_EXCEEDED", "failed to connect"))


def _arm_watchdog():
    """Bound a tunnel hang: the axon client retries connection failures
    internally forever (measured: a refused endpoint never raises), which
    would otherwise leave the driver a timeout with no JSON. At the
    deadline, emit the structured error line and hard-exit."""
    import threading

    deadline = float(os.environ.get("ICD_TPU_BENCH_DEADLINE", "900"))

    def fire():
        print(json.dumps({
            "metric": "captions/sec/chip (encode + greedy decode, "
                      "batch 64)",
            "value": None,
            "unit": "captions/s",
            "vs_baseline": None,
            "error": "watchdog: bench exceeded {}s deadline (TPU tunnel "
                     "hang?)".format(int(deadline)),
        }), flush=True)
        os._exit(1)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    # Early heartbeat on stderr (stdout keeps the one-JSON-line
    # contract): if the DRIVER's own timeout is shorter than ours and
    # SIGKILLs us first, its captured tail still shows the bench
    # started and what deadline it was working to.
    print("bench.py attempt {} started; watchdog deadline {}s".format(
        os.environ.get("ICD_TPU_BENCH_ATTEMPT", "1"), int(deadline)),
        file=sys.stderr, flush=True)
    return t


if __name__ == "__main__":
    _watchdog = _arm_watchdog()
    try:
        main()
        _watchdog.cancel()
    except BaseException as e:  # noqa: BLE001 — must always emit JSON
        # Disarm first: a timer firing mid-backoff would kill the retry
        # this handler is about to schedule, and one firing mid-print
        # would race a second JSON line onto stdout.
        _watchdog.cancel()
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        attempt = int(os.environ.get("ICD_TPU_BENCH_ATTEMPT", "1"))
        if _is_transient(e) and attempt < MAX_ATTEMPTS:
            print("bench.py attempt {}/{} failed ({}); retrying in a "
                  "fresh process".format(attempt, MAX_ATTEMPTS,
                                         type(e).__name__),
                  file=sys.stderr, flush=True)
            time.sleep(10 * attempt)
            env = dict(os.environ, ICD_TPU_BENCH_ATTEMPT=str(attempt + 1))
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        # Final failure: still print ONE parseable JSON line so the
        # driver's `parsed` field records the reason, never null.
        print(json.dumps({
            "metric": "captions/sec/chip (encode + greedy decode, "
                      "batch 64)",
            "value": None,
            "unit": "captions/s",
            "vs_baseline": None,
            "error": "{}: {}".format(type(e).__name__, e)[:500],
            "attempts": attempt,
        }))
        sys.exit(1)
