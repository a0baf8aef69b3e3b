"""XLA compiler-flag sweep over the int8 serving program (VERDICT r4 #6).

The int8 serving headline (bench.py: ~12.3k captions/s, MFU 0.49 vs the
v5e int8 peak) is HBM-bound in the conv trunk; the remaining slack named
by the HLO census (NOTES.md "Static int8 serving") is ~30 stage-3 convs
still emitting s32 block outputs (0.39 GB/step at batch 64) that XLA's
conv emitter declines to fuse down to s8. Both source-level levers
measured dead ends; the one untried lever is the compiler itself. This
harness recompiles the EXACT bench.py serving program under a curated
set of XLA debug-option variants and times each with the tunnel-safe
protocol (salted calls, min-of-N, dispatch-roundtrip subtraction,
two warm calls — CLAUDE.md).

Options are passed per-compile via ``jitted.lower(...).compile(
compiler_options=...)`` — the only path that reaches the REMOTE
compiler through the axon tunnel (XLA_FLAGS in this process's env does
not cross it). Unknown/rejected options are recorded as errors and the
sweep continues: the deployed XLA version decides which names exist.

Run on an otherwise-idle host/chip (remote compiles serialize across
processes and host contention corrupts the timing subtraction).

Usage:
    python tools/bench_int8_flags.py [--out sweep.json]
        [--flags name=value[,name=value...]]   # extra custom variant
        [--trials 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
DECODE_LEN = 25
VOCAB = 10000
REPEATS = 10

# Curated variants. Each entry: (name, {xla_option: value}). The
# deployed compiler silently ignores nothing — unknown names raise at
# compile time and are recorded, which is itself useful census data.
VARIANTS = [
    ("baseline", {}),
    # Scoped-VMEM ceiling: larger fusions (conv + epilogue) need more
    # VMEM scratch; the default budget is far under the 128 MiB/core.
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Fusion aggressiveness toggles around the conv emitter.
    ("aggressive_loop_fusion",
     {"xla_tpu_enable_aggressive_loop_fusion": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    # Let the memory-space assigner look further ahead when placing the
    # s32->s8 epilogue buffers.
    ("licm_inflate", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    # Combined best-guess.
    ("vmem_64m+aggr",
     {"xla_tpu_scoped_vmem_limit_kib": "65536",
      "xla_tpu_enable_aggressive_loop_fusion": "true"}),
]


def build_captioner():
    """The bench.py serving program, bit-for-bit (same shapes, same
    <end>-blocked decoder so every variant runs all DECODE_LEN steps)."""
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.serve import make_int8_repeat_captioner
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
    decoder["linear"]["b"] = (
        decoder["linear"]["b"].at[VOCAB - 2].set(-1e9))
    imgs = jnp.asarray(
        (jax.random.uniform(key, (BATCH, 224, 224, 3)) * 255).astype(
            jnp.uint8))
    fn = make_int8_repeat_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, repeats=REPEATS, calib_imgs=imgs,
        int8_decoder=True)
    return fn, imgs


def time_compiled(compiled, imgs, salt_base, roundtrip, trials):
    import jax.numpy as jnp

    # Two fetched warm calls: a fresh program's first execution can
    # read ~40% slow through the tunnel (CLAUDE.md).
    np.asarray(compiled(imgs, jnp.int32(salt_base)))
    np.asarray(compiled(imgs, jnp.int32(salt_base + 1)))
    times = []
    for t in range(trials):
        t0 = time.perf_counter()
        np.asarray(compiled(imgs, jnp.int32(salt_base + 2 + t)))
        times.append(time.perf_counter() - t0)
    step = (min(times) - roundtrip) / REPEATS
    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--flags", default=None,
                    help="extra variant: name=value[,name=value...]")
    args = ap.parse_args()

    variants = list(VARIANTS)
    if args.flags:
        custom = dict(kv.split("=", 1) for kv in args.flags.split(","))
        variants.append(("custom", custom))

    import jax  # noqa: F401 — device init before timing

    fn, imgs = build_captioner()

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer(verbose=False)
    lowered = fn.lower(imgs, np.int32(0))

    rows = []
    for i, (name, opts) in enumerate(variants):
        row = {"variant": name, "options": opts}
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(
                compiler_options=opts if opts else None)
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            step = time_compiled(compiled, imgs,
                                 salt_base + 100 * (i + 1), roundtrip,
                                 args.trials)
            row["step_ms"] = round(step * 1e3, 3)
            row["captions_per_s"] = round(BATCH / step, 1)
        except Exception as e:  # noqa: BLE001 — record and continue
            row["error"] = "{}: {}".format(type(e).__name__, e)[:300]
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = next((r for r in rows
                 if r["variant"] == "baseline" and "step_ms" in r), None)
    if base:
        for r in rows:
            if "step_ms" in r:
                r["vs_baseline"] = round(
                    base["step_ms"] / r["step_ms"], 3)
    summary = {"roundtrip_ms": round(roundtrip * 1e3, 2), "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    best = max((r for r in rows if "captions_per_s" in r),
               key=lambda r: r["captions_per_s"], default=None)
    print(json.dumps({"best": best and best["variant"],
                      "best_captions_per_s":
                          best and best["captions_per_s"]}))


if __name__ == "__main__":
    main()
