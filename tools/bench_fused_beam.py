"""Decode-only beam-search: XLA loop vs int8-grid vs fused Pallas kernel.

Serving shapes (B=64, k=5, V=10k, P=196, bf16). The end token's fc bias
is forced to -1e9 so no beam retires and every variant runs the full
51-step budget (random-weight beams otherwise finish early, which makes
the XLA loop look ~3x faster than its trained-model behavior).
Tunnel-safe methodology per bench.py. Run:
    python tools/bench_fused_beam.py [--skip-xla]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("ICD_TPU_BENCH_BATCH", "64"))
VOCAB = 10000
BEAM = 5
REPEATS = 4
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.decoding.beam import beam_search_batched
    from icd_tpu.models.attention import (
        AttentionDecoderParams, init_attention_decoder)
    from icd_tpu.ops.fused_beam import beam_search_fused

    p = AttentionDecoderParams()
    p.vocab = list(range(VOCAB))
    dec = init_attention_decoder(jax.random.PRNGKey(1), p)
    dec["fc"]["b"] = dec["fc"]["b"].at[VOCAB - 2].set(-1e9)
    dec = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dec)
    grids = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, 196, 2048), jnp.bfloat16)

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    def make(mode):
        @jax.jit
        def run(grids, salt):
            def body(i, acc):
                g = grids * (1 + (salt + i).astype(jnp.bfloat16) * 1e-6)
                if mode == "fused":
                    out = beam_search_fused(
                        dec, g, BEAM, VOCAB - 3, VOCAB - 2)
                else:
                    out = beam_search_batched(
                        dec, g, BEAM, VOCAB - 3, VOCAB - 2,
                        int8_grid=(mode == "xla-int8grid"))
                return acc + jnp.sum(out["seq"]) + jnp.sum(out["seq_len"])
            return jax.lax.fori_loop(0, REPEATS, body, jnp.int32(0))
        return run

    if os.environ.get("ICD_TPU_FB_ABLATE"):
        modes = ["fused"]  # phase-ablation triage: kernel only
    else:
        modes = ["fused", "xla-int8grid"]
        if "--skip-xla" not in sys.argv:
            modes.append("xla")
    for mode in modes:
        fn = make(mode)
        t0 = time.perf_counter()
        np.asarray(fn(grids, jnp.int32(salt_base + 10)))
        print("%s compiled in %.0f s" % (mode, time.perf_counter() - t0),
              flush=True)
        np.asarray(fn(grids, jnp.int32(salt_base + 11)))
        times = []
        for t in range(TRIALS):
            t0 = time.perf_counter()
            np.asarray(fn(grids, jnp.int32(salt_base + 12 + t)))
            times.append(time.perf_counter() - t0)
        step = (min(times) - roundtrip) / REPEATS
        print("%s: %.2f ms/batch decode -> %.0f captions/s (decode only)"
              % (mode, step * 1e3, BATCH / step), flush=True)


if __name__ == "__main__":
    main()
