"""Component-level timing: bf16 vs int8 backbone, and HLO inspection.

Run: python tools/bench_int8_parts.py [--hlo]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
REPEATS = 10
TRIALS = 3


def timeit(fn, x, roundtrip, salt_base):
    """Salted per call so the tunnel replay cache can't serve a timed
    dispatch (CLAUDE.md: identical (executable, args) may replay)."""
    import jax.numpy as jnp
    np.asarray(fn(x, jnp.float32(salt_base)))      # compile
    np.asarray(fn(x, jnp.float32(salt_base + 1)))  # first-run warmup
    times = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(fn(x, jnp.float32(salt_base + 2 + t)))
        times.append(time.perf_counter() - t0)
    return (min(times) - roundtrip) / REPEATS


def main():
    import jax
    import jax.numpy as jnp

    from icd_tpu.models.encoder import init_encoder
    from icd_tpu.models.resnet import resnet_forward
    from icd_tpu.models.resnet_int8 import (
        calibrate_act_maxes, quantize_resnet, resnet_int8_forward)

    encoder = init_encoder(jax.random.PRNGKey(0), 512)
    resnet = encoder["resnet"]
    resnet_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), resnet)

    key = jax.random.PRNGKey(1)
    imgs = jax.random.normal(key, (BATCH, 224, 224, 3)).astype(jnp.bfloat16)

    maxes = calibrate_act_maxes(resnet, imgs, compute_dtype=jnp.bfloat16)
    q = quantize_resnet(resnet, maxes)

    @jax.jit
    def run_bf16(x, salt):
        def body(i, acc):
            feats, _ = resnet_forward(
                resnet_bf16, x + (i + salt).astype(x.dtype) * 1e-3,
                train=False)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    @jax.jit
    def run_int8(x, salt):
        def body(i, acc):
            feats = resnet_int8_forward(
                q, x + (i + salt).astype(x.dtype) * 1e-3)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    if "--hlo" in sys.argv:
        txt = jax.jit(lambda x: resnet_int8_forward(q, x)).lower(
            imgs).compile().as_text()
        open("/tmp/int8_resnet_hlo.txt", "w").write(txt)
        txt2 = jax.jit(
            lambda x: resnet_forward(resnet_bf16, x, train=False)[0]).lower(
            imgs).compile().as_text()
        open("/tmp/bf16_resnet_hlo.txt", "w").write(txt2)
        print("wrote /tmp/{int8,bf16}_resnet_hlo.txt")
        return

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    t = timeit(run_bf16, imgs, roundtrip, salt_base + 10)
    print("bf16 resnet: %.3f ms/batch" % (t * 1e3), flush=True)
    t8 = timeit(run_int8, imgs, roundtrip, salt_base + 100)
    print("int8 resnet: %.3f ms/batch" % (t8 * 1e3), flush=True)


if __name__ == "__main__":
    main()
