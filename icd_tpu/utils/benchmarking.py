"""Tunnel-safe timing helpers shared by bench.py and tools/bench_*.py.

The chip is reached through a remote-dispatch tunnel with two traps
(see CLAUDE.md "TPU tunnel gotchas"):

 1. identical (executable, args) calls can be served from a replay
    cache (~0.02 ms) — even across processes — so every timed call must
    carry a per-run random salt;
 2. each dispatch pays a ~30-60 ms host<->device roundtrip that real
    deployments don't, so timed programs loop REPEATS iterations inside
    one jit and the measured tiny-dispatch roundtrip is subtracted.

This module is the single home of that recipe; any methodology change
(min-of-N, double warmup, salting) lands here once.
"""

import os
import time


def fresh_salt_base():
    """Per-run random salt base: defeats the replay cache and makes
    every run's timed args fresh."""
    return int.from_bytes(os.urandom(3), "little")


def measure_roundtrip(salt_base, samples=5):
    """Dispatch-roundtrip overhead to subtract from looped timings.

    Min over ``samples`` salted tiny calls — a single sample can hiccup
    by 2x and corrupt the subtraction. Fetches with np.asarray because
    block_until_ready does NOT wait for remote execution.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    tiny = jax.jit(lambda s: s + 1)
    np.asarray(tiny(jnp.int32(salt_base)))  # compile + first-run warm
    rts = []
    for i in range(samples):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.int32(salt_base + 1 + i)))
        rts.append(time.perf_counter() - t0)
    return min(rts)


def tunnel_timer(verbose=True):
    """(salt_base, roundtrip_seconds) — the standard bench preamble."""
    salt_base = fresh_salt_base()
    roundtrip = measure_roundtrip(salt_base)
    if verbose:
        print("roundtrip %.1f ms" % (roundtrip * 1e3), flush=True)
    return salt_base, roundtrip
