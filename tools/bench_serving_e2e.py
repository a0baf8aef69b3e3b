"""End-to-end host-fed serving bench: JPEG -> decode/resize -> captions.

bench.py's headline feeds on-device random images; this bench drives the
REAL serving path — JPEG bytes through the native libjpeg decoder
(icd_tpu/native/imageio.py), a thread-pool host pipeline, device_prefetch
into HBM, and the int8 encode + greedy decode captioner — and reports
whether the host sustains the device-only throughput, plus an MFU-style
utilization estimate for the encoder.

Tunnel caveats (see CLAUDE.md): every dispatch pays the ~30-60 ms axon
roundtrip real deployments don't, and — decisive for THIS bench —
host->device transfers ride the tunnel at ~tens of MB/s where real
hosts have PCIe (tens of GB/s). A batch-64 uint8 image batch is 9.6 MB,
so the e2e loop is transfer-bound on the tunnel no matter how the host
pipeline performs. The bench therefore measures the tunnel's h2d
bandwidth explicitly and reports, alongside the raw tunnel-capped e2e
number, the projected e2e rate with transfers at PCIe speed: the min
of host-pipeline rate and device-only rate. The builder container also
has nproc=1 (the thread pool adds no parallelism), so the host decode
rate is a per-core number; scale by the deployment's core count.

Run: python tools/bench_serving_e2e.py [--batches N]
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
N_BATCHES = 24
SRC_W, SRC_H = 640, 480  # COCO-typical source size
DECODE_LEN = 25
VOCAB = 10000
RESNET101_GFLOP = 15.6  # 2 * 7.8 GMAC forward at 224x224
V5E_INT8_TOPS = 394.0


def _make_jpegs(n, seed=None):
    # Per-run random by default: every timed dispatch's args derive from
    # these bytes, and identical (executable, args) calls can be served
    # from the tunnel's replay cache ACROSS PROCESSES (CLAUDE.md) — a
    # fixed seed would make a second run of this bench read ~0 ms.
    from PIL import Image

    rng = np.random.default_rng(seed)
    blobs = []
    for _ in range(n):
        # Low-frequency content so JPEG decode cost is realistic
        # (pure noise inflates entropy decoding far beyond photos).
        small = rng.integers(0, 255, (SRC_H // 8, SRC_W // 8, 3),
                             dtype=np.uint8)
        img = Image.fromarray(small).resize((SRC_W, SRC_H),
                                            Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        blobs.append(buf.getvalue())
    return blobs


def main():
    import jax
    import jax.numpy as jnp

    from concurrent.futures import ThreadPoolExecutor

    from icd_tpu.data.pipeline import device_prefetch
    from icd_tpu.decoding.serve import make_int8_captioner
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import init_encoder
    from icd_tpu.native.imageio import decode_resize_jpeg
    from icd_tpu.utils.benchmarking import tunnel_timer

    n_batches = N_BATCHES
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])

    print("synthesizing {} jpegs...".format(BATCH * 4), flush=True)
    blobs = _make_jpegs(BATCH * 4)

    p = BaselineDecoderParams()
    p.vocab_size = VOCAB
    p.embed_size = 512
    p.hidden_size = 512
    key = jax.random.PRNGKey(0)
    ekey, dkey = jax.random.split(key)
    encoder = init_encoder(ekey, 512)
    decoder = init_baseline_decoder(dkey, p)
    # Honest decode length under random weights (see bench.py).
    decoder["linear"]["b"] = (
        decoder["linear"]["b"].at[VOCAB - 2].set(-1e9))

    calib = np.stack([decode_resize_jpeg(b, 224, 224)
                      for b in blobs[:BATCH]])
    captioner = make_int8_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, calib_imgs=jnp.asarray(calib),
        int8_decoder=True)

    salt_base, roundtrip = tunnel_timer(verbose=False)

    # --- Tunnel h2d bandwidth: time transfer+tiny-fetch of the image
    # batch, minus the measured dispatch roundtrip.
    checksum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    np.asarray(checksum(jnp.asarray(calib)))  # compile
    bw_times = []
    for t in range(3):
        salted = calib + np.uint8(t + 1)  # defeat replay/donation reuse
        t0 = time.perf_counter()
        np.asarray(checksum(jnp.asarray(salted)))
        bw_times.append(time.perf_counter() - t0)
    h2d_mb_s = calib.nbytes / 1e6 / max(min(bw_times) - roundtrip, 1e-9)

    # --- Host pipeline alone: decode+resize throughput.
    pool = ThreadPoolExecutor(8)

    def host_batch(i):
        idx = (np.arange(BATCH) + i * 17) % len(blobs)
        imgs = list(pool.map(
            lambda j: decode_resize_jpeg(blobs[j], 224, 224), idx))
        return {"imgs": np.stack(imgs)}

    host_batch(0)  # warm the pool
    t0 = time.perf_counter()
    for i in range(n_batches):
        host_batch(i)
    host_t = time.perf_counter() - t0
    host_rate = BATCH * n_batches / host_t

    # --- Warmup / compile the serving program on real shapes.
    np.asarray(captioner(jnp.asarray(calib)))
    np.asarray(captioner(jnp.asarray(calib)))

    # --- End-to-end: host pipeline -> device_prefetch -> captioner,
    # async dispatch, single fetch barrier at the end.
    def batches():
        for i in range(n_batches):
            yield host_batch(i)

    t0 = time.perf_counter()
    outs = []
    for b in device_prefetch(batches(), size=3):
        outs.append(captioner(b["imgs"]))
    for o in outs:
        np.asarray(o)  # fetch (closes the async pipeline)
    e2e_t = time.perf_counter() - t0 - roundtrip
    e2e_rate = BATCH * n_batches / e2e_t

    # --- Device-only reference: bench.py's methodology (K perturbed
    # batches inside one dispatch; identical repeated dispatches would
    # be served from the tunnel's replay cache and read ~0 ms).
    from icd_tpu.decoding.serve import make_int8_repeat_captioner

    dev_calib = jnp.asarray(calib)  # resident: transfer NOT timed
    repeat = make_int8_repeat_captioner(
        encoder, decoder, start_id=VOCAB - 3, end_id=VOCAB - 2,
        max_len=DECODE_LEN, repeats=10, calib_imgs=dev_calib,
        int8_decoder=True)
    np.asarray(repeat(dev_calib, jnp.int32(salt_base + 50)))
    np.asarray(repeat(dev_calib, jnp.int32(salt_base + 51)))
    dev_times = []
    for t in range(3):
        t0 = time.perf_counter()
        np.asarray(repeat(dev_calib, jnp.int32(salt_base + 52 + t)))
        dev_times.append(time.perf_counter() - t0)
    dev_rate = BATCH / ((min(dev_times) - roundtrip) / 10)

    # Projected e2e with transfers at deployment (PCIe) speed: the
    # tunnel's h2d bandwidth is the artificial cap here; on a real host
    # the binding constraint is min(host pipeline, device).
    proj_rate = min(host_rate, dev_rate)
    tunnel_cap = h2d_mb_s * 1e6 / (calib.nbytes / BATCH)

    mfu = dev_rate * RESNET101_GFLOP / (V5E_INT8_TOPS * 1e3)
    print("tunnel h2d bandwidth: %.1f MB/s (caps image feed at "
          "%.0f images/s)" % (h2d_mb_s, tunnel_cap))
    print("host decode+resize: %.0f images/s (nproc=%d)"
          % (host_rate, os.cpu_count()))
    print("device-only (resident batch): %.0f captions/s" % dev_rate)
    print("end-to-end host-fed via tunnel: %.0f captions/s "
          "(transfer-bound artifact)" % e2e_rate)
    print("projected e2e at PCIe transfer speed: %.0f captions/s "
          "= min(host, device); host-bound at nproc=%d, needs ~%d "
          "cores to saturate the chip"
          % (proj_rate, os.cpu_count(),
             int(np.ceil(dev_rate / host_rate))))
    print("encoder MFU at device rate: %.1f%% of v5e int8 peak "
          "(%.1f GFLOP/image fwd)" % (100.0 * mfu, RESNET101_GFLOP))


if __name__ == "__main__":
    main()
