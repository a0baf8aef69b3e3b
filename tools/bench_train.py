"""Training-step throughput: f32 (reference numerics) vs --amp bf16.

Same tunnel-safe methodology as bench.py: K steps inside one jitted
fori_loop with perturbed images, min-of-N roundtrip subtraction, fetch
to host. Run: python tools/bench_train.py [--attention]

Each row also reports MFU = speed-of-light time / measured time, with
model FLOPs counted analytically (frozen ResNet-101 forward at 15.6
GF/image — it has no backward, training.common.partition removes it
from autodiff — plus decoder forward x3 for fwd+bwd) against
per-component v5e peaks: the encoder at the int8 peak when the config
runs the W8A8 backbone, everything else at the bf16 peak (v5e has no
faster f32 MXU path, so the f32 row's MFU is honestly low).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
CAP_LEN = 25
VOCAB = 10000
REPEATS = 10
TRIALS = 3

RESNET101_GFLOP = 15.6  # fwd per image at 224x224 (bench.py)
V5E_INT8_GFLOPS = 394.0e3
V5E_BF16_GFLOPS = 197.0e3
ENC_DIM, P_PIX = 2048, 196


def decoder_train_gflops(attention, e=512, h=512, a=512, v=VOCAB,
                         b=BATCH, t=CAP_LEN):
    """Model GFLOPs of one decoder fwd+bwd (3x fwd; matmuls only —
    elementwise/softmax/embedding-gather are noise at these shapes).

    Baseline (icd_tpu/models/baseline.py): feature as timestep 0, so
    the LSTM runs t steps over (e+h)->4h gates, then fc h->v per step.
    Attention (icd_tpu/models/attention.py): hoisted encoder
    projection, then per decode step (t-1 of them) the dec_att/score/
    context/gate chain over P_PIX pixels + the (e+2048+h)->4h LSTM,
    then the batched fc.
    """
    if not attention:
        fwd = (2 * b * ENC_DIM * e                 # encoder head
               + 2 * b * t * (e + h) * 4 * h       # LSTM gates
               + 2 * b * t * h * v)                # vocab projection
    else:
        td = t - 1                                 # decode steps
        fwd = (2 * b * P_PIX * ENC_DIM * a         # enc_att (hoisted)
               + 2 * 2 * b * ENC_DIM * h           # init h, c
               + td * (2 * b * h * a               # dec_att
                       + 2 * b * P_PIX * a         # score
                       + 2 * b * P_PIX * ENC_DIM   # context
                       + 2 * b * h * ENC_DIM       # f_beta gate
                       + 2 * b * (e + ENC_DIM + h) * 4 * h)  # LSTM
               + 2 * b * td * h * v)               # vocab projection
    return 3.0 * fwd / 1e9


def train_step_mfu(step_seconds, attention, int8_encoder):
    """Speed-of-light time over measured time, per-component peaks."""
    enc_gf = BATCH * RESNET101_GFLOP
    dec_gf = decoder_train_gflops(attention)
    enc_peak = V5E_INT8_GFLOPS if int8_encoder else V5E_BF16_GFLOPS
    light = enc_gf / enc_peak + dec_gf / V5E_BF16_GFLOPS
    return light / step_seconds


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import icd_tpu.training.attention as ta
    import icd_tpu.training.baseline as tb
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import (
        init_encoder, init_encoder_attention, trainable_mask)
    from icd_tpu.training.common import partition

    attention = "--attention" in sys.argv
    if attention:
        from icd_tpu.models.attention import (
            AttentionDecoderParams, init_attention_decoder)

        ap = AttentionDecoderParams()
        ap.vocab = list(range(VOCAB))
        encoder = init_encoder_attention(jax.random.PRNGKey(0))
        decoder = init_attention_decoder(jax.random.PRNGKey(1), ap)
    else:
        p = BaselineDecoderParams()
        p.vocab_size = VOCAB
        p.embed_size = 512
        p.hidden_size = 512
        encoder = init_encoder(jax.random.PRNGKey(0), 512)
        decoder = init_baseline_decoder(jax.random.PRNGKey(1), p)
    mask = {
        "encoder": trainable_mask(encoder, fine_tune=False, head=False),
        "decoder": jax.tree_util.tree_map(lambda _: True, decoder),
    }
    trainable, frozen = partition(
        {"encoder": encoder, "decoder": decoder}, mask)
    tx = optax.adam(1e-4)
    opt_state = tx.init(trainable)

    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(2), (BATCH, 224, 224, 3)) * 255).astype(
        jnp.uint8))
    captions = jax.random.randint(
        jax.random.PRNGKey(3), (BATCH, CAP_LEN), 0, VOCAB)
    decode_lengths = jnp.full((BATCH,), CAP_LEN - 1, jnp.int32)

    from icd_tpu.utils.benchmarking import tunnel_timer
    salt_base, roundtrip = tunnel_timer()

    from icd_tpu.models.resnet_int8 import (calibrate_act_maxes,
                                            quantize_resnet)
    qresnet = quantize_resnet(
        encoder["resnet"],
        calibrate_act_maxes(encoder["resnet"], imgs, jnp.bfloat16))

    for label, dtype, qr in (("f32", None, None),
                             ("amp-bf16", jnp.bfloat16, None),
                             ("amp+int8enc", jnp.bfloat16, qresnet)):
        if attention:
            att_step = ta.make_train_step(
                mask, tx, alpha_c=1.0, dropout_rate=0.5,
                compute_dtype=dtype, qresnet=qr)
            rng = jax.random.PRNGKey(7)

            def step(t, f, o, im, cap):
                return att_step(t, f, o, rng, im, cap, decode_lengths)
        else:
            step = tb.make_train_step(0, mask, tx, compute_dtype=dtype,
                                      qresnet=qr)

        @jax.jit
        def run(trainable, frozen, opt_state, salt):
            def body(i, carry):
                t, f, o, acc = carry
                t, f, o, loss = step(
                    t, f, o, imgs + (i + salt).astype(jnp.uint8), captions)
                return t, f, o, acc + loss
            return jax.lax.fori_loop(
                0, REPEATS, body,
                (trainable, frozen, opt_state, jnp.float32(0)))[3]

        np.asarray(run(trainable, frozen, opt_state,
                       jnp.int32(salt_base + 10)))
        np.asarray(run(trainable, frozen, opt_state,
                       jnp.int32(salt_base + 11)))
        times = []
        for t in range(TRIALS):
            t0 = time.perf_counter()
            np.asarray(run(trainable, frozen, opt_state,
                           jnp.int32(salt_base + 12 + t)))
            times.append(time.perf_counter() - t0)
        stept = (min(times) - roundtrip) / REPEATS
        mfu = train_step_mfu(stept, attention, int8_encoder=qr is not None)
        print("%s: %.3f ms/step -> %.0f captions/s, MFU %.2f" %
              (label, stept * 1e3, BATCH / stept, mfu), flush=True)


if __name__ == "__main__":
    main()
