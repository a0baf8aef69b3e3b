"""Training-step throughput: f32 (reference numerics) vs --amp bf16.

Same tunnel-safe methodology as bench.py: K steps inside one jitted
fori_loop with perturbed images, min-of-N roundtrip subtraction, fetch
to host. Run: python tools/bench_train.py [--attention]
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
        print("%s: %.3f ms/step -> %.0f captions/s" %
              (label, stept * 1e3, BATCH / stept), flush=True)


if __name__ == "__main__":
    main()
