"""Production captioning pipeline: encode + greedy decode, one XLA program.

This is the serving path benchmarked in BASELINE.md (captions/sec/chip,
batch 64): uint8 NHWC images in, token ids out, with the whole
ResNet-101 + LSTM decode fused into a single jitted program running in
bfloat16 on the MXU. Weights are cast once at build time, not per call.
"""

import jax
import jax.numpy as jnp

from ..models.baseline import baseline_decoder_forward  # noqa: F401
from ..models.encoder import encoder_forward
from .greedy import greedy_decode_baseline


def make_captioner(encoder_params, decoder_params, start_id, end_id,
                   max_len=25, compute_dtype=jnp.bfloat16, int8=False):
    """Build a jitted (imgs uint8 NHWC) -> (B, max_len) captioner.

    int8=True runs the backbone convolutions with W8A8 dynamic
    quantization (experimental; ~2x conv throughput on v5e).
    """
    decoder_cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype), decoder_params)
    # Pre-cast once at build time; the in-jit cast then becomes a no-op
    # (saves ~170MB of f32->bf16 conversion per un-batched dispatch).
    encoder_cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype), encoder_params)
    conv = None
    if int8:
        from ..ops.quant import int8_conv

        conv = int8_conv

    @jax.jit
    def caption(imgs):
        feats, _ = encoder_forward(
            encoder_cast, imgs, train=False, compute_dtype=compute_dtype,
            conv=conv)
        return greedy_decode_baseline(
            decoder_cast, feats.astype(compute_dtype), start_id, end_id,
            max_len=max_len)

    return caption


def make_attention_captioner(encoder_params, decoder_params, start_id,
                             end_id, max_len=25,
                             compute_dtype=jnp.bfloat16):
    """Jitted (imgs uint8 NHWC) -> (tokens (B, max_len), alphas) for the
    soft-attention model."""
    from ..models.encoder import encoder_attention_forward
    from .greedy_attention import greedy_decode_attention

    decoder_cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype), decoder_params)
    encoder_cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype), encoder_params)

    @jax.jit
    def caption(imgs):
        grid, _ = encoder_attention_forward(
            encoder_cast, imgs, train=False, compute_dtype=compute_dtype)
        return greedy_decode_attention(
            decoder_cast, grid.astype(compute_dtype), start_id, end_id,
            max_len=max_len)

    return caption


def make_repeat_captioner(encoder_params, decoder_params, start_id, end_id,
                          max_len=25, compute_dtype=jnp.bfloat16, repeats=10):
    """Captioner that processes `repeats` perturbed copies of the batch
    inside one XLA program and returns a token checksum.

    Used for throughput measurement on links where per-dispatch latency
    would otherwise dominate (the dev tunnel here adds ~30-60 ms per
    call; real TPU deployments pay ~10 us).
    """
    decoder_cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype), decoder_params)
    encoder_cast = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype), encoder_params)

    @jax.jit
    def caption_many(imgs, salt):
        def body(i, acc):
            feats, _ = encoder_forward(
                encoder_cast, imgs + (i + salt).astype(jnp.uint8),
                train=False, compute_dtype=compute_dtype)
            toks = greedy_decode_baseline(
                decoder_cast, feats.astype(compute_dtype), start_id,
                end_id, max_len=max_len)
            return acc + jnp.sum(toks)
        return jax.lax.fori_loop(0, repeats, body, jnp.int32(0))

    return caption_many
