"""Production captioning pipeline: encode + greedy decode, one XLA program.

This is the serving path benchmarked in BASELINE.md (captions/sec/chip,
batch 64): uint8 NHWC images in, token ids out, with the whole
ResNet-101 + LSTM decode fused into a single jitted program running in
bfloat16 on the MXU. Weights are cast once at build time, not per call.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..models.baseline import baseline_decoder_forward  # noqa: F401
from ..models.encoder import encoder_forward
from .greedy import greedy_decode_baseline


def _cast_tree(tree, dtype):
    """Build-time param cast to DEVICE arrays.

    jnp.asarray, not .astype: checkpoint-loaded params are host numpy
    arrays, and numpy's fancy indexing (embedding[tok] in the decode
    loops) rejects tracers — the cast must also move to device.
    """
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)


def _baseline_decode_fn(decoder_params, start_id, end_id, max_len,
                        compute_dtype, int8_decoder):
    """feats -> tokens closure for the baseline decoders (shared by the
    single-chip and repeat int8 captioners)."""
    if int8_decoder:
        from .greedy import (greedy_decode_baseline_int8,
                             quantize_baseline_decoder)

        # Quantize from the full-precision weights (not the bf16 cast);
        # the embedding gather stays compute_dtype.
        qdec = quantize_baseline_decoder(decoder_params)
        qdec["embedding"] = jnp.asarray(qdec["embedding"], compute_dtype)

        def decode(feats):
            return greedy_decode_baseline_int8(
                qdec, feats, start_id, end_id, max_len=max_len)
    else:
        decoder_cast = _cast_tree(decoder_params, compute_dtype)

        def decode(feats):
            return greedy_decode_baseline(
                decoder_cast, feats, start_id, end_id, max_len=max_len)

    return decode



def make_captioner(encoder_params, decoder_params, start_id, end_id,
                   max_len=25, compute_dtype=jnp.bfloat16, int8=False):
    """Build a jitted (imgs uint8 NHWC) -> (B, max_len) captioner.

    int8=True runs the backbone convolutions with W8A8 dynamic
    quantization (experimental; ~2x conv throughput on v5e).
    """
    decoder_cast = _cast_tree(decoder_params, compute_dtype)
    # Pre-cast once at build time; the in-jit cast then becomes a no-op
    # (saves ~170MB of f32->bf16 conversion per un-batched dispatch).
    encoder_cast = _cast_tree(encoder_params, compute_dtype)
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


def _build_int8_backbone(encoder_params, compute_dtype, calib_imgs=None,
                         act_maxes=None):
    """Calibrate (if needed) + quantize the backbone; returns
    (qresnet, act_maxes)."""
    from ..models.resnet_int8 import calibrate_act_maxes, quantize_resnet

    if act_maxes is None:
        if calib_imgs is None:
            raise ValueError(
                "int8 serving needs calib_imgs (batches of images) or "
                "precomputed act_maxes")
        act_maxes = calibrate_act_maxes(
            encoder_params["resnet"], calib_imgs, compute_dtype)
    return quantize_resnet(encoder_params["resnet"], act_maxes), act_maxes


def make_int8_captioner(encoder_params, decoder_params, start_id, end_id,
                        max_len=25, compute_dtype=jnp.bfloat16,
                        calib_imgs=None, act_maxes=None,
                        int8_decoder=False):
    """Static-calibration W8A8 captioner: int8 backbone (2x MXU), bf16
    head + decode. Pass a few representative image batches as
    ``calib_imgs`` (or reuse saved ``act_maxes``); see
    models/resnet_int8.py for the recipe.

    int8_decoder=True additionally stores the LSTM gate weights and the
    vocab projection as per-channel int8 (dynamic per-row activation
    scales, ops/qlinear.py) — halves the decode loop's weight HBM
    traffic; near-tie argmax tokens can flip vs the float decode."""
    from ..models.resnet_int8 import resnet_int8_forward
    from ..ops.image import normalize_imagenet

    qresnet, act_maxes = _build_int8_backbone(
        encoder_params, compute_dtype, calib_imgs, act_maxes)
    embed = _cast_tree(encoder_params["embed"], compute_dtype)
    decode = _baseline_decode_fn(decoder_params, start_id, end_id,
                                 max_len, compute_dtype, int8_decoder)

    @jax.jit
    def caption(imgs):
        x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
        feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                    out_dtype=compute_dtype)
        pooled = jnp.mean(feats, axis=(1, 2))
        emb = pooled.astype(embed["w"].dtype) @ embed["w"] + embed["b"]
        return decode(emb)

    caption.act_maxes = act_maxes
    return caption


def make_attention_captioner(encoder_params, decoder_params, start_id,
                             end_id, max_len=25,
                             compute_dtype=jnp.bfloat16):
    """Jitted (imgs uint8 NHWC) -> (tokens (B, max_len), alphas) for the
    soft-attention model."""
    from ..models.encoder import encoder_attention_forward
    from .greedy_attention import greedy_decode_attention

    decoder_cast = _cast_tree(decoder_params, compute_dtype)
    encoder_cast = _cast_tree(encoder_params, compute_dtype)

    @jax.jit
    def caption(imgs):
        grid, _ = encoder_attention_forward(
            encoder_cast, imgs, train=False, compute_dtype=compute_dtype)
        return greedy_decode_attention(
            decoder_cast, grid.astype(compute_dtype), start_id, end_id,
            max_len=max_len)

    return caption


def make_int8_attention_captioner(encoder_params, decoder_params, start_id,
                                  end_id, max_len=25,
                                  compute_dtype=jnp.bfloat16,
                                  calib_imgs=None, act_maxes=None,
                                  int8_decoder=False):
    """Static-int8 backbone + soft-attention decode.

    The attention encoder has no Linear head (encoder_attention_forward
    is backbone + 14x14 adaptive pool), so the quantized tree is built
    from encoder_params['resnet'] alone. int8_decoder=True additionally
    quantizes the decode loop's LSTM gates and vocab projection
    (ops/qlinear.py); attention/gate projections stay float.
    """
    from ..models.resnet import adaptive_avg_pool2d
    from ..models.resnet_int8 import resnet_int8_forward
    from ..ops.image import normalize_imagenet
    from .greedy_attention import greedy_decode_attention
    from ..models.encoder import ATTENTION_GRID

    qresnet, act_maxes = _build_int8_backbone(
        encoder_params, compute_dtype, calib_imgs, act_maxes)
    if int8_decoder:
        from .greedy_attention import (greedy_decode_attention_int8,
                                       quantize_attention_decoder)

        qdec = quantize_attention_decoder(decoder_params)
        # Drop the float twins of the quantized weights (LSTM gates +
        # vocab projection, the two largest tensors) so they don't sit
        # dead in HBM next to their int8 copies.
        decoder_cast = _cast_tree(
            {k: v for k, v in decoder_params.items()
             if k not in ("lstm", "fc")}, compute_dtype)

        def decode(grid):
            return greedy_decode_attention_int8(
                decoder_cast, qdec, grid, start_id, end_id,
                max_len=max_len)
    else:
        decoder_cast = _cast_tree(decoder_params, compute_dtype)

        def decode(grid):
            return greedy_decode_attention(
                decoder_cast, grid, start_id, end_id, max_len=max_len)

    @jax.jit
    def caption(imgs):
        x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
        feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                    out_dtype=compute_dtype)
        grid = adaptive_avg_pool2d(feats, ATTENTION_GRID)
        return decode(grid)

    caption.act_maxes = act_maxes
    return caption


def make_repeat_captioner(encoder_params, decoder_params, start_id, end_id,
                          max_len=25, compute_dtype=jnp.bfloat16, repeats=10):
    """Captioner that processes `repeats` perturbed copies of the batch
    inside one XLA program and returns a token checksum.

    Used for throughput measurement on links where per-dispatch latency
    would otherwise dominate (the dev tunnel here adds ~30-60 ms per
    call; real TPU deployments pay ~10 us).
    """
    decoder_cast = _cast_tree(decoder_params, compute_dtype)
    encoder_cast = _cast_tree(encoder_params, compute_dtype)

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


def make_int8_repeat_captioner(encoder_params, decoder_params, start_id,
                               end_id, max_len=25,
                               compute_dtype=jnp.bfloat16, repeats=10,
                               calib_imgs=None, act_maxes=None,
                               int8_decoder=False):
    """make_repeat_captioner over the static-int8 backbone (see
    make_int8_captioner); used by bench tooling on high-latency links."""
    from ..models.resnet_int8 import resnet_int8_forward
    from ..ops.image import normalize_imagenet

    qresnet, act_maxes = _build_int8_backbone(
        encoder_params, compute_dtype, calib_imgs, act_maxes)
    embed = _cast_tree(encoder_params["embed"], compute_dtype)
    decode = _baseline_decode_fn(decoder_params, start_id, end_id,
                                 max_len, compute_dtype, int8_decoder)

    @jax.jit
    def caption_many(imgs, salt):
        def body(i, acc):
            x = normalize_imagenet(imgs + (i + salt).astype(jnp.uint8))
            feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                        out_dtype=compute_dtype)
            pooled = jnp.mean(feats, axis=(1, 2))
            emb = pooled.astype(embed["w"].dtype) @ embed["w"] + embed["b"]
            return acc + jnp.sum(decode(emb))
        return jax.lax.fori_loop(0, repeats, body, jnp.int32(0))

    caption_many.act_maxes = act_maxes
    return caption_many


def make_sharded_captioner(encoder_params, decoder_params, start_id,
                           end_id, mesh, max_len=25,
                           compute_dtype=jnp.bfloat16, int8=False,
                           calib_imgs=None, act_maxes=None,
                           int8_decoder=False):
    """Multi-chip serving: SPMD data parallelism over ``mesh``'s 'data'
    axis (the reference's capability ceiling is one device, SURVEY §2c;
    this is the TPU-native scale-out).

    Params replicate across the mesh; the image batch and the token
    output shard on axis 0. Per decode step the only collective is the
    scalar all-reduce XLA inserts for the early-exit ``all(finished)``
    while-condition — everything else is embarrassingly parallel, so
    throughput scales with the 'data' axis. Batch must divide it.

    int8=True uses the static-calibration W8A8 backbone (pass
    calib_imgs or saved act_maxes, as in make_int8_captioner);
    int8_decoder=True additionally quantizes the decode-loop weights
    (ops/qlinear.py).
    """
    from ..parallel.mesh import batch_sharding, replicated

    if int8:
        from ..models.resnet_int8 import resnet_int8_forward
        from ..ops.image import normalize_imagenet

        qresnet, act_maxes = _build_int8_backbone(
            encoder_params, compute_dtype, calib_imgs, act_maxes)
        qresnet = jax.device_put(qresnet, replicated(mesh))
        embed = jax.device_put(
            _cast_tree(encoder_params["embed"], compute_dtype),
            replicated(mesh))

        def fwd(imgs):
            x = normalize_imagenet(imgs)
            feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                        out_dtype=compute_dtype)
            pooled = jnp.mean(feats, axis=(1, 2))
            return (pooled.astype(embed["w"].dtype) @ embed["w"]
                    + embed["b"])
    else:
        encoder_cast = jax.device_put(
            _cast_tree(encoder_params, compute_dtype), replicated(mesh))

        def fwd(imgs):
            feats, _ = encoder_forward(encoder_cast, imgs, train=False,
                                       compute_dtype=compute_dtype)
            return feats.astype(compute_dtype)

    # Decoder weights are jit closure constants; XLA replicates them
    # over the mesh at compile time.
    decode = _baseline_decode_fn(decoder_params, start_id, end_id,
                                 max_len, compute_dtype, int8_decoder)

    @partial(jax.jit,
             in_shardings=batch_sharding(mesh, 4),
             out_shardings=batch_sharding(mesh, 2))
    def caption(imgs):
        return decode(fwd(imgs))

    caption.act_maxes = act_maxes
    return caption


def _replicated_attention_fwd(encoder_params, mesh, compute_dtype, int8,
                              calib_imgs, act_maxes):
    """(fwd imgs->grid, act_maxes) with params replicated over mesh."""
    from ..parallel.mesh import replicated

    if int8:
        from ..models.encoder import ATTENTION_GRID
        from ..models.resnet import adaptive_avg_pool2d
        from ..models.resnet_int8 import resnet_int8_forward
        from ..ops.image import normalize_imagenet

        qresnet, act_maxes = _build_int8_backbone(
            encoder_params, compute_dtype, calib_imgs, act_maxes)
        qresnet = jax.device_put(qresnet, replicated(mesh))

        def fwd(imgs):
            x = normalize_imagenet(imgs)
            feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                        out_dtype=compute_dtype)
            return adaptive_avg_pool2d(feats, ATTENTION_GRID)
    else:
        from ..models.encoder import encoder_attention_forward

        encoder_cast = jax.device_put(
            _cast_tree(encoder_params, compute_dtype), replicated(mesh))

        def fwd(imgs):
            grid, _ = encoder_attention_forward(
                encoder_cast, imgs, train=False,
                compute_dtype=compute_dtype)
            return grid.astype(compute_dtype)

    return fwd, act_maxes


def make_sharded_attention_captioner(encoder_params, decoder_params,
                                     start_id, end_id, mesh, max_len=25,
                                     compute_dtype=jnp.bfloat16,
                                     int8=False, calib_imgs=None,
                                     act_maxes=None):
    """make_sharded_captioner for the soft-attention model: DP over
    'data', params replicated, (tokens, alphas) both batch-sharded."""
    from ..parallel.mesh import batch_sharding, replicated
    from .greedy_attention import greedy_decode_attention

    decoder_cast = jax.device_put(
        _cast_tree(decoder_params, compute_dtype), replicated(mesh))
    fwd, act_maxes = _replicated_attention_fwd(
        encoder_params, mesh, compute_dtype, int8, calib_imgs, act_maxes)

    @partial(jax.jit,
             in_shardings=batch_sharding(mesh, 4),
             out_shardings=(batch_sharding(mesh, 2),
                            batch_sharding(mesh, 3)))
    def caption(imgs):
        return greedy_decode_attention(decoder_cast, fwd(imgs),
                                       start_id, end_id, max_len=max_len)

    caption.act_maxes = act_maxes
    return caption


def make_sharded_beam_captioner(encoder_params, decoder_params, start_id,
                                end_id, mesh, beam_size=5,
                                compute_dtype=jnp.bfloat16, int8=False,
                                calib_imgs=None, act_maxes=None):
    """Multi-chip beam-search captioning (the beam_eval serving path
    scaled over the 'data' axis).

    Per-image beam search is embarrassingly parallel across the batch
    (beam.py vmaps an independent while_loop per image), so DP sharding
    is the natural layout; XLA's only cross-chip work is the vmapped
    while-condition reduction. Returns the beam_search_batched dict with
    every leaf batch-sharded on axis 0.
    """
    from ..parallel.mesh import batch_sharding, replicated
    from .beam import beam_search_batched

    decoder_cast = jax.device_put(
        _cast_tree(decoder_params, compute_dtype), replicated(mesh))
    fwd, act_maxes = _replicated_attention_fwd(
        encoder_params, mesh, compute_dtype, int8, calib_imgs, act_maxes)

    @partial(jax.jit, in_shardings=batch_sharding(mesh, 4))
    def caption(imgs):
        out = beam_search_batched(decoder_cast, fwd(imgs), beam_size,
                                  start_id, end_id)
        return jax.lax.with_sharding_constraint(
            out, jax.tree_util.tree_map(
                lambda x: batch_sharding(mesh, x.ndim), out))

    caption.act_maxes = act_maxes
    return caption
