"""CNN encoder heads over the ResNet-101 backbone.

Two heads, mirroring the reference capability surface:
 - ``encoder_forward``: global-pooled features -> Linear(2048, embed_size)
   giving (B, embed_size) for the baseline LSTM decoder (reference:
   models/encoder.py:22-58)
 - ``encoder_attention_forward``: spatial grid adaptively pooled to
   14x14x2048 for the soft-attention decoder (reference:
   models/encoder.py:72-110; NHWC needs no permute)

The backbone is frozen by default; ``trainable_mask`` reproduces
``fine_tune(on)`` (reference: models/encoder.py:60-69 unfreezes conv
blocks 5+, i.e. stages 2-4) as a boolean pytree consumed by the
optimizer partition.
"""

import math

import jax
import jax.numpy as jnp

from ..ops.image import normalize_imagenet
from .resnet import (
    global_avg_pool, adaptive_avg_pool2d, init_resnet101, resnet_forward)

ENCODER_DIM = 2048
ATTENTION_GRID = (14, 14)


def _torch_linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_encoder(key, embed_size, dtype=jnp.float32):
    rkey, lkey = jax.random.split(key)
    return {
        "resnet": init_resnet101(rkey, dtype),
        "embed": _torch_linear_init(lkey, ENCODER_DIM, embed_size, dtype),
    }


def init_encoder_attention(key, dtype=jnp.float32):
    return {"resnet": init_resnet101(key, dtype)}


def encoder_forward(params, imgs, train=False, compute_dtype=None,
                    conv=None):
    """(B, H, W, 3) uint8/float -> ((B, embed_size), new_params)."""
    x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
    feats, new_resnet = resnet_forward(
        params["resnet"], x, train=train, compute_dtype=compute_dtype,
        conv=conv)
    pooled = global_avg_pool(feats)
    embed = params["embed"]
    out = pooled.astype(embed["w"].dtype) @ embed["w"] + embed["b"]
    return out, dict(params, resnet=new_resnet)


def encoder_attention_forward(params, imgs, train=False, compute_dtype=None,
                              grid=ATTENTION_GRID, conv=None):
    """(B, H, W, 3) uint8/float -> ((B, gh, gw, 2048), new_params)."""
    x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
    feats, new_resnet = resnet_forward(
        params["resnet"], x, train=train, compute_dtype=compute_dtype,
        conv=conv)
    feats = adaptive_avg_pool2d(feats, grid)
    return feats, dict(params, resnet=new_resnet)


def encoder_forward_int8(params, qresnet, imgs,
                         compute_dtype=jnp.bfloat16):
    """encoder_forward over a static-int8 backbone (training fast path
    for the FROZEN encoder; --int8_encoder).

    No gradient flows through the backbone when it is frozen, so the
    quantized forward only perturbs the features the decoder sees.
    BN running stats do NOT update (they are folded into the dequant
    affine) — a deliberate divergence from the reference's train-mode
    BN, documented at the flag.
    """
    from .resnet_int8 import resnet_int8_forward

    x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
    feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                out_dtype=compute_dtype)
    pooled = global_avg_pool(feats)
    embed = params["embed"]
    return pooled.astype(embed["w"].dtype) @ embed["w"] + embed["b"]


def encoder_attention_forward_int8(qresnet, imgs,
                                   compute_dtype=jnp.bfloat16,
                                   grid=ATTENTION_GRID):
    """encoder_attention_forward over a static-int8 backbone (see
    encoder_forward_int8)."""
    from .resnet_int8 import resnet_int8_forward

    x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
    feats = resnet_int8_forward(qresnet, x.astype(compute_dtype),
                                out_dtype=compute_dtype)
    return adaptive_avg_pool2d(feats, grid)


def trainable_mask(params, fine_tune=False, head=True):
    """Boolean pytree: which encoder params receive gradients.

    The resnet backbone is frozen (reference: encoder.py:42-43).
    ``head`` marks the baseline embed Linear trainable — note the
    reference only ever *optimizes* it when --fine_tune_encoder is set
    (baseline.py:158-163), so drivers pass head=args.fine_tune_encoder.
    ``fine_tune=True`` additionally unfreezes resnet stages 2-4
    (children[5:], reference: encoder.py:60-69). BN running stats are
    never 'trainable' (they update via forward).
    """

    def false_like(tree):
        return jax.tree_util.tree_map(lambda _: False, tree)

    def true_like(tree):
        return jax.tree_util.tree_map(lambda _: True, tree)

    def bn_mask(bn, scale_bias_on):
        return {"scale": scale_bias_on, "bias": scale_bias_on,
                "mean": False, "var": False}

    def block_mask(block, on):
        m = {}
        for k, v in block.items():
            if k.startswith("bn"):
                m[k] = bn_mask(v, on)
            elif k == "downsample":
                m[k] = {"conv": on, "bn": bn_mask(v["bn"], on)}
            else:
                m[k] = on
        return m

    resnet = params["resnet"]
    mask = {
        "stem": {"conv": False, "bn": bn_mask(resnet["stem"]["bn"], False)},
        "layers": [
            [block_mask(b, fine_tune and stage >= 1) for b in blocks]
            for stage, blocks in enumerate(resnet["layers"])
        ],
    }
    out = {"resnet": mask}
    if "embed" in params:
        out["embed"] = (true_like(params["embed"]) if head
                        else false_like(params["embed"]))
    for k in params:
        if k not in out:
            out[k] = false_like(params[k])
    return out
