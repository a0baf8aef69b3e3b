"""Shared test helpers: CLI-default args and small model factories."""

import argparse

import jax

from icd_tpu.models.encoder import _torch_linear_init
from icd_tpu.models.resnet import init_resnet

SMALL_DEPTHS = (1, 1, 1, 1)
SMALL_WIDTHS = (4, 4, 8, 8)
SMALL_DIM = SMALL_WIDTHS[-1] * 4  # final channels of the small backbone


def make_train_args(**overrides):
    """argparse.Namespace with the reference train.py defaults
    (reference: train.py:13-52)."""
    defaults = dict(
        model_name="testmodel",
        model="baseline",
        attention_dim=512,
        decoder_dim=512,
        decoder_dropout=0.5,
        embed_size=512,
        epochs=1,
        batch_size=32,
        workers=1,
        encoder_lr=1e-4,
        decoder_lr=1e-4,
        grad_clip=5.0,
        alpha_c=1.0,
        fine_tune_encoder=False,
        fine_tune_embedding=False,
        checkpoint=None,
        print_freq=1,
        use_glove=False,
        max_caption_length=-1,
        use_bert=False,
    )
    defaults.update(overrides)
    return argparse.Namespace(**defaults)


def small_init_encoder(key, embed_size, dtype=None):
    """Drop-in for init_encoder with a tiny backbone (CPU test speed)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    rkey, lkey = jax.random.split(key)
    return {
        "resnet": init_resnet(rkey, SMALL_DEPTHS, SMALL_WIDTHS, dtype=dtype),
        "embed": _torch_linear_init(lkey, SMALL_DIM, embed_size, dtype),
    }


def small_init_encoder_attention(key, dtype=None):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    return {"resnet": init_resnet(key, SMALL_DEPTHS, SMALL_WIDTHS,
                                  dtype=dtype)}
