"""--int8_encoder: static-int8 frozen-encoder training (TPU extension).

The backbone is frozen in every published config, so running its
forward through the calibrated int8 trunk only perturbs the features
the decoder sees; BN running stats deliberately do not update
(models/encoder.py encoder_forward_int8).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icd_tpu.training.attention as ta
import icd_tpu.training.baseline as tb
from icd_tpu.checkpoint import load_checkpoint

from helpers import (
    SMALL_DIM, make_train_args, small_init_encoder,
    small_init_encoder_attention)


@pytest.fixture(autouse=True)
def small_backbones(monkeypatch):
    import icd_tpu.models.attention as ma

    monkeypatch.setattr(tb, "init_encoder", small_init_encoder)
    monkeypatch.setattr(ta, "init_encoder_attention",
                        small_init_encoder_attention)
    monkeypatch.setattr(
        ta, "init_attention_decoder",
        functools.partial(ma.init_attention_decoder,
                          encoder_dim=SMALL_DIM))


def test_int8_encoder_baseline_trains(use_coco_root):
    args = make_train_args(
        model_name="bl_i8e", batch_size=4, epochs=1, embed_size=16,
        decoder_dim=12, workers=0, print_freq=100, amp=True,
        int8_encoder=True)
    tb.train(args)
    chkpt = load_checkpoint(name="bl_i8e_0.ckpt")
    losses = chkpt["metrics"]["epoch_losses"][0]
    assert all(np.isfinite(v) for v in losses)


def test_int8_encoder_attention_trains(use_coco_root):
    args = make_train_args(
        model="attention", model_name="att_i8e", batch_size=4, epochs=1,
        embed_size=16, decoder_dim=12, attention_dim=12, workers=0,
        print_freq=100, amp=True, int8_encoder=True)
    ta.train(args)
    chkpt = load_checkpoint(name="att_i8e_0.ckpt")
    losses = chkpt["metrics"]["epoch_losses"][0]
    assert all(np.isfinite(v) for v in losses)


def test_int8_encoder_step_loss_close_to_f32():
    """One int8-encoder step computes a loss close to the f32 step's
    (same params, same batch) — int8 features, not broken math."""
    import optax

    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import trainable_mask
    from icd_tpu.models.resnet_int8 import (calibrate_act_maxes,
                                            quantize_resnet)
    from icd_tpu.training.common import partition

    p = BaselineDecoderParams()
    p.vocab_size = 40
    p.embed_size = 16
    p.hidden_size = 12
    key = jax.random.PRNGKey(0)
    encoder = small_init_encoder(key, 16)
    decoder = init_baseline_decoder(jax.random.PRNGKey(1), p)
    mask = {
        "encoder": trainable_mask(encoder, fine_tune=False, head=False),
        "decoder": jax.tree_util.tree_map(lambda _: True, decoder),
    }
    trainable, frozen = partition(
        {"encoder": encoder, "decoder": decoder}, mask)
    tx = optax.adam(1e-4)
    opt_state = tx.init(trainable)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), np.uint8))
    caps = jnp.asarray(rng.integers(1, 40, (4, 6), np.int32))

    f32_step = jax.jit(tb.make_train_step(0, mask, tx))
    _, _, _, loss_ref = f32_step(trainable, frozen, opt_state, imgs,
                                 caps)

    qresnet = quantize_resnet(
        encoder["resnet"],
        calibrate_act_maxes(encoder["resnet"], imgs, jnp.float32))
    i8_step = jax.jit(tb.make_train_step(0, mask, tx, qresnet=qresnet))
    _, frozen_after, _, loss_i8 = i8_step(trainable, frozen, opt_state,
                                          imgs, caps)
    rel = abs(float(loss_i8) - float(loss_ref)) / abs(float(loss_ref))
    assert rel < 0.05, (float(loss_i8), float(loss_ref))
    # BN running stats must NOT move in int8-encoder mode.
    for a, b in zip(jax.tree_util.tree_leaves(frozen["encoder"]),
                    jax.tree_util.tree_leaves(frozen_after["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
