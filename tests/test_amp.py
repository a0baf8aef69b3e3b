"""--amp bf16 mixed-precision training (TPU extension; default f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icd_tpu.training.attention as ta
import icd_tpu.training.baseline as tb
from icd_tpu.checkpoint import load_checkpoint

from helpers import (
    make_train_args, small_init_encoder, small_init_encoder_attention)


@pytest.fixture(autouse=True)
def small_backbones(monkeypatch):
    import functools

    import icd_tpu.models.attention as ma

    from helpers import SMALL_DIM

    monkeypatch.setattr(tb, "init_encoder", small_init_encoder)
    monkeypatch.setattr(ta, "init_encoder_attention",
                        small_init_encoder_attention)
    monkeypatch.setattr(
        ta, "init_attention_decoder",
        functools.partial(ma.init_attention_decoder,
                          encoder_dim=SMALL_DIM))


def _all_f32(tree):
    return all(
        jnp.asarray(leaf).dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating))


def test_amp_baseline_trains_and_keeps_f32_state(use_coco_root):
    args = make_train_args(
        model_name="bl_amp", batch_size=4, epochs=1, embed_size=16,
        decoder_dim=12, workers=0, print_freq=100, amp=True)
    tb.train(args)
    chkpt = load_checkpoint(name="bl_amp_0.ckpt")
    losses = chkpt["metrics"]["epoch_losses"][0]
    assert all(np.isfinite(v) for v in losses)
    # Master weights and BN running stats stay f32.
    assert _all_f32(chkpt["encoder"])
    assert _all_f32(chkpt["decoder"])


def test_amp_first_step_loss_matches_f32():
    """The AMP step computes the same loss as the f32 step to bf16
    tolerance (same params, same batch)."""
    import optax

    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import trainable_mask
    from icd_tpu.training.common import partition

    p = BaselineDecoderParams()
    p.vocab_size = 30
    p.embed_size = 16
    p.hidden_size = 12
    encoder = small_init_encoder(jax.random.PRNGKey(0), 16)
    decoder = init_baseline_decoder(jax.random.PRNGKey(1), p)
    mask = {
        "encoder": trainable_mask(encoder, fine_tune=False, head=False),
        "decoder": jax.tree_util.tree_map(lambda _: True, decoder),
    }
    params = {"encoder": encoder, "decoder": decoder}
    trainable, frozen = partition(params, mask)
    tx = optax.adam(1e-4)
    opt_state = tx.init(trainable)

    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(2), (4, 32, 32, 3)) * 255).astype(jnp.uint8))
    captions = jax.random.randint(
        jax.random.PRNGKey(3), (4, 7), 0, p.vocab_size)

    def run(compute_dtype):
        step = jax.jit(tb.make_train_step(
            0, mask, tx, compute_dtype=compute_dtype))
        new_t, new_f, _, loss = step(
            trainable, frozen, opt_state, imgs, captions)
        return float(loss), new_t, new_f

    loss32, t32, _ = run(None)
    loss16, t16, f16 = run(jnp.bfloat16)
    assert abs(loss16 - loss32) / abs(loss32) < 0.05, (loss16, loss32)
    # Updated trainable weights stay f32 under AMP.
    assert _all_f32(t16)
    assert _all_f32(f16)
    # Frozen master weights must come back BIT-IDENTICAL (not
    # bf16-rounded): only BN running stats may change under AMP.
    stem = f16["encoder"]["resnet"]["stem"]
    np.testing.assert_array_equal(
        np.asarray(stem["conv"]),
        np.asarray(encoder["resnet"]["stem"]["conv"]))
    block0 = f16["encoder"]["resnet"]["layers"][0][0]
    orig0 = encoder["resnet"]["layers"][0][0]
    np.testing.assert_array_equal(
        np.asarray(block0["conv2"]), np.asarray(orig0["conv2"]))
    np.testing.assert_array_equal(
        np.asarray(block0["bn1"]["scale"]),
        np.asarray(orig0["bn1"]["scale"]))
    # ... while the running stats did update (train-mode BN).
    assert not np.array_equal(np.asarray(stem["bn"]["mean"]),
                              np.asarray(encoder["resnet"]["stem"]
                                         ["bn"]["mean"]))
    assert stem["bn"]["mean"].dtype == jnp.float32
    # And the update direction is close: compare a leaf's delta sign mix.
    d32 = np.asarray(t32["decoder"]["linear"]["w"] - decoder["linear"]["w"])
    d16 = np.asarray(t16["decoder"]["linear"]["w"] - decoder["linear"]["w"])
    agree = np.mean(np.sign(d32) == np.sign(d16))
    assert agree > 0.9, agree


def test_amp_attention_trains(use_coco_root):
    args = make_train_args(
        model_name="att_amp", model="attention", batch_size=4, epochs=1,
        embed_size=16, decoder_dim=12, attention_dim=8, workers=0,
        print_freq=100, amp=True)
    ta.train(args)
    chkpt = load_checkpoint(name="att_amp_0.ckpt")
    losses = chkpt["metrics"]["epoch_losses"][0]
    assert all(np.isfinite(v) for v in losses)
    assert _all_f32(chkpt["decoder"])


def test_amp_flag_in_cli():
    import train as train_cli

    args = train_cli.build_parser().parse_args(["m", "--model", "baseline"])
    assert args.amp is False
    args = train_cli.build_parser().parse_args(
        ["m", "--model", "baseline", "--amp", "True"])
    assert args.amp is True
