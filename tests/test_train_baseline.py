"""End-to-end baseline training/eval on the 8-device virtual mesh."""

import os

import numpy as np
import pytest

import icd_tpu.training.baseline as tb
from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint

from helpers import make_train_args, small_init_encoder


@pytest.fixture(autouse=True)
def small_backbone(monkeypatch):
    monkeypatch.setattr(tb, "init_encoder", small_init_encoder)


def test_train_one_epoch_and_resume(use_coco_root, capsys):
    args = make_train_args(
        model_name="bl_t", batch_size=4, epochs=1, embed_size=16,
        decoder_dim=12, workers=0)
    tb.train(args)

    out = capsys.readouterr().out
    assert "Epoch 1/1, Batch 1/2, Loss " in out
    assert "finished training for 1 epochs" in out

    path = os.path.join(use_coco_root, "checkpoints", "bl_t_0.ckpt")
    assert os.path.exists(path)
    chkpt = load_checkpoint(name="bl_t_0.ckpt")
    epoch, enc, dec, enc_opt, dec_opt, metrics = unpack_checkpoint(chkpt)
    assert epoch == 0
    assert enc_opt is None  # not fine-tuning -> no encoder optimizer
    assert len(metrics["epoch_losses"]) == 1
    assert len(metrics["epoch_losses"][0]) == 2  # 8 captions / batch 4
    assert all(np.isfinite(v) for v in metrics["epoch_losses"][0])

    # Resume for a second epoch.
    args2 = make_train_args(
        model_name="bl_t", batch_size=4, epochs=2, embed_size=16,
        decoder_dim=12, workers=0, checkpoint="bl_t_0.ckpt")
    tb.train(args2)
    chkpt2 = load_checkpoint(name="bl_t_1.ckpt")
    assert chkpt2["epoch"] == 1
    assert len(chkpt2["metrics"]["epoch_losses"]) == 2


def test_partial_final_batch(use_coco_root):
    """The trailing partial batch trains (reference torch DataLoader
    default); 8 captions at batch 3 -> 3 batches, last of size 2
    (indivisible by the data mesh -> replicated fallback)."""
    args = make_train_args(
        model_name="bl_partial", batch_size=3, epochs=1, embed_size=16,
        decoder_dim=12, workers=0, print_freq=100)
    tb.train(args)
    chkpt = load_checkpoint(name="bl_partial_0.ckpt")
    losses = chkpt["metrics"]["epoch_losses"][0]
    assert len(losses) == 3
    assert all(np.isfinite(v) for v in losses)


def test_loss_decreases_on_overfit(use_coco_root):
    """Sanity: repeated epochs on the tiny fixture reduce loss."""
    args = make_train_args(
        model_name="bl_overfit", batch_size=8, epochs=60, embed_size=16,
        decoder_dim=24, decoder_lr=1e-2, workers=0, print_freq=100,
        fine_tune_embedding=True)
    tb.train(args)
    chkpt = load_checkpoint(name="bl_overfit_59.ckpt")
    losses = chkpt["metrics"]["epoch_losses"]
    first = np.mean(losses[0])
    last = np.mean(losses[-1])
    assert last < first * 0.7, (first, last)


def test_fine_tune_encoder_updates_head(use_coco_root):
    """--fine_tune_encoder optimizes the embed Linear (and only then,
    reference baseline.py:158-163); BN stats update regardless."""
    import jax

    args = make_train_args(
        model_name="bl_ft", batch_size=8, epochs=1, embed_size=16,
        decoder_dim=12, workers=0, print_freq=100,
        fine_tune_encoder=True)
    params = tb.train(args)
    chkpt_head = np.asarray(params["encoder"]["embed"]["w"])

    args2 = make_train_args(
        model_name="bl_noft", batch_size=8, epochs=1, embed_size=16,
        decoder_dim=12, workers=0, print_freq=100,
        fine_tune_encoder=False)
    params2 = tb.train(args2)
    frozen_head = np.asarray(params2["encoder"]["embed"]["w"])

    # Same init seed -> heads start identical; only the fine-tuned one
    # moves. BN running stats moved in both (train-mode BN).
    init = tb.build_baseline(args2, __import__(
        "icd_tpu.vocabulary", fromlist=["load_vocab"]).load_vocab(),
        jax.random.PRNGKey(0))[0]
    np.testing.assert_array_equal(
        frozen_head, np.asarray(init["embed"]["w"]))
    assert not np.array_equal(chkpt_head, frozen_head)
    assert not np.array_equal(
        np.asarray(params2["encoder"]["resnet"]["stem"]["bn"]["mean"]),
        np.asarray(init["resnet"]["stem"]["bn"]["mean"]))


def test_evaluate_metrics(use_coco_root):
    args = make_train_args(
        model_name="bl_e", batch_size=4, epochs=1, embed_size=16,
        decoder_dim=12, workers=0)
    params = tb.train(args)
    metrics = tb.evaluate(args, params["encoder"], params["decoder"],
                          batch_size=4)
    for key in ["Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "losses"]:
        assert key in metrics
    assert len(metrics["losses"]) == 4  # val fixture has 4 captions
    assert all(np.isfinite(v) for v in metrics["losses"])
