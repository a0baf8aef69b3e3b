"""Device-side unique-image cache (data.pipeline.DeviceImageCache).

The per-caption sampling loop re-ships every image ~5x per epoch
(reference: dataset.py:73-75, .to(device) per batch baseline.py:214-215);
the cache ships each distinct image once and gathers on device. These
tests pin (a) the rewrite protocol (slots/idx/bucket padding/eviction
safety) and (b) that the cached train path reproduces the direct path's
losses bit-for-bit.
"""

import os

import numpy as np
import pytest

import icd_tpu.training.baseline as tb
from icd_tpu.checkpoint import load_checkpoint
from icd_tpu.data.pipeline import Batch, DeviceImageCache

from helpers import make_train_args, small_init_encoder


def _batch(ids, img_of):
    imgs = np.stack([img_of(i) for i in ids])
    return Batch(imgs=imgs, img_ids=list(ids),
                 captions=np.zeros((len(ids), 4), np.int32))


def _img(i):
    return np.full((4, 4, 3), i % 251, np.uint8)


def _apply(buf, batch):
    """Replay the step's insert+gather in numpy (flat rows, see
    DeviceImageCache.init_buffer)."""
    buf = np.array(buf)
    buf[batch["fresh_slots"]] = batch["fresh_imgs"]
    return buf, buf[batch["idx"]].reshape(-1, 4, 4, 3)


def test_rewrite_gathers_original_pixels():
    cache = DeviceImageCache(1.0, (4, 4, 3), batch_size=4)
    buf = np.zeros((cache.capacity + 1, 48), np.uint8)

    b1 = _batch([10, 11, 10, 12], _img)
    want = np.array(b1["imgs"])
    out = cache.rewrite(b1)
    assert "imgs" not in out and "img_ids" not in out
    buf, got = _apply(buf, out)
    np.testing.assert_array_equal(got, want)
    # 3 distinct images -> 3 misses, 1 intra-batch hit.
    assert (cache.misses, cache.hits) == (3, 1)

    # Second batch: 10/12 resident (no re-ship), 13 fresh.
    b2 = _batch([12, 13, 10, 13], _img)
    want2 = np.array(b2["imgs"])
    out2 = cache.rewrite(b2)
    fresh_real = [s for s in out2["fresh_slots"] if s != cache.capacity]
    assert len(set(fresh_real)) == 1  # only image 13 shipped
    buf, got2 = _apply(buf, out2)
    np.testing.assert_array_equal(got2, want2)


def test_bucket_padding_targets_scratch_slot():
    cache = DeviceImageCache(1.0, (4, 4, 3), batch_size=8)
    out = cache.rewrite(_batch([1, 2, 3, 1, 2, 3, 1, 2], _img))
    # 3 fresh -> bucket 4; pad row writes the scratch slot.
    assert out["fresh_imgs"].shape[0] == 4
    assert list(out["fresh_slots"]).count(cache.capacity) == 1
    assert cache.capacity not in set(out["idx"])

    # Zero-fresh batch still yields a (bucket-1) scratch write.
    out2 = cache.rewrite(_batch([1, 2, 3, 1, 2, 3, 1, 2], _img))
    assert out2["fresh_imgs"].shape[0] == 1
    assert list(out2["fresh_slots"]) == [cache.capacity]


def test_eviction_never_touches_current_batch():
    # Capacity 5 (5 rows of 4x4x3 = 240 B budget), working set larger.
    cache = DeviceImageCache(5 * 48 / (1 << 30), (4, 4, 3), batch_size=4)
    assert cache.capacity == 5
    buf = np.zeros((cache.capacity + 1, 48), np.uint8)
    rng = np.random.default_rng(0)
    for step in range(60):
        ids = list(rng.integers(0, 12, 4))  # 12 distinct > 5 slots
        b = _batch(ids, _img)
        want = np.array(b["imgs"])
        buf, got = _apply(buf, cache.rewrite(b))
        np.testing.assert_array_equal(got, want, err_msg=str(step))
    assert cache.misses > 5  # eviction actually exercised


@pytest.fixture
def small_backbone(monkeypatch):
    monkeypatch.setattr(tb, "init_encoder", small_init_encoder)


def test_cached_train_losses_bit_identical(use_coco_root, small_backbone,
                                           monkeypatch):
    """The cached path is the same pixels in the same order: every
    per-batch loss must equal the direct path's exactly (f32)."""
    args = make_train_args(
        model_name="bl_direct", batch_size=4, epochs=2, embed_size=16,
        decoder_dim=12, workers=0)
    tb.train(args)
    direct = load_checkpoint(
        name="bl_direct_1.ckpt")["metrics"]["epoch_losses"]

    monkeypatch.setenv("ICD_TPU_DEVICE_IMAGE_CACHE", "0.1")
    args2 = make_train_args(
        model_name="bl_cached", batch_size=4, epochs=2, embed_size=16,
        decoder_dim=12, workers=0)
    tb.train(args2)
    cached = load_checkpoint(
        name="bl_cached_1.ckpt")["metrics"]["epoch_losses"]

    assert direct == cached  # bit-identical per-batch losses


def test_cached_eval_bit_identical(use_coco_root, small_backbone,
                                   monkeypatch):
    """Eval keys the cache on image paths (val items have no id);
    metrics and per-sample losses must match the direct path exactly."""
    args = make_train_args(
        model_name="bl_ec", batch_size=4, epochs=1, embed_size=16,
        decoder_dim=12, workers=0)
    params = tb.train(args)
    monkeypatch.setenv("ICD_TPU_ALLOW_NO_METEOR", "1")
    direct = tb.evaluate(args, params["encoder"], params["decoder"],
                         batch_size=4)
    monkeypatch.setenv("ICD_TPU_DEVICE_IMAGE_CACHE", "0.1")
    cached = tb.evaluate(args, params["encoder"], params["decoder"],
                         batch_size=4)
    assert sorted(direct["losses"]) == sorted(cached["losses"])
    for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"):
        assert direct[k] == cached[k]


def test_cached_train_attention_bit_identical(use_coco_root, monkeypatch):
    import functools

    import icd_tpu.models.attention as ma
    import icd_tpu.training.attention as ta

    from helpers import SMALL_DIM, small_init_encoder_attention

    monkeypatch.setattr(ta, "init_encoder_attention",
                        small_init_encoder_attention)
    monkeypatch.setattr(
        ta, "init_attention_decoder",
        functools.partial(ma.init_attention_decoder,
                          encoder_dim=SMALL_DIM))
    args = make_train_args(
        model_name="att_direct", model="attention", batch_size=4,
        epochs=1, embed_size=16, decoder_dim=12, attention_dim=8,
        workers=0)
    ta.train(args)
    direct = load_checkpoint(
        name="att_direct_0.ckpt")["metrics"]["epoch_losses"]

    monkeypatch.setenv("ICD_TPU_DEVICE_IMAGE_CACHE", "0.1")
    args2 = make_train_args(
        model_name="att_cached", model="attention", batch_size=4,
        epochs=1, embed_size=16, decoder_dim=12, attention_dim=8,
        workers=0)
    ta.train(args2)
    cached = load_checkpoint(
        name="att_cached_0.ckpt")["metrics"]["epoch_losses"]

    assert direct == cached
