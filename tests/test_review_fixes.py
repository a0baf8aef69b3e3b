"""Regression tests for the code-review findings."""

import numpy as np
import pytest

from icd_tpu.data.pipeline import Batch, device_prefetch
from icd_tpu.native import jsonlib


def test_device_prefetch_propagates_errors():
    def bad_iter():
        yield Batch(x=np.ones(2))
        raise ValueError("corrupt image")

    gen = device_prefetch(bad_iter(), size=2)
    next(gen)
    with pytest.raises(ValueError, match="corrupt image"):
        next(gen)


def test_batch_attribute_protocol():
    b = Batch(x=1)
    assert b.x == 1
    assert not hasattr(b, "missing")
    assert getattr(b, "missing", None) is None


@pytest.mark.parametrize("bad", ["[+1]", "[.5]", "[1.]", "[0x1F]",
                                 "[Infinity]", "[nan]", "[01]"])
def test_json_rejects_nonstandard_numbers(bad):
    ok, _ = jsonlib.validate(bad)
    assert not ok


def test_json_accepts_standard_numbers():
    ok, stats = jsonlib.validate("[0, -0.5, 1e3, 1.5E-2, 123]")
    assert ok
    assert stats["numbers"] == 5


def test_cocoeval_accumulate_subset():
    """Restricting catIds between evaluate() and accumulate() reads the
    right per-image slots (upstream remapping semantics)."""
    from icd_tpu.data.cocoeval import COCOeval
    from test_cocoeval import _fake_coco, _random_dataset

    images, gts, dts, cats = _random_dataset(5, n_cats=3)
    ev = COCOeval(_fake_coco(images, gts, cats),
                  _fake_coco(images, dts, cats), iouType="bbox")
    ev.evaluate()
    # Full accumulate for ground truth of category 3's slice.
    ev.accumulate()
    full_prec = ev.eval["precision"].copy()

    ev2 = COCOeval(_fake_coco(images, [dict(g) for g in gts], cats),
                   _fake_coco(images, [dict(d) for d in dts], cats),
                   iouType="bbox")
    ev2.evaluate()
    ev2.params.catIds = [3]
    ev2.accumulate()
    np.testing.assert_allclose(
        ev2.eval["precision"][:, :, 0], full_prec[:, :, 2], atol=1e-12)


def test_attention_train_pads_to_batch_max(use_coco_root, monkeypatch):
    """The attention driver's decode window equals batch-max length - 1
    (reference attention.py:303-313), not a padded multiple."""
    import functools

    import icd_tpu.models.attention as ma
    import icd_tpu.training.attention as ta
    from helpers import SMALL_DIM, make_train_args, \
        small_init_encoder_attention

    monkeypatch.setattr(
        ta, "init_encoder_attention", small_init_encoder_attention)
    monkeypatch.setattr(
        ta, "init_attention_decoder",
        functools.partial(ma.init_attention_decoder,
                          encoder_dim=SMALL_DIM))
    seen = []
    orig_loader = ta.DataLoader

    class SpyLoader(orig_loader):
        def _collate(self, items):
            batch = super()._collate(items)
            true_max = max(len(item[1]) for item in items)
            seen.append((batch["captions"].shape[1], true_max,
                         int(batch["padded_lengths"][0])))
            return batch

    monkeypatch.setattr(ta, "DataLoader", SpyLoader)
    args = make_train_args(model_name="att_pad", model="attention",
                           batch_size=4, epochs=1, embed_size=16,
                           decoder_dim=12, attention_dim=10, workers=0)
    ta.train(args)
    assert seen
    for width, true_max, padded_len in seen:
        assert width == true_max  # padded exactly to the batch max
        assert padded_len == true_max  # decode window = true_max - 1


def test_resize_shim_scalar_size_truncates_like_torchvision():
    """torchvision's PIL Resize with a scalar size computes the long
    side as int(size * long / short) — TRUNCATION, not rounding
    (functional_pil.py). 128x129 at size 224: int(225.75) = 225."""
    from PIL import Image

    from icd_tpu.compat import _build_transforms_module

    tm = _build_transforms_module()
    out = tm.Resize(224)(Image.new("RGB", (128, 129)))
    assert out.size == (224, 225)
    # Tall/wide symmetry and the exact-ratio case stay exact.
    out = tm.Resize(224)(Image.new("RGB", (129, 128)))
    assert out.size == (225, 224)
    out = tm.Resize(224)(Image.new("RGB", (112, 224)))
    assert out.size == (224, 448)
