"""COCO index + dataset + loader semantics (reference: dataset.py,
models/baseline.py:133-149 collate)."""

import numpy as np

from icd_tpu.data.coco import COCO
from icd_tpu.data.dataset import COCODataset
from icd_tpu.data.pipeline import DataLoader, device_prefetch, pad_captions
from icd_tpu.pathconf import PathConfig
from icd_tpu.vocabulary import END_TOKEN, PAD_TOKEN, START_TOKEN


def test_coco_index(use_coco_root):
    coco = COCO(PathConfig.train_anno_file)
    assert len(coco.imgs) == 4
    assert len(coco.anns) == 8
    ann_ids = coco.getAnnIds(imgIds=1)
    anns = coco.loadAnns(ann_ids)
    assert all(a["image_id"] == 1 for a in anns)
    assert len(anns) == 2
    img = coco.loadImgs(1)[0]
    assert img["file_name"].endswith(".jpg")


def test_dataset_one_sample_per_caption(use_coco_root):
    ds = COCODataset("train", caption_max_len=-1)
    assert len(ds) == 8  # 8 captions over 4 images (dataset.py:73-75)


def test_caption_char_length_filter(use_coco_root):
    """Filter is on character length of the raw caption (dataset.py:33-34)."""
    ds_all = COCODataset("train", caption_max_len=-1)
    ds_short = COCODataset("train", caption_max_len=30)
    kept = [m for m in ds_all.caption_img_mappings
            if len(m["caption"]) <= 30]
    assert len(ds_short) == len(kept) < len(ds_all)


def test_item_structure(use_coco_root):
    ds = COCODataset("train", caption_max_len=-1)
    img, caption = ds[0]
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert caption[0] == ds.vocab(START_TOKEN)
    assert caption[-1] == ds.vocab(END_TOKEN)

    ds_val = COCODataset("val", caption_max_len=-1)
    img, caption, img_path, all_caps = ds_val[0]
    assert img_path.endswith(".jpg")
    assert len(all_caps) >= 1


def test_pad_captions():
    caps = [np.array([1, 2, 3]), np.array([4, 5])]
    out = pad_captions(caps, pad_idx=0)
    assert out.shape == (2, 3)
    assert out[1].tolist() == [4, 5, 0]


def test_dataloader_batching(use_coco_root):
    ds = COCODataset("train", caption_max_len=-1)
    pad = ds.vocab(PAD_TOKEN)
    loader = DataLoader(ds, batch_size=4, shuffle=True, pad_idx=pad,
                        num_workers=2, pad_to_multiple=8)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.imgs.shape == (4, 224, 224, 3)
    assert b.captions.shape[0] == 4
    assert b.captions.shape[1] % 8 == 0
    # padded_lengths are uniform per batch (attention.py:311-313 quirk).
    assert (b.padded_lengths == b.captions.shape[1]).all()


def test_dataloader_epoch_reshuffles(use_coco_root):
    ds = COCODataset("train", caption_max_len=-1)
    loader = DataLoader(ds, batch_size=8, shuffle=True, pad_idx=0, seed=3)
    first = next(iter(loader)).captions.copy()
    second = next(iter(loader)).captions.copy()
    assert first.shape[0] == second.shape[0] == 8
    assert not np.array_equal(first, second)


def test_device_prefetch(use_coco_root):
    import jax

    ds = COCODataset("train", caption_max_len=-1)
    loader = DataLoader(ds, batch_size=4, shuffle=False, pad_idx=0)
    seen = 0
    for batch in device_prefetch(iter(loader), size=2):
        assert isinstance(batch.imgs, jax.Array)
        seen += 1
    assert seen == 2


def test_host_prefetch_order_and_error():
    from icd_tpu.data.pipeline import host_prefetch

    assert list(host_prefetch(iter(range(7)), size=2)) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = host_prefetch(boom(), size=2)
    assert next(it) == 1
    try:
        next(it)
    except RuntimeError as e:
        assert "producer died" in str(e)
    else:
        raise AssertionError("expected the producer error to propagate")


def test_image_cache(use_coco_root, monkeypatch):
    """ICD_TPU_IMAGE_CACHE memoizes decoded images (pure function of
    the file) within the RAM budget; samples stay byte-identical."""
    monkeypatch.setenv("ICD_TPU_IMAGE_CACHE", "1")
    ds = COCODataset("train", caption_max_len=-1)
    base = COCODataset("train", caption_max_len=-1)
    base._img_cache_budget = 0  # uncached control

    decodes = []
    orig = COCODataset._decode_img
    monkeypatch.setattr(COCODataset, "_decode_img",
                        lambda self, i: decodes.append(i) or orig(self, i))
    for idx in range(len(ds)):
        a, cap_a = ds[idx]
        b, cap_b = base[idx]
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(cap_a, cap_b)
    # 8 captions over 4 images: cached dataset decodes each image once,
    # the control re-decodes per caption sample.
    assert decodes.count(1) == 1 + 2  # ds once + base twice
    assert len([i for i in decodes if i]) == 4 + 8


def test_caption_memo_identity(use_coco_root):
    ds = COCODataset("train", caption_max_len=-1)
    _, cap1 = ds[0]
    _, cap2 = ds[0]
    assert cap1 is cap2  # memoized pure tokenization
    assert not cap1.flags.writeable
