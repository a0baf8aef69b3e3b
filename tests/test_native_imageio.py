"""Native JPEG loader: PIL closeness, scaling, threads, fallback."""

import io
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest
from PIL import Image

from icd_tpu.native.imageio import decode_resize_jpeg


def _jpeg_bytes(h, w, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h // 16 + 1, w // 16 + 1, 3)).astype(
        np.uint8)
    arr = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("src_hw", [(480, 640), (224, 224), (100, 150),
                                    (1024, 768)])
def test_close_to_pil(src_hw):
    data = _jpeg_bytes(*src_hw)
    ours = decode_resize_jpeg(data, 224, 224)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB").resize(
        (224, 224), Image.BILINEAR))
    assert ours.shape == (224, 224, 3)
    diff = np.abs(ours.astype(int) - pil.astype(int))
    assert diff.mean() < 2.0, diff.mean()
    corr = np.corrcoef(ours.ravel(), pil.ravel())[0, 1]
    assert corr > 0.995, corr


def test_grayscale_jpeg():
    arr = np.random.default_rng(1).integers(0, 255, (64, 64)).astype(
        np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, "JPEG")
    out = decode_resize_jpeg(buf.getvalue(), 32, 32)
    assert out is not None and out.shape == (32, 32, 3)
    # All channels equal for grayscale input.
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_bad_input_returns_none():
    assert decode_resize_jpeg(b"definitely not a jpeg", 224, 224) is None
    assert decode_resize_jpeg(b"", 224, 224) is None


def test_thread_parallel():
    data = _jpeg_bytes(480, 640)
    expected = decode_resize_jpeg(data, 224, 224)
    with ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(
            lambda _: decode_resize_jpeg(data, 224, 224), range(32)))
    for out in outs:
        np.testing.assert_array_equal(out, expected)


def test_dataset_uses_native_loader(use_coco_root, monkeypatch):
    # The native path is opt-in (ICD_TPU_NATIVE_LOADER=1 at import time),
    # so the default suite left ds._native_decode unset and this test
    # never ran. Patch the hook directly (monkeypatch restores it) so the
    # dataset->native integration is exercised on every suite run.
    from icd_tpu.data import dataset as ds

    try:
        from icd_tpu.native.imageio import decode_resize_jpeg
    except Exception:
        pytest.skip("native loader unavailable")
    monkeypatch.setattr(ds, "_native_decode", decode_resize_jpeg)
    coco_ds = ds.COCODataset("train", caption_max_len=-1)
    img, _ = coco_ds[0]
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
