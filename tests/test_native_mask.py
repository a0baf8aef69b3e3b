"""C++ RLE mask library: roundtrips and dense-numpy differentials."""

import numpy as np
import pytest

from icd_tpu.native import mask as m


def _random_mask(h, w, seed, blobby=True):
    rng = np.random.default_rng(seed)
    if not blobby:
        return (rng.random((h, w)) > 0.5).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    for _ in range(3):
        y, x = rng.integers(0, h), rng.integers(0, w)
        rh, rw = rng.integers(1, h // 2 + 1), rng.integers(1, w // 2 + 1)
        mask[y: y + rh, x: x + rw] = 1
    return mask


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("blobby", [True, False])
def test_encode_decode_roundtrip(seed, blobby):
    mask = _random_mask(23, 31, seed, blobby)
    rle = m.encode(np.asfortranarray(mask))
    assert isinstance(rle["counts"], bytes)
    back = m.decode(rle)
    np.testing.assert_array_equal(back, mask)


def test_multi_mask_stack():
    masks = np.stack([_random_mask(16, 16, s) for s in range(3)], axis=2)
    rles = m.encode(np.asfortranarray(masks.astype(np.uint8)))
    assert len(rles) == 3
    back = m.decode(rles)
    np.testing.assert_array_equal(back, masks)


def test_area_matches_dense():
    masks = [_random_mask(20, 17, s) for s in range(4)]
    rles = m.encode(np.asfortranarray(
        np.stack(masks, 2).astype(np.uint8)))
    areas = m.area(rles)
    np.testing.assert_array_equal(areas, [mm.sum() for mm in masks])


@pytest.mark.parametrize("intersect", [0, 1])
def test_merge_matches_dense(intersect):
    masks = [_random_mask(19, 22, s) for s in range(3)]
    rles = m.encode(np.asfortranarray(
        np.stack(masks, 2).astype(np.uint8)))
    merged = m.decode(m.merge(rles, intersect=intersect))
    expected = masks[0]
    for mm in masks[1:]:
        expected = (expected & mm) if intersect else (expected | mm)
    np.testing.assert_array_equal(merged, expected)


def test_rle_iou_matches_dense():
    dts = [_random_mask(15, 15, s) for s in (10, 11)]
    gts = [_random_mask(15, 15, s) for s in (20, 21, 22)]
    dt_r = m.encode(np.asfortranarray(np.stack(dts, 2).astype(np.uint8)))
    gt_r = m.encode(np.asfortranarray(np.stack(gts, 2).astype(np.uint8)))
    o = m.iou(dt_r, gt_r, [0, 1, 0])
    for d in range(2):
        for g in range(3):
            inter = (dts[d] & gts[g]).sum()
            if g == 1:  # crowd
                uni = dts[d].sum()
            else:
                uni = (dts[d] | gts[g]).sum()
            expected = inter / uni if uni else 0.0
            assert abs(o[d, g] - expected) < 1e-12


def test_bbox_iou():
    dt = np.asarray([[0, 0, 10, 10], [5, 5, 10, 10]], np.float64)
    gt = np.asarray([[0, 0, 10, 10]], np.float64)
    o = m.iou(dt, gt, [0])
    assert abs(o[0, 0] - 1.0) < 1e-12
    inter = 5 * 5
    assert abs(o[1, 0] - inter / (200 - inter)) < 1e-12
    # crowd: union = area(dt)
    o2 = m.iou(dt, gt, [1])
    assert abs(o2[1, 0] - inter / 100) < 1e-12


def test_to_bbox():
    mask = np.zeros((20, 30), np.uint8)
    mask[3:9, 5:12] = 1
    bb = m.toBbox(m.encode(np.asfortranarray(mask)))
    np.testing.assert_array_equal(bb, [5, 3, 7, 6])


def test_fr_bbox_exact_rectangle():
    """bbox [0,0,1,1] encloses exactly pixel (0,0) (mask.py:57)."""
    rle = m.frBbox([[0, 0, 1, 1]], 5, 5)[0]
    mask = m.decode(rle)
    expected = np.zeros((5, 5), np.uint8)
    expected[0, 0] = 1
    np.testing.assert_array_equal(mask, expected)

    rle2 = m.frBbox([[1, 2, 3, 2]], 8, 8)[0]
    mask2 = m.decode(rle2)
    expected2 = np.zeros((8, 8), np.uint8)
    expected2[2:4, 1:4] = 1
    np.testing.assert_array_equal(mask2, expected2)


def test_fr_poly_triangle():
    poly = [0.0, 0.0, 6.0, 0.0, 0.0, 6.0]
    mask = m.decode(m.frPoly([poly], 8, 8)[0])
    # Pixel centers strictly inside the triangle x+y<6.
    expected = np.zeros((8, 8), np.uint8)
    for r in range(8):
        for c in range(8):
            if (c + 0.5) + (r + 0.5) < 6.0 and c + 0.5 < 6 and r + 0.5 < 6:
                expected[r, c] = 1
    np.testing.assert_array_equal(mask, expected)


def test_fr_py_objects_dispatch():
    h, w = 10, 10
    bbox_rles = m.frPyObjects(np.asarray([[0., 0., 2., 2.]]), h, w)
    assert m.area(bbox_rles[0]) == 4
    poly_rles = m.frPyObjects([[0., 0., 4., 0., 4., 4., 0., 4.]], h, w)
    assert m.area(poly_rles[0]) == 16
    uc = {"size": [h, w], "counts": [10, 5, 85]}
    enc = m.frPyObjects(uc, h, w)
    assert m.area(enc) == 5


def test_string_codec_large_values():
    """Delta codec handles long runs and multi-char groups."""
    mask = np.zeros((400, 500), np.uint8)
    mask[100:300, 100:400] = 1
    rle = m.encode(np.asfortranarray(mask))
    np.testing.assert_array_equal(m.decode(rle), mask)
    assert m.area(rle) == 200 * 300


def test_nms():
    a = np.zeros((10, 10), np.uint8)
    a[0:5, 0:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[0:5, 1:6] = 1  # heavy overlap with a
    c = np.zeros((10, 10), np.uint8)
    c[6:9, 6:9] = 1  # disjoint
    rles = m.encode(np.asfortranarray(np.stack([a, b, c], 2)))
    keep = m.nms(rles, 0.5)
    np.testing.assert_array_equal(keep, [1, 0, 1])
