"""COCOeval differential test vs the reference's vendored cocoeval.

The reference cocoeval needs the compiled _mask Cython extension (absent
here: only darwin .so are vendored), so the test injects our native
mask module as pycocotools._mask — it exposes the same functions — and
shims two numpy-2.0 incompatibilities in the 2015-era code (np.float,
float num in np.linspace).
"""

import sys
import types

import numpy as np
import pytest

from icd_tpu.data.cocoeval import COCOeval as OurEval


def _fake_coco(images, anns, cats):
    """Minimal COCO-index stand-in shared by both implementations."""
    from icd_tpu.data.coco import COCO

    coco = COCO()
    coco.dataset = {"images": images, "annotations": anns,
                    "categories": cats}
    coco.createIndex()
    return coco


def _random_dataset(seed, n_imgs=4, n_cats=2, n_gt=5, n_dt=7):
    rng = np.random.default_rng(seed)
    images = [{"id": i + 1, "height": 100, "width": 100}
              for i in range(n_imgs)]
    cats = [{"id": c + 1, "name": str(c), "supercategory": "x"}
            for c in range(n_cats)]
    gts, dts = [], []
    aid = 1
    for img in images:
        for _ in range(n_gt):
            x, y = rng.uniform(0, 60, 2)
            w, h = rng.uniform(5, 40, 2)
            gts.append({
                "id": aid, "image_id": img["id"],
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h),
                "iscrowd": int(rng.random() < 0.15),
            })
            aid += 1
        for _ in range(n_dt):
            x, y = rng.uniform(0, 60, 2)
            w, h = rng.uniform(5, 40, 2)
            dts.append({
                "id": aid, "image_id": img["id"],
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h),
                "score": float(rng.random()),
                "iscrowd": 0,
            })
            aid += 1
    # make some detections near-copies of gts so there are real matches
    for i, gt in enumerate(gts[::2]):
        bb = list(gt["bbox"])
        bb[0] += float(rng.uniform(-2, 2))
        bb[1] += float(rng.uniform(-2, 2))
        dts[i % len(dts)] = dict(
            dts[i % len(dts)], bbox=bb, area=bb[2] * bb[3],
            category_id=gt["category_id"], image_id=gt["image_id"])
    return images, gts, dts, cats


@pytest.fixture(scope="module")
def reference_cocoeval():
    """Import the reference cocoeval with _mask stubbed by our native lib."""
    from icd_tpu.native import mask as ours

    ref_path = "/root/reference/cocoapi/PythonAPI"
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    stub = types.ModuleType("pycocotools._mask")
    for fn in ("encode", "decode", "merge", "area", "iou", "toBbox",
               "frBbox", "frPoly", "frUncompressedRLE", "frPyObjects"):
        setattr(stub, fn, getattr(ours, fn))
    sys.modules["pycocotools._mask"] = stub

    # numpy 2.x shims for the 2015-era reference code. The linspace
    # wrapper (int-coerced num, called at Params() construction) stays
    # installed for the test process; it is semantically identical for
    # integer inputs.
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    orig_linspace = np.linspace

    def patched_linspace(start, stop, num=50, **kw):
        return orig_linspace(start, stop, int(round(float(num))), **kw)

    np.linspace = patched_linspace
    from pycocotools.cocoeval import COCOeval as RefEval

    return RefEval


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bbox_eval_matches_reference(reference_cocoeval, seed):
    images, gts, dts, cats = _random_dataset(seed)
    gt_coco = _fake_coco(images, gts, cats)
    dt_coco = _fake_coco(images, dts, cats)

    ours = OurEval(gt_coco, dt_coco, iouType="bbox")
    ours.evaluate()
    ours.accumulate()
    ours.summarize()

    # fresh index objects: evaluation mutates annotations in place
    gt_coco2 = _fake_coco(images, [dict(g) for g in gts], cats)
    dt_coco2 = _fake_coco(images, [dict(d) for d in dts], cats)
    ref = reference_cocoeval(gt_coco2, dt_coco2, iouType="bbox")
    ref.params.iouThrs = np.asarray(ours.params.iouThrs)
    ref.params.recThrs = np.asarray(ours.params.recThrs)
    ref.evaluate()
    ref.accumulate()
    ref.summarize()

    np.testing.assert_allclose(
        ours.eval["precision"], ref.eval["precision"], atol=1e-12)
    np.testing.assert_allclose(
        ours.eval["recall"], ref.eval["recall"], atol=1e-12)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-12)


def test_perfect_detection_ap_is_one():
    images = [{"id": 1, "height": 50, "width": 50}]
    cats = [{"id": 1, "name": "a", "supercategory": "x"}]
    gts = [{"id": 1, "image_id": 1, "category_id": 1,
            "bbox": [5, 5, 10, 10], "area": 100.0, "iscrowd": 0}]
    dts = [{"id": 2, "image_id": 1, "category_id": 1,
            "bbox": [5, 5, 10, 10], "area": 100.0, "score": 0.9,
            "iscrowd": 0}]
    ev = OurEval(_fake_coco(images, gts, cats),
                 _fake_coco(images, dts, cats), iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    assert abs(ev.stats[0] - 1.0) < 1e-9  # AP
    assert abs(ev.stats[8] - 1.0) < 1e-9  # AR@100
