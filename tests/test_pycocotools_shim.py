"""The reference's exact import pattern works against our shim."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_import_pattern(use_coco_root):
    """Run the reference's sys.path.append + import flow in a fresh
    process rooted at the repo (like reference dataset.py:1-6)."""
    code = """
import sys, os, json
sys.path.append('cocoapi/PythonAPI/')
from pycocotools.coco import COCO
from pycocotools import mask
from pycocotools.cocoeval import COCOeval
import numpy as np

coco = COCO(os.path.join(os.environ['ICD_TPU_ROOT'],
                         'cocoapi/annotations/captions_train2014.json'))
ids = coco.getAnnIds(imgIds=1)
anns = coco.loadAnns(ids)
assert len(anns) == 2
coco.showAnns(anns)  # captions -> prints

m = np.zeros((10, 10), dtype=np.uint8, order='F')
m[2:5, 3:7] = 1
rle = mask.encode(m)
assert int(mask.area(rle)) == 12
print('SHIM_OK')
"""
    env = dict(os.environ, ICD_TPU_ROOT=use_coco_root,
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "SHIM_OK" in out.stdout
    # showAnns printed the two captions
    assert "man" in out.stdout
