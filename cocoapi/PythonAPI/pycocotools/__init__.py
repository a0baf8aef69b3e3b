"""Drop-in ``pycocotools`` package backed by icd_tpu.

The reference vendors cocoapi and does ``sys.path.append(
'cocoapi/PythonAPI')`` before ``from pycocotools.coco import COCO``
(reference: dataset.py:3-4). This shim preserves that exact import
surface — coco / mask / cocoeval — forwarding to the icd_tpu
implementations (pure-Python COCO index, C++ RLE kernels, COCOeval).
"""

import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

__author__ = "icd_tpu"
