from icd_tpu.native.mask import (  # noqa: F401
    area, bbNms, decode, encode, frBbox, frPoly, frPyObjects,
    frUncompressedRLE, iou, merge, nms, toBbox)
