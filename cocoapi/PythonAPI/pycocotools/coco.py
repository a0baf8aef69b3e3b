from icd_tpu.data.coco import COCO, _is_array_like  # noqa: F401
