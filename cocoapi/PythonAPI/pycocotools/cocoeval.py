from icd_tpu.data.cocoeval import COCOeval, Params  # noqa: F401
