from .coco import COCO
from .pipeline import Batch, DataLoader, device_prefetch, pad_captions
from .tokenize import word_tokenize

__all__ = [
    "COCO",
    "Batch", "DataLoader", "device_prefetch", "pad_captions",
    "word_tokenize",
]


def __getattr__(name):
    # dataset/embed import icd_tpu.vocabulary which imports data.tokenize;
    # lazy re-export avoids the cycle while keeping icd_tpu.data.<name>.
    if name in ("COCODataset", "get_anno_file", "get_img_dir"):
        from . import dataset

        return getattr(dataset, name)
    if name in ("generate_glove_vectors", "load_glove_vectors"):
        from . import embed

        return getattr(embed, name)
    raise AttributeError(name)
