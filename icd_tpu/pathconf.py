"""Global path registry.

Mirrors the reference's static path config (reference: pathconf.py:4-20) so
CLI tooling and data layout stay drop-in compatible. Paths are relative to
the process working directory, exactly like the reference; the environment
variable ``ICD_TPU_ROOT`` can re-root everything for tests.
"""

import os


def _root() -> str:
    return os.environ.get("ICD_TPU_ROOT", ".")


class PathConfig:
    """Global paths (reference: pathconf.py:4-20)."""

    @classmethod
    def _join(cls, *parts):
        return os.path.join(_root(), *parts)

    # The attributes below are properties-on-class via __getattr__ of the
    # metaclass-free pattern: simplest is classproperty-like functions.
    # For drop-in compatibility we expose them as class-level descriptors.


class _PathProp:
    def __init__(self, *parts):
        self._parts = parts

    def __get__(self, obj, objtype=None):
        return os.path.join(_root(), *self._parts)


PathConfig.pkldata_dir = _PathProp("pkldata")
PathConfig.vocab_file = _PathProp("pkldata", "vocab.pkl")

PathConfig.anno_dir = _PathProp("cocoapi", "annotations")
PathConfig.train_anno_file = _PathProp(
    "cocoapi", "annotations", "captions_train2014.json")
PathConfig.val_anno_file = _PathProp(
    "cocoapi", "annotations", "captions_val2014.json")
PathConfig.img_dir = _PathProp("cocoapi", "images")
PathConfig.train_img_dir = _PathProp("cocoapi", "images", "train2014")
PathConfig.val_img_dir = _PathProp("cocoapi", "images", "val2014")

PathConfig.glove = _PathProp("glove.6B")
PathConfig.glove_vectors = _PathProp("glove.6B", "glove_vectors.pkl")

PathConfig.eval_data = _PathProp("eval_data")
PathConfig.checkpoints_dir = _PathProp("checkpoints")
