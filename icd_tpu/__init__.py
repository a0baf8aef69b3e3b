"""icd_tpu — TPU-native image-captioning framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
SarahAlkhateeb/Image-Captioning-with-Different-Decoders (reference at
/root/reference): a frozen ResNet-101 encoder feeding three decoder
families (plain LSTM baseline, Bahdanau soft-attention LSTM, and the
attention decoder with BERT contextual embeddings), GloVe pretrained
embeddings, greedy / beam-search caption generation, and the
COCO-caption BLEU / METEOR / ROUGE-L / CIDEr scoring stack.

Layout:
    data/       host-side COCO index, tokenization, vocabulary, GloVe
    models/     pure-JAX ResNet-101 encoder + decoder families
    ops/        Pallas TPU kernels and fused device ops
    parallel/   jax.sharding mesh + SPMD train-step sharding
    training/   train / evaluate drivers (reference train.py semantics)
    decoding/   batched on-device greedy + beam search
    eval_func/  BLEU / ROUGE-L / CIDEr / METEOR scorers
    native/     C++ RLE mask kernels (cocoapi maskApi equivalent)
"""

__version__ = "0.1.0"

# Restore the standard JAX_PLATFORMS env contract: the axon PJRT
# sitecustomize in this environment registers the TPU plugin in a way
# that wins over the env var, so honor it explicitly via the config API
# (must happen before the backend initializes).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax at package import).
    import importlib

    targets = {
        "COCO": "icd_tpu.data.coco",
        "COCODataset": "icd_tpu.data.dataset",
        "COCOeval": "icd_tpu.data.cocoeval",
        "Vocabulary": "icd_tpu.vocabulary",
        "build_vocab": "icd_tpu.vocabulary",
        "load_vocab": "icd_tpu.vocabulary",
        "get_eval_score": "icd_tpu.metric",
        "load_checkpoint": "icd_tpu.checkpoint",
        "save_checkpoint": "icd_tpu.checkpoint",
        "unpack_checkpoint": "icd_tpu.checkpoint",
    }
    if name in targets:
        return getattr(importlib.import_module(targets[name]), name)
    raise AttributeError(name)
