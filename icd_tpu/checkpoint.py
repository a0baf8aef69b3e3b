"""Checkpoint save / load / unpack.

Keeps the reference's checkpoint *protocol* — a single file per epoch
named ``checkpoints/{model_name}_{epoch}.ckpt`` holding epoch, metric
history, encoder, decoder, both optimizer states, and enough config to
rebuild the models (reference: checkpoint.py:8-62 pickles whole torch
modules; here the payload is pure numpy pytrees, which are
device-agnostic and robust across library versions).

``unpack_checkpoint`` returns the reference's 6-tuple order
(checkpoint.py:36).
"""

import os
import pickle

import jax
import numpy as np

from .pathconf import PathConfig


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(args, epoch, encoder, decoder, encoder_optimizer,
                    decoder_optimizer, metrics, verbose=True, extra=None):
    """Save one epoch's training state (reference: checkpoint.py:39-62)."""
    state = {
        "epoch": epoch,
        "metrics": metrics,
        "encoder": _to_numpy(encoder),
        "decoder": _to_numpy(decoder),
        "encoder_optimizer": _to_numpy(encoder_optimizer),
        "decoder_optimizer": _to_numpy(decoder_optimizer),
        "config": {
            "model_name": getattr(args, "model_name", None),
            "model": getattr(args, "model", getattr(args, "model_type", None)),
            "embed_size": getattr(args, "embed_size", None),
            "decoder_dim": getattr(args, "decoder_dim", None),
            "attention_dim": getattr(args, "attention_dim", None),
            "decoder_dropout": getattr(args, "decoder_dropout", None),
            "use_glove": getattr(args, "use_glove", False),
            "use_bert": getattr(args, "use_bert", False),
        },
    }
    if extra:
        state.update(extra)
    os.makedirs(PathConfig.checkpoints_dir, exist_ok=True)
    path = os.path.join(PathConfig.checkpoints_dir,
                        "{}_{}.ckpt".format(args.model_name, epoch))
    with open(path, "wb") as f:
        pickle.dump(state, f)
    if verbose:
        print("Saved checkpoint to {}".format(path))
    return path


def load_checkpoint(args=None, name=None, verbose=True):
    """Load a checkpoint by name from the checkpoints dir
    (reference: checkpoint.py:8-18).

    Reference ``.pth.tar`` checkpoints (torch whole-module pickles) are
    detected and converted transparently, so ``eval.py baseline_3.pth.tar
    --model_type baseline`` works against the reference's artifacts."""
    name = name if name is not None else args.checkpoint
    path = os.path.join(PathConfig.checkpoints_dir, name)
    if verbose:
        print("Loading checkpoint {}".format(path))
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK" or name.endswith(".pth.tar"):
        from .convert import convert_reference_checkpoint

        if verbose:
            print("Detected reference torch checkpoint; converting.")
        return convert_reference_checkpoint(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def unpack_checkpoint(chkpt):
    """Reference 6-tuple order (checkpoint.py:36)."""
    return (chkpt["epoch"], chkpt["encoder"], chkpt["decoder"],
            chkpt["encoder_optimizer"], chkpt["decoder_optimizer"],
            chkpt["metrics"])
