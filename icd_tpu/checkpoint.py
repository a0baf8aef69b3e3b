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

import atexit
import os
import pickle

import jax
import numpy as np

from .pathconf import PathConfig


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


_async_pool = None
_async_futures = []


def _get_async_pool():
    """Single background writer: keeps per-epoch saves FIFO-ordered and
    is flushed at interpreter exit so no checkpoint is lost."""
    global _async_pool
    if _async_pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _async_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="icd-ckpt")
        # Surface writer failures even when the process never calls
        # wait_pending_saves: a bare shutdown(wait=True) would wait for
        # the writes but DISCARD their exceptions, letting a disk-full
        # failure on the final epoch's save pass silently.
        atexit.register(_drain_at_exit)
    return _async_pool


def _drain_at_exit():
    try:
        wait_pending_saves()
    except Exception as e:  # atexit: report, can't usefully re-raise
        import sys

        print("icd_tpu.checkpoint: async checkpoint write FAILED at "
              "exit: {}".format(e), file=sys.stderr, flush=True)
    finally:
        _async_pool.shutdown(wait=True)


def wait_pending_saves():
    """Block until all async checkpoint writes have finished, re-raising
    the first writer failure (a silently dropped checkpoint would
    surface only at resume time otherwise) after collecting every
    pending result — later failures are not orphaned by an earlier one.
    Call before loading a just-saved checkpoint in-process; interpreter
    exit flushes (and reports failures on stderr) too."""
    pending, _async_futures[:] = _async_futures[:], []
    first_error = None
    for f in pending:
        try:
            f.result()
        except Exception as e:
            if first_error is None:
                first_error = e
            else:
                import sys

                print("icd_tpu.checkpoint: additional async write "
                      "failure: {}".format(e), file=sys.stderr,
                      flush=True)
    if first_error is not None:
        raise first_error


def save_checkpoint(args, epoch, encoder, decoder, encoder_optimizer,
                    decoder_optimizer, metrics, verbose=True, extra=None):
    """Save one epoch's training state (reference: checkpoint.py:39-62).

    ``ICD_TPU_CKPT_ASYNC=1`` moves the device→host fetch and pickle to a
    background writer thread so checkpoint I/O overlaps the next epoch's
    steps. Safe without copies: JAX arrays are immutable, and the
    optimizer update builds NEW arrays, so the snapshot the writer holds
    can never be mutated by continued training (it briefly keeps the old
    params' HBM alive, ~350 MB worst case here). Writes stay FIFO via a
    single worker; ``wait_pending_saves`` or interpreter exit flushes."""
    state = {
        "epoch": epoch,
        "metrics": metrics,
        "encoder": encoder,
        "decoder": decoder,
        "encoder_optimizer": encoder_optimizer,
        "decoder_optimizer": decoder_optimizer,
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

    def _write():
        for k in ("encoder", "decoder", "encoder_optimizer",
                  "decoder_optimizer"):
            state[k] = _to_numpy(state[k])
        # Atomic publish: a kill mid-pickle must never leave a truncated
        # file under the checkpoint's real name (resume would crash on
        # it); os.replace is atomic on the same filesystem.
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
        if verbose:
            print("Saved checkpoint to {}".format(path))

    if os.environ.get("ICD_TPU_CKPT_ASYNC"):
        _async_futures.append(_get_async_pool().submit(_write))
    else:
        _write()
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
