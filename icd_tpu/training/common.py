"""Shared training machinery: losses, optimizers, param partitioning.

Numerical conventions follow the reference exactly:
 - cross-entropy = torch ``nn.CrossEntropyLoss`` (mean over counted
   positions); the baseline trains with ``ignore_index=<pad>``
   (models/baseline.py:194-195) while the attention driver counts every
   position of the uniformly-padded decode window
   (models/attention.py:399-411)
 - gradient clipping is elementwise value clamping to +/-grad_clip
   before the Adam step (train_utils.py:2-12)
 - Adam uses torch defaults (b1=0.9, b2=0.999, eps=1e-8).

Frozen parameters are *partitioned out* of the differentiated argument
instead of masked to zero, so XLA never builds the ResNet-101 backward
pass when the encoder is frozen — the common case.
"""

import os
import time

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Pytree partition/merge by boolean mask
# ---------------------------------------------------------------------------


class LossDrain:
    """Blocked loss fetcher for the per-batch-loss train loops.

    The reference records (and prints) a loss for EVERY batch
    (models/baseline.py:245-258); fetching each scalar individually
    synchronizes with the remote device, and through the axon tunnel a
    scalar fetch is a ~30 ms roundtrip — at the acceptance corpus's
    12,942 batches/epoch that is ~6 min of pure fetch latency
    (measured: 28.9 ms/step per-batch vs 2.8 ms/step fetching blocks
    of 16 via one jax.device_get, rehearsal notes). This drain keeps
    the per-batch loss VALUES and print lines bit-identical while
    amortizing the roundtrip: device scalars queue up and are fetched
    ``block`` at a time (ICD_TPU_LOSS_FETCH_BLOCK overrides; 1 makes
    every push flush immediately, i.e. a fully synchronous per-step
    fetch with zero overlap — the most conservative setting, not the
    old deferred-by-one pipeline).

    The per-batch "Time:" column reports the dispatch-to-dispatch
    interval (host pacing), which is what the deferred fetch was
    already approximating. Note the sync stall of each block flush
    lands in the NEXT batch's dt, so printed per-batch times oscillate
    around the true mean (block-1 small values, then one larger one);
    the per-epoch totals and every loss VALUE remain exact.
    """

    def __init__(self, finish, block=None):
        if block is None:
            block = int(os.environ.get("ICD_TPU_LOSS_FETCH_BLOCK", "16"))
        self.block = max(1, block)
        self.finish = finish  # finish(loss_val, batch_idx, dt_seconds)
        self._pending = []  # [(device_loss, batch_idx, dispatch_t)]
        self._last_t = time.time()

    def push(self, device_loss, batch_idx):
        now = time.time()
        self._pending.append((device_loss, batch_idx, now - self._last_t))
        self._last_t = now
        if len(self._pending) >= self.block:
            self.flush()

    def flush(self):
        if not self._pending:
            return
        vals = jax.device_get([p[0] for p in self._pending])
        for val, (_, batch_idx, dt) in zip(vals, self._pending):
            self.finish(float(val), batch_idx, dt)
        self._pending = []

def partition(tree, mask):
    """Split a pytree into (trainable, frozen) by a same-shaped bool mask.

    Non-selected positions become None, which JAX treats as an *empty*
    subtree — so jax.grad over the trainable partition never touches
    (or builds backward for) the frozen leaves.
    """
    trainable = jax.tree_util.tree_map(
        lambda x, m: x if m else None, tree, mask)
    frozen = jax.tree_util.tree_map(
        lambda x, m: None if m else x, tree, mask)
    return trainable, frozen


def merge(trainable, frozen):
    """Inverse of partition (equinox-style combine)."""
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a, trainable, frozen,
        is_leaf=lambda x: x is None)


def cast_floating(tree, dtype):
    """Cast floating-point leaves to ``dtype``; leave ints/bools alone.

    AMP helper: master weights stay f32 outside the step; the cast
    happens inside the differentiated function so gradients accumulate
    in f32 automatically (grad-of-cast upcasts).
    """
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
        tree)


def merge_bn_stats(new_tree, old_tree):
    """Take ONLY BatchNorm running statistics (dict keys 'mean'/'var')
    from ``new_tree``; every other leaf — and every None of a partition
    — comes from ``old_tree``.

    The AMP train step runs the forward on a bf16-cast copy of the
    params; threading the whole returned tree back would silently
    replace the f32 master weights with their bf16-rounded values. Only
    the freshly-updated running stats (already computed at the master
    dtype, see models.resnet.batch_norm) may flow back.
    """
    def walk(new, old, key=None):
        if old is None or new is None:
            return old
        if isinstance(old, dict):
            return {k: walk(new[k], old[k], k) for k in old}
        if isinstance(old, list):
            return [walk(a, b) for a, b in zip(new, old)]
        if key in ("mean", "var"):
            return new.astype(jnp.asarray(old).dtype)
        return old

    return walk(new_tree, old_tree)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def cross_entropy(logits, targets, ignore_index=None):
    """torch CrossEntropyLoss semantics over flattened positions.

    logits: (..., V); targets: (...) int. Mean over positions, skipping
    ignore_index positions when given.
    """
    v = logits.shape[-1]
    logits = logits.reshape(-1, v)
    targets = targets.reshape(-1)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logprobs, targets[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if ignore_index is None:
        return jnp.mean(nll)
    mask = (targets != ignore_index).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def doubly_stochastic_regularizer(attention_weights, alpha_c):
    """((alpha_c - sum_t alpha)^2).mean() (reference: attention.py:413-414)."""
    return jnp.mean(
        (alpha_c - jnp.sum(attention_weights, axis=1)) ** 2)


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def clip_value(max_delta):
    """Elementwise clamp to [-max_delta, +max_delta] (train_utils.py:2-12)."""
    return optax.clip(max_delta)


def make_optimizer(lr, grad_clip=None):
    """Adam with torch defaults; optional pre-step value clipping."""
    adam = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if grad_clip is None:
        return adam
    return optax.chain(clip_value(grad_clip), adam)
