"""Baseline LSTM captioner: train / evaluate drivers.

Mirrors the reference driver semantics (reference:
models/baseline.py:114-374) on a TPU-native execution model: one jitted
SPMD train step over a (data, model) mesh, host input pipeline with
device prefetch, functional state, per-epoch reference-style checkpoints
and stdout format.

Faithfully reproduced quirks (these matter for parity):
 - loss targets are the FULL caption including <start> at t=0, with
   ignore_index=<pad> (baseline.py:224-225, 194-195)
 - the encoder runs its (frozen) BN in train mode during training
   (encoder.train(), baseline.py:197-198) and eval mode in evaluate
 - the encoder's embed Linear only receives optimizer updates when
   --fine_tune_encoder is set (baseline.py:158-163: without it there is
   no encoder optimizer at all, so the head stays at init)
 - eval loss uses a fresh CrossEntropyLoss WITHOUT ignore_index at
   batch size 1 (baseline.py:304-341): per-sample mean over the
   sample's own (unpadded) positions
 - eval references duplicate the cleaned caption once per original
   token position (baseline.py:345-350)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import (load_checkpoint, save_checkpoint,
                          unpack_checkpoint, wait_pending_saves)
from ..data.dataset import COCODataset
from ..data.pipeline import (
    Batch, DataLoader, cached_batches, device_image_cache_from_env,
    device_prefetch, eval_workers, host_prefetch, pad_batch_to,
    snap_eval_batch)
from ..metric import AccumulatingMetric, get_eval_score, probe_meteor
from ..models.baseline import (
    BaselineDecoderParams, baseline_decoder_forward, init_baseline_decoder,
    load_pretrained_embeddings)
from ..models.encoder import (
    encoder_forward, encoder_forward_int8, init_encoder, trainable_mask)
from ..parallel.mesh import batch_sharding, make_data_mesh, replicated
from ..training.common import (
    LossDrain, cast_floating, cross_entropy, make_optimizer, merge,
    merge_bn_stats, partition)
from ..utils.profiling import maybe_profile
from ..vocabulary import END_TOKEN, PAD_TOKEN, START_TOKEN


def _decoder_trainable_mask(decoder_params, fine_tune_embedding):
    mask = jax.tree_util.tree_map(lambda _: True, decoder_params)
    if not fine_tune_embedding:
        mask["embedding"] = False
    return mask


def pretrained_resnet_or_none():
    """Converted torchvision weights when models/resnet101.pth exists —
    the file the reference expects (models/encoder.py:9-20)."""
    import os

    from ..pathconf import _root

    path = os.path.join(_root(), "models", "resnet101.pth")
    if os.path.exists(path):
        from ..convert import load_resnet101_pth

        print("Loading pretrained ResNet-101 from {}".format(path))
        return load_resnet101_pth(path)
    return None


def build_baseline(args, vocab, rng):
    """Init encoder+decoder param trees per CLI args."""
    params = BaselineDecoderParams()
    params.embed_size = args.embed_size
    params.hidden_size = args.decoder_dim
    params.vocab_size = len(vocab)

    enc_key, dec_key = jax.random.split(rng)
    encoder = init_encoder(enc_key, args.embed_size)
    pretrained = pretrained_resnet_or_none()
    if pretrained is not None:
        encoder = dict(encoder, resnet=pretrained)
    decoder = init_baseline_decoder(dec_key, params)
    if args.use_glove:
        from ..data.embed import load_glove_vectors

        decoder = load_pretrained_embeddings(decoder, load_glove_vectors())
    return encoder, decoder


def make_train_step(pad_idx, mask, tx, compute_dtype=None, qresnet=None):
    """Build the jitted SPMD train step.

    mask: bool pytree over {'encoder','decoder'} marking trainable leaves.
    Frozen leaves are partitioned out of the differentiated argument so
    XLA never emits the ResNet backward when the encoder is frozen.

    compute_dtype (e.g. jnp.bfloat16 via --amp) runs the forward/backward
    in that dtype with f32 master weights, f32 loss/softmax, and f32
    optimizer/BN-stat state — the TPU mixed-precision extension; the
    default (None) is the reference's f32 numerics.

    qresnet (--int8_encoder, requires a fully frozen backbone): run the
    encoder forward through the static-int8 trunk. BN running stats do
    not update in this mode (they are folded into the dequant affine).
    """

    def step(trainable, frozen, opt_state, imgs, captions):
        def loss_fn(trainable):
            full = merge(trainable, frozen)
            if qresnet is not None:
                feats = encoder_forward_int8(
                    full["encoder"], qresnet, imgs,
                    compute_dtype=compute_dtype or jnp.float32)
                new_enc = None
            else:
                feats, new_enc = encoder_forward(
                    full["encoder"], imgs, train=True,
                    compute_dtype=compute_dtype)
            scores = baseline_decoder_forward(
                cast_floating(full["decoder"], compute_dtype),
                cast_floating(feats, compute_dtype), captions)
            loss = cross_entropy(
                scores.astype(jnp.float32), captions,
                ignore_index=pad_idx)
            return loss, new_enc

        (loss, new_enc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if new_enc is not None:
            # Thread ONLY the updated BN running stats (always in the
            # frozen partition) back into the state — never the
            # compute-cast weights.
            _, new_frozen_enc = partition(new_enc, mask["encoder"])
            frozen = dict(frozen, encoder=merge_bn_stats(
                new_frozen_enc, frozen["encoder"]))
        return trainable, frozen, opt_state, loss

    return step


def _labels(trainable):
    """Label tree for multi_transform: top-level module name per leaf."""
    return {
        k: jax.tree_util.tree_map(lambda _: k, v)
        for k, v in trainable.items()
    }


def make_optimizer_for(trainable, args):
    tx = optax.multi_transform(
        {
            "encoder": make_optimizer(args.encoder_lr, args.grad_clip),
            "decoder": make_optimizer(args.decoder_lr, args.grad_clip),
        },
        _labels(trainable))
    return tx


INT8_BN_WARMUP_BATCHES = 16


def _prepare_int8_encoder(encoder, loader, fwd, compute_dtype,
                          warmup=True):
    """BN-adapt then quantize the frozen backbone for --int8_encoder.

    The int8 trunk runs inference-mode BN (stats folded into the dequant
    affine), while the reference's train-mode BN normalizes with batch
    statistics. With a converged pretrained backbone the two agree; with
    unconverged running stats (fresh init) inference BN is
    ill-conditioned and the decoder learns from garbage-scaled features
    (observed: BLEU-1 0.25 vs 0.90 on the synthetic 4-epoch config). A
    short train-mode warmup adapts the running stats (torch momentum
    0.1 -> ~83% adapted after 16 batches) before calibration, making
    the flag correct in both regimes. Returns (qresnet, encoder with
    adapted stats) — the stats must reach the checkpoint so eval's
    inference BN agrees with what the decoder trained against.

    warmup=False (checkpoint resume): the checkpointed stats were
    already adapted by the original run; re-warming would shift the
    features the decoder trained against discontinuously. Calibration
    still runs on one fresh batch (per-site abs-maxes are stable batch
    to batch, unlike BN statistics).
    """
    from ..models.resnet_int8 import calibrate_act_maxes, quantize_resnet

    warm = jax.jit(lambda p, im: fwd(p, im, train=True)[1])
    imgs = None
    it = iter(loader)
    for _ in range(INT8_BN_WARMUP_BATCHES if warmup else 1):
        try:
            batch = next(it)
        except StopIteration:
            break
        imgs = jnp.asarray(batch["imgs"])
        if warmup:
            encoder = warm(encoder, imgs)
    if imgs is None:
        raise RuntimeError(
            "--int8_encoder needs at least one training batch to "
            "calibrate activation ranges, but the data loader yielded "
            "none (empty dataset or over-aggressive --max_caption_length "
            "filter).")
    qresnet = quantize_resnet(
        encoder["resnet"],
        calibrate_act_maxes(encoder["resnet"], imgs,
                            compute_dtype or jnp.float32))
    return qresnet, encoder


def train(args, mesh=None):
    """Train the baseline model (reference: models/baseline.py:114-264)."""
    dataset = COCODataset("train", caption_max_len=args.max_caption_length)
    vocab = dataset.vocab
    pad_idx = vocab(PAD_TOKEN)

    # The reference keeps the trailing partial batch (torch DataLoader
    # default, baseline.py:144-149); it costs one extra XLA program.
    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True,
        num_workers=args.workers, pad_idx=pad_idx, drop_last=False)

    if mesh is None:
        mesh = make_data_mesh(args.batch_size)

    rng = jax.random.PRNGKey(0)
    if args.checkpoint is None:
        encoder, decoder = build_baseline(args, vocab, rng)
        start_epoch = 0
        metrics = {}
        enc_opt_state = None
        dec_opt_state = None
    else:
        chkpt = load_checkpoint(args)
        (start_epoch, encoder, decoder, enc_opt_state, dec_opt_state,
         metrics) = unpack_checkpoint(chkpt)
        encoder = jax.tree_util.tree_map(jnp.asarray, encoder)
        decoder = jax.tree_util.tree_map(jnp.asarray, decoder)
        start_epoch += 1

    mask = {
        "encoder": trainable_mask(
            encoder, fine_tune=False, head=args.fine_tune_encoder),
        "decoder": _decoder_trainable_mask(
            decoder, args.fine_tune_embedding),
    }
    params = {"encoder": encoder, "decoder": decoder}
    trainable, frozen = partition(params, mask)
    tx = make_optimizer_for(trainable, args)
    # The checkpoint stores the combined multi_transform state under
    # 'decoder_optimizer' ('encoder_optimizer' mirrors the reference's
    # None when not fine-tuning).
    if dec_opt_state is not None:
        opt_state = jax.tree_util.tree_map(jnp.asarray, dec_opt_state)
    else:
        opt_state = tx.init(trainable)

    compute_dtype = jnp.bfloat16 if getattr(args, "amp", False) else None
    qresnet = None
    if getattr(args, "int8_encoder", False):
        qresnet, encoder = _prepare_int8_encoder(
            encoder, loader, encoder_forward, compute_dtype,
            warmup=args.checkpoint is None)
        # Re-partition: the warmed-up BN stats live in the frozen half
        # and must reach the checkpoint (eval runs inference BN on them).
        params = {"encoder": encoder, "decoder": merge(
            trainable, frozen)["decoder"]}
        trainable, frozen = partition(params, mask)
    raw_step = make_train_step(pad_idx, mask, tx,
                               compute_dtype=compute_dtype,
                               qresnet=qresnet)
    step_fn = jax.jit(raw_step)

    # Opt-in device-side unique-image cache (ICD_TPU_DEVICE_IMAGE_CACHE,
    # GB): per-caption sampling re-ships every image ~5x per epoch; with
    # the cache each distinct image crosses the host->device link once
    # and the step gathers it from HBM by index — insert + gather + step
    # fused into ONE dispatch, losses bit-identical to the direct path
    # (see data.pipeline.DeviceImageCache).
    img_cache = device_image_cache_from_env(dataset, args.batch_size)
    if img_cache is not None:
        def _cached_step(trainable, frozen, opt_state, buf,
                         fresh_slots, fresh_imgs, idx, captions):
            buf = img_cache.insert(buf, fresh_slots, fresh_imgs)
            trainable, frozen, opt_state, loss = raw_step(
                trainable, frozen, opt_state, img_cache.gather(buf, idx), captions)
            return trainable, frozen, opt_state, loss, buf

        cached_step_fn = jax.jit(_cached_step, donate_argnums=3)

    train_start = time.time()
    num_batches = len(loader)
    epoch_losses = metrics.get("epoch_losses", [])
    with mesh, maybe_profile("train_" + args.model_name):
        if img_cache is not None:
            # One buffer for the whole run: epochs after the first ship
            # almost nothing (every image already resident).
            buf = img_cache.init_buffer(replicated(mesh))
        for epoch in range(start_epoch, args.epochs):
            batch_losses = []
            accum_loss = AccumulatingMetric()
            accum_time = AccumulatingMetric()

            n_data = mesh.shape.get("data", 1)
            if img_cache is not None:
                batches = cached_batches(loader, img_cache, mesh)
            else:
                batches = device_prefetch(
                    iter(loader), size=2,
                    sharding=lambda x: (
                        batch_sharding(mesh, x.ndim)
                        if x.shape[0] % n_data == 0 else replicated(mesh)))
            def _finish(loss_val, batch_idx, dt):
                # Called by the LossDrain with the fetched scalar and the
                # batch's dispatch-to-dispatch interval; print content
                # and order match the reference per batch.
                batch_losses.append(loss_val)
                accum_loss.update(loss_val)
                accum_time.update(dt)
                if batch_idx % args.print_freq == 0:
                    print(
                        "Epoch {}/{}, Batch {}/{}, Loss {:.4f}, "
                        "Time: {:.4f}".format(
                            epoch + 1, args.epochs, batch_idx + 1,
                            num_batches, accum_loss.avg(),
                            accum_time.val))

            drain = LossDrain(_finish)
            for batch_idx, batch in enumerate(batches):
                if img_cache is not None:
                    (trainable, frozen, opt_state, loss,
                     buf) = cached_step_fn(
                        trainable, frozen, opt_state, buf,
                        batch["fresh_slots"], batch["fresh_imgs"],
                        batch["idx"], batch["captions"])
                else:
                    trainable, frozen, opt_state, loss = step_fn(
                        trainable, frozen, opt_state,
                        batch["imgs"], batch["captions"])
                drain.push(loss, batch_idx)
            drain.flush()

            epoch_losses.append(batch_losses)
            metrics = {"epoch_losses": epoch_losses}
            full = merge(trainable, frozen)
            save_checkpoint(
                args, epoch, full["encoder"], full["decoder"],
                None, opt_state, metrics)

    # Flush ICD_TPU_CKPT_ASYNC writes so callers can load immediately.
    wait_pending_saves()
    train_time = time.time() - train_start
    print("Model {} finished training for {} epochs in {:.4f} seconds."
          .format(args.model_name, args.epochs, train_time))
    return merge(trainable, frozen)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def make_eval_step(img_cache=None):
    def step(encoder, decoder, imgs, captions, lengths):
        feats, _ = encoder_forward(encoder, imgs, train=False)
        scores = baseline_decoder_forward(decoder, feats, captions)
        scores = scores.astype(jnp.float32)
        # Per-sample CE over the sample's own length (incl. <start> and
        # <end>), reproducing batch-1 CrossEntropyLoss without
        # ignore_index (baseline.py:304-341).
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        nll = -jnp.take_along_axis(
            logprobs, captions[..., None], axis=-1)[..., 0]  # (B, T)
        t_idx = jnp.arange(captions.shape[1])[None, :]
        pos_mask = (t_idx < lengths[:, None]).astype(jnp.float32)
        per_sample = jnp.sum(nll * pos_mask, axis=1) / lengths
        preds = jnp.argmax(scores, axis=2)
        return per_sample, preds

    if img_cache is None:
        return jax.jit(step)

    # DeviceImageCache variant: insert fresh images + gather the batch
    # + eval step in one dispatch (same pixels, identical numerics).
    def cached_step(encoder, decoder, buf, fresh_slots, fresh_imgs,
                    idx, captions, lengths):
        buf = img_cache.insert(buf, fresh_slots, fresh_imgs)
        per_sample, preds = step(
            encoder, decoder, img_cache.gather(buf, idx), captions,
            lengths)
        return per_sample, preds, buf

    return jax.jit(cached_step, donate_argnums=2)


def evaluate(args, encoder, decoder, batch_size=64):
    """Teacher-forced evaluation (reference: models/baseline.py:267-374).

    Batched on device but numerically identical to the reference's
    batch-1 loop; returns the metric dict with the per-sample loss list.
    """
    # Fail fast on a missing METEOR runtime before burning the decode
    # loop (get_eval_score only runs after it) — library callers get the
    # same startup probe the eval CLI does.
    probe_meteor()
    dataset = COCODataset("val", caption_max_len=args.max_caption_length)
    vocab = dataset.vocab
    special = {vocab(START_TOKEN), vocab(END_TOKEN), vocab(PAD_TOKEN)}

    batch_size = snap_eval_batch(len(dataset), batch_size)
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=True,
        num_workers=eval_workers(), pad_idx=vocab(PAD_TOKEN),
        drop_last=False)

    encoder = jax.tree_util.tree_map(jnp.asarray, encoder)
    decoder = jax.tree_util.tree_map(jnp.asarray, decoder)
    # Device-side unique-image cache for the val images (each recurs
    # ~5x across the per-caption samples): ship once, gather by index.
    img_cache = device_image_cache_from_env(dataset, batch_size)
    step = make_eval_step(img_cache)
    buf = img_cache.init_buffer() if img_cache is not None else None

    references, hypotheses, losses = [], [], []
    accum_loss = AccumulatingMetric()
    num_batches = len(loader)
    start_time = time.time()
    print("Started validation...")

    def _staged():
        # Producer thread: pad + ship images/captions to HBM while the
        # device computes the previous batch (the reference's loop is
        # strictly serial at batch 1, models/baseline.py:304-341).
        for batch in iter(loader):
            imgs, captions, lengths, valid = pad_batch_to(
                (batch["imgs"], batch["captions"],
                 batch["caption_lengths"]), batch_size)
            if img_cache is not None:
                # Val items carry no img_id; the image path is the
                # identity key (pad rows repeat the last sample's).
                ids = list(batch["img_paths"])
                ids += [ids[-1]] * (batch_size - valid)
                fb = img_cache.rewrite(
                    Batch(imgs=imgs, img_ids=ids))
                imgs = (jax.device_put(fb["fresh_slots"]),
                        jax.device_put(fb["fresh_imgs"]),
                        jax.device_put(fb["idx"]))
            else:
                imgs = jax.device_put(imgs)
            yield (imgs, jax.device_put(captions),
                   jax.device_put(lengths.astype(np.float32)),
                   valid, batch)

    def _drain(pending, batch_idx):
        # Fetch + host cleanup for the oldest in-flight batch; runs
        # while the next batch computes on-device.
        per_sample, preds, valid, batch = pending
        per_sample = np.asarray(per_sample)[:valid]
        preds = np.asarray(preds)[:valid]

        for j in range(valid):
            loss_val = float(per_sample[j])
            losses.append(loss_val)
            accum_loss.update(loss_val)

            cap = batch["captions"][j][: batch["caption_lengths"][j]]
            cleaned = [int(w) for w in cap if int(w) not in special]
            # Reference duplicates the cleaned caption once per token
            # position (baseline.py:345-350).
            references.append([cleaned] * len(cap))
            pred = preds[j][: batch["caption_lengths"][j]]
            hypotheses.append(
                [int(w) for w in pred if int(w) not in special])

        assert len(hypotheses) == len(references)
        if batch_idx % args.print_freq == 0:
            print("Batch {}/{}, Loss {:.4f}".format(
                batch_idx + 1, num_batches, accum_loss.avg()))

    pending = None
    for batch_idx, (imgs, captions, lengths, valid, batch) in enumerate(
            host_prefetch(_staged(), size=2)):
        if img_cache is not None:
            fresh_slots, fresh_imgs, idx = imgs
            per_sample, preds, buf = step(
                encoder, decoder, buf, fresh_slots, fresh_imgs, idx,
                captions, lengths)
        else:
            per_sample, preds = step(encoder, decoder, imgs, captions,
                                     lengths)
        if pending is not None:
            _drain(pending[0], pending[1])
        pending = ((per_sample, preds, valid, batch), batch_idx)
    if pending is not None:
        _drain(pending[0], pending[1])

    metrics = get_eval_score(references, hypotheses)
    metrics["losses"] = losses
    print("Checkpoint {} finished evaluation in {:.4f} seconds.".format(
        getattr(args, "checkpoint", None), time.time() - start_time))
    return metrics
