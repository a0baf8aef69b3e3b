"""Attention captioner: train / evaluate drivers.

Mirrors the reference driver semantics (reference:
models/attention.py:287-567) with the same TPU execution model as the
baseline driver. Faithfully reproduced quirks:
 - caption_lengths are computed after padding, so decode lengths are
   uniform per batch (attention.py:311-313) and the train CE (no
   ignore_index) averages over every position of the decode window,
   pads included (attention.py:399-411)
 - doubly-stochastic attention regularizer added with args.alpha_c in
   train (attention.py:413-414) and alpha_c=1 in eval
   (attention.py:529-531)
 - eval hypotheses truncate to decode_length before stripping special
   tokens (attention.py:543-553); references are built from targets
   (captions[1:]) duplicated per target position (attention.py:535-541)
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
from ..models.attention import (
    AttentionDecoderParams, attention_decoder_forward,
    init_attention_decoder, load_pretrained_embeddings)
from ..models.encoder import (
    encoder_attention_forward, encoder_attention_forward_int8,
    init_encoder_attention, trainable_mask)
from ..parallel.mesh import batch_sharding, make_data_mesh, replicated
from ..training.baseline import (
    _decoder_trainable_mask, make_optimizer_for,
    pretrained_resnet_or_none)
from ..training.common import (
    LossDrain, cast_floating, doubly_stochastic_regularizer, merge,
    merge_bn_stats, partition)
from ..utils.profiling import maybe_profile
from ..vocabulary import END_TOKEN, PAD_TOKEN, START_TOKEN


def build_attention(args, vocab, rng):
    params = AttentionDecoderParams()
    params.attention_dim = args.attention_dim
    params.decoder_dim = args.decoder_dim
    params.embed_size = args.embed_size
    params.dropout = args.decoder_dropout
    params.vocab = vocab
    params.use_bert = args.use_bert

    enc_key, dec_key = jax.random.split(rng)
    encoder = init_encoder_attention(enc_key)
    pretrained = pretrained_resnet_or_none()
    if pretrained is not None:
        encoder = dict(encoder, resnet=pretrained)
    decoder = init_attention_decoder(dec_key, params)
    if args.use_glove:
        from ..data.embed import load_glove_vectors

        decoder = load_pretrained_embeddings(decoder, load_glove_vectors())
    return encoder, decoder


def make_train_step(mask, tx, alpha_c, dropout_rate, compute_dtype=None,
                    qresnet=None):
    """Jitted SPMD train step for the attention model.

    BERT embeddings (when --use_bert) are precomputed on host and passed
    as the step's optional `embeddings` argument.

    compute_dtype (e.g. jnp.bfloat16 via --amp) runs forward/backward in
    that dtype with f32 master weights and f32 loss/softmax/regularizer
    (the TPU mixed-precision extension; None = reference f32 numerics).

    qresnet (--int8_encoder): static-int8 frozen-encoder forward; BN
    running stats do not update (see training/baseline.py).
    """

    def step(trainable, frozen, opt_state, rng, imgs, captions,
             decode_lengths, embeddings=None):
        def loss_fn(trainable):
            full = merge(trainable, frozen)
            if qresnet is not None:
                grid = encoder_attention_forward_int8(
                    qresnet, imgs,
                    compute_dtype=compute_dtype or jnp.float32)
                new_enc = None
            else:
                grid, new_enc = encoder_attention_forward(
                    full["encoder"], imgs, train=True,
                    compute_dtype=compute_dtype)
            scores, alphas = attention_decoder_forward(
                cast_floating(full["decoder"], compute_dtype),
                cast_floating(grid, compute_dtype), captions,
                decode_lengths, rng=rng, dropout_rate=dropout_rate,
                embeddings=cast_floating(embeddings, compute_dtype)
                if embeddings is not None else None)
            targets = captions[:, 1:]
            # pack_padded over uniform decode lengths == masked mean.
            t_idx = jnp.arange(targets.shape[1])[None, :]
            included = t_idx < decode_lengths[:, None]
            logprobs = jax.nn.log_softmax(
                scores.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logprobs, targets[..., None], axis=-1)[..., 0]
            denom = jnp.maximum(jnp.sum(included), 1)
            loss = jnp.sum(jnp.where(included, nll, 0.0)) / denom
            loss = loss + doubly_stochastic_regularizer(
                alphas.astype(jnp.float32), alpha_c)
            return loss, new_enc

        (loss, new_enc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if new_enc is not None:
            _, new_frozen_enc = partition(new_enc, mask["encoder"])
            frozen = dict(frozen, encoder=merge_bn_stats(
                new_frozen_enc, frozen["encoder"]))
        return trainable, frozen, opt_state, loss

    return step


def train(args, mesh=None):
    """Train the attention model (reference: models/attention.py:287-452)."""
    dataset = COCODataset("train", caption_max_len=args.max_caption_length)
    vocab = dataset.vocab
    pad_idx = vocab(PAD_TOKEN)

    # pad_to_multiple=0: the attention model's decode window is
    # padded_len - 1 and its train CE has no ignore_index, so padding
    # beyond the batch max would add extra all-pad timesteps to the loss
    # and regularizer (and extra '<pad>' context for BERT) — the
    # reference pads exactly to the batch max (attention.py:303-313).
    # drop_last=False: the reference keeps the trailing partial batch
    # (torch DataLoader default, attention.py:317-323).
    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True,
        num_workers=args.workers, pad_idx=pad_idx, drop_last=False,
        pad_to_multiple=0)

    if mesh is None:
        mesh = make_data_mesh(args.batch_size)

    rng = jax.random.PRNGKey(0)
    if args.checkpoint is None:
        encoder, decoder = build_attention(args, vocab, rng)
        start_epoch = 0
        metrics = {}
        dec_opt_state = None
    else:
        chkpt = load_checkpoint(args)
        (start_epoch, encoder, decoder, _enc_opt, dec_opt_state,
         metrics) = unpack_checkpoint(chkpt)
        encoder = jax.tree_util.tree_map(jnp.asarray, encoder)
        decoder = jax.tree_util.tree_map(jnp.asarray, decoder)
        start_epoch += 1

    bert_embedder = None
    if args.use_bert:
        import os as _os

        from ..models.bert_embed import BertCaptionEmbedder

        # Device-resident BERT forward by default (the host torch
        # forward is 15x the train step on CPU, NOTES.md);
        # ICD_TPU_BERT_HOST=1 keeps the reference-style host path;
        # ICD_TPU_BERT_INT8=1 additionally quantizes the device BERT's
        # linears to W8A8 (models/bert_jax.quantize_bert_params).
        bert_embedder = BertCaptionEmbedder(
            vocab, device=not _os.environ.get("ICD_TPU_BERT_HOST"),
            int8=bool(_os.environ.get("ICD_TPU_BERT_INT8")))

    mask = {
        # The attention encoder has no head; with the backbone frozen the
        # reference's encoder optimizer would be empty (attention.py:317).
        "encoder": trainable_mask(encoder, fine_tune=False, head=False),
        "decoder": _decoder_trainable_mask(
            decoder, args.fine_tune_embedding),
    }
    if args.use_bert:
        # BERT embeddings replace the table entirely; don't train it
        # (the reference's table still exists but is unused in forward).
        mask["decoder"]["embedding"] = False

    params = {"encoder": encoder, "decoder": decoder}
    trainable, frozen = partition(params, mask)
    tx = make_optimizer_for(trainable, args)
    if dec_opt_state is not None:
        opt_state = jax.tree_util.tree_map(jnp.asarray, dec_opt_state)
    else:
        opt_state = tx.init(trainable)

    compute_dtype = (jnp.bfloat16 if getattr(args, "amp", False)
                     else None)
    qresnet = None
    if getattr(args, "int8_encoder", False):
        from .baseline import _prepare_int8_encoder

        qresnet, encoder = _prepare_int8_encoder(
            encoder, loader, encoder_attention_forward, compute_dtype,
            warmup=args.checkpoint is None)
        # Re-partition so the warmed-up BN stats reach the checkpoint
        # (eval runs inference BN on them).
        params = {"encoder": encoder, "decoder": merge(
            trainable, frozen)["decoder"]}
        trainable, frozen = partition(params, mask)
    raw_step = make_train_step(
        mask, tx, args.alpha_c, args.decoder_dropout,
        compute_dtype=compute_dtype, qresnet=qresnet)
    step_fn = jax.jit(raw_step)

    # Opt-in device-side unique-image cache (ICD_TPU_DEVICE_IMAGE_CACHE,
    # GB): see training/baseline.py and data.pipeline.DeviceImageCache.
    img_cache = device_image_cache_from_env(dataset, args.batch_size)
    if img_cache is not None:
        def _cached_step(trainable, frozen, opt_state, rng_t, buf,
                         fresh_slots, fresh_imgs, idx, captions,
                         decode_lengths, embeddings):
            buf = img_cache.insert(buf, fresh_slots, fresh_imgs)
            trainable, frozen, opt_state, loss = raw_step(
                trainable, frozen, opt_state, rng_t, img_cache.gather(buf, idx),
                captions, decode_lengths, embeddings)
            return trainable, frozen, opt_state, loss, buf

        cached_step_fn = jax.jit(_cached_step, donate_argnums=4)

    num_batches = len(loader)
    epoch_losses = metrics.get("epoch_losses", [])
    step_rng = jax.random.PRNGKey(1)
    with mesh, maybe_profile("train_" + args.model_name):
        if img_cache is not None:
            buf = img_cache.init_buffer(replicated(mesh))
        for epoch in range(start_epoch, args.epochs):
            batch_losses = []
            accum_loss = AccumulatingMetric()
            accum_time = AccumulatingMetric()

            n_data = mesh.shape.get("data", 1)
            batch_iter = iter(loader)
            if bert_embedder is not None:
                # The host BERT forward was the reference's hot loop
                # (attention.py:166-215, per-caption inside the train
                # step). Attaching it to the batch stream BEFORE
                # device_prefetch runs it on the prefetch producer
                # thread, overlapping BERT compute with the device
                # step; device_prefetch then lays the embeddings out
                # on the mesh like the rest of the batch (host arrays
                # via the sharded host->HBM transfer, device-BERT
                # arrays via an off-critical-path reshard).
                def _with_bert(it):
                    for b in it:
                        b["embeddings"] = bert_embedder(
                            np.asarray(b["captions"]))
                        yield b

                batch_iter = _with_bert(batch_iter)
            if img_cache is not None:
                batches = cached_batches(batch_iter, img_cache, mesh)
            else:
                batches = device_prefetch(
                    batch_iter, size=2,
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
                step_rng, rng_t = jax.random.split(step_rng)
                # Reference quirk: lengths measured after padding ->
                # uniform decode window covering pads
                # (attention.py:311-313).
                decode_lengths = batch["padded_lengths"] - 1
                if img_cache is not None:
                    (trainable, frozen, opt_state, loss,
                     buf) = cached_step_fn(
                        trainable, frozen, opt_state, rng_t, buf,
                        batch["fresh_slots"], batch["fresh_imgs"],
                        batch["idx"], batch["captions"],
                        decode_lengths, batch.get("embeddings"))
                else:
                    trainable, frozen, opt_state, loss = step_fn(
                        trainable, frozen, opt_state, rng_t,
                        batch["imgs"], batch["captions"], decode_lengths,
                        batch.get("embeddings"))
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
    print("Model {} finished training for {} epochs.".format(
        args.model_name, args.epochs))
    return merge(trainable, frozen)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def make_eval_step(img_cache=None):
    def step(encoder, decoder, imgs, captions, decode_lengths,
             embeddings=None):
        grid, _ = encoder_attention_forward(encoder, imgs, train=False)
        scores, alphas = attention_decoder_forward(
            decoder, grid, captions, decode_lengths,
            embeddings=embeddings)
        scores = scores.astype(jnp.float32)
        targets = captions[:, 1:]
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        nll = -jnp.take_along_axis(
            logprobs, targets[..., None], axis=-1)[..., 0]
        t_idx = jnp.arange(targets.shape[1])[None, :]
        included = (t_idx < decode_lengths[:, None]).astype(jnp.float32)
        ce = jnp.sum(nll * included, axis=1) / jnp.maximum(
            decode_lengths.astype(jnp.float32), 1.0)
        # Per-sample regularizer with alpha_c = 1 (attention.py:529-531).
        reg = jnp.mean(
            (1.0 - jnp.sum(alphas.astype(jnp.float32), axis=1)) ** 2,
            axis=-1)
        preds = jnp.argmax(scores, axis=2)
        return ce + reg, preds

    if img_cache is None:
        return jax.jit(step)

    # DeviceImageCache variant: insert fresh images + gather the batch
    # + eval step in one dispatch (same pixels, identical numerics).
    def cached_step(encoder, decoder, buf, fresh_slots, fresh_imgs,
                    idx, captions, decode_lengths, embeddings=None):
        buf = img_cache.insert(buf, fresh_slots, fresh_imgs)
        per_sample, preds = step(encoder, decoder, img_cache.gather(buf, idx), captions,
                                 decode_lengths, embeddings)
        return per_sample, preds, buf

    return jax.jit(cached_step, donate_argnums=2)


def evaluate(args, encoder, decoder, batch_size=64, use_bert=False):
    """Teacher-forced eval (reference: models/attention.py:454-567),
    batched on device, equivalent to the reference batch-1 loop to f32
    tolerance (the restructured decoder forward — pre-folded LSTM
    biases, split emb/context input matmuls, packed h-matmul, post-scan
    fc — changes f32 accumulation order, so equality is tolerance-level
    rather than bitwise; tests pin the tolerance).

    ``use_bert`` makes teacher forcing use BERT caption embeddings, like
    the reference's pickled decoder module does automatically at eval
    (its forward checks ``self.use_bert``, attention.py:242-247; eval.py
    reads the flag from our checkpoint's config instead)."""
    # Fail fast on a missing METEOR runtime before burning the decode
    # loop (get_eval_score only runs after it) — library callers get the
    # same startup probe the eval CLI does.
    probe_meteor()
    dataset = COCODataset("val", caption_max_len=args.max_caption_length)
    vocab = dataset.vocab
    special = {vocab(START_TOKEN), vocab(END_TOKEN), vocab(PAD_TOKEN)}

    bert_embedder = None
    if use_bert:
        import os as _os

        from ..models.bert_embed import BertCaptionEmbedder

        # Eval is a PARITY surface: default to the host torch forward
        # like the reference (device JaxBert's MXU matmuls truncate f32
        # operands to bf16, which can flip near-tie argmax preds in the
        # teacher-forced hypotheses). ICD_TPU_BERT_DEVICE=1 opts into
        # the fast device path when bit-parity doesn't matter.
        bert_embedder = BertCaptionEmbedder(
            vocab, device=bool(_os.environ.get("ICD_TPU_BERT_DEVICE")))

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
        # Producer thread: pad, run host-side BERT embedding (when
        # enabled), and ship device inputs while the device computes
        # the previous batch.
        for batch in iter(loader):
            # Batch-1 semantics: each sample's decode length is its own
            # caption length - 1 (no padding exists at batch 1).
            imgs, captions, lengths, valid = pad_batch_to(
                (batch["imgs"], batch["captions"],
                 batch["caption_lengths"]), batch_size)
            # True per-sample lengths strip '<pad>' words from the BERT
            # texts: the reference evals at batch 1 where no padding
            # exists, and BERT is bidirectional, so pad words would
            # perturb every real position's embedding (see
            # BertCaptionEmbedder.__call__).
            embeddings = (bert_embedder(np.asarray(captions),
                                        lengths=np.asarray(lengths))
                          if bert_embedder is not None else None)
            if img_cache is not None:
                # Val items carry no img_id; the image path is the
                # identity key (pad rows repeat the last sample's).
                ids = list(batch["img_paths"])
                ids += [ids[-1]] * (batch_size - valid)
                fb = img_cache.rewrite(Batch(imgs=imgs, img_ids=ids))
                imgs = (jax.device_put(fb["fresh_slots"]),
                        jax.device_put(fb["fresh_imgs"]),
                        jax.device_put(fb["idx"]))
            else:
                imgs = jax.device_put(imgs)
            yield (imgs, jax.device_put(captions),
                   jax.device_put((lengths - 1).astype(np.int32)),
                   embeddings, valid, batch)

    def _drain(pending, batch_idx):
        per_sample, preds, valid, batch = pending
        per_sample = np.asarray(per_sample)[:valid]
        preds = np.asarray(preds)[:valid]

        for j in range(valid):
            loss_val = float(per_sample[j])
            losses.append(loss_val)
            decode_len = int(batch["caption_lengths"][j]) - 1
            accum_loss.update(loss_val, decode_len)

            target = batch["captions"][j][1: 1 + decode_len]
            cleaned = [int(w) for w in target if int(w) not in special]
            references.append([cleaned] * len(target))
            pred = preds[j][:decode_len]
            hypotheses.append(
                [int(w) for w in pred if int(w) not in special])

        assert len(hypotheses) == len(references)
        # The reference prints the running loss unconditionally each
        # batch, in addition to the print_freq line (attention.py:557).
        print("loss: {}".format(accum_loss.avg()))
        if batch_idx % args.print_freq == 0:
            print("Batch {}/{}, Loss {:.4f}".format(
                batch_idx + 1, num_batches, accum_loss.avg()))

    pending = None
    for batch_idx, (imgs, captions, dec_lens, embeddings, valid,
                    batch) in enumerate(host_prefetch(_staged(), size=2)):
        if img_cache is not None:
            fresh_slots, fresh_imgs, idx = imgs
            per_sample, preds, buf = step(
                encoder, decoder, buf, fresh_slots, fresh_imgs, idx,
                captions, dec_lens, embeddings)
        else:
            per_sample, preds = step(encoder, decoder, imgs, captions,
                                     dec_lens, embeddings)
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
