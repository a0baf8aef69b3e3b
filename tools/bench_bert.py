"""--use_bert training-loop throughput: inline vs overlapped host BERT.

The reference computes BERT embeddings inside the train step, per
caption, on the host (reference: models/attention.py:166-215) — its hot
loop. Ours batches the BERT forward and (round 2) runs it on the
device_prefetch producer thread so host BERT compute overlaps the
device step (icd_tpu/training/attention.py train loop).

This bench isolates that overlap: a full-size random-weight
bert-base-uncased-shaped BertModel (compute-representative; weights
don't matter for throughput) embeds fresh batches of captions while the
jitted attention train step runs on the TPU, loss fetched every step
exactly like the train loop. Prints host-BERT-only, device-step-only,
inline-loop, and overlapped-loop times.

Run: python tools/bench_bert.py [--steps N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
CAP_LEN = 16
N_WORDS = 2000
STEPS = 12


def _make_vocab_and_bert():
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    from icd_tpu.vocabulary import (
        END_TOKEN, PAD_TOKEN, START_TOKEN, UNK_TOKEN, Vocabulary)

    vocab = Vocabulary()
    vocab.add_word(PAD_TOKEN)
    words = ["w{}".format(i) for i in range(N_WORDS)]
    for w in words:
        vocab.add_word(w)
    vocab.add_word(START_TOKEN)
    vocab.add_word(END_TOKEN)
    vocab.add_word(UNK_TOKEN)

    # Wordpiece vocab that splits each 'w123' into pieces -> exercises
    # the alignment path like real wordpieces do.
    pieces = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "w", "<", ">",
               "start", "end", "pad", "unk"]
              + ["##{}".format(d) for d in "0123456789"])
    import tempfile

    vp = os.path.join(tempfile.mkdtemp(), "vocab.txt")
    with open(vp, "w") as f:
        f.write("\n".join(pieces))
    tokenizer = BertTokenizer(vp, do_lower_case=True)
    torch.manual_seed(0)
    # bert-base-uncased geometry, random weights: same host FLOPs.
    config = BertConfig(vocab_size=len(pieces))
    model = BertModel(config).eval()
    return vocab, model, tokenizer


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import icd_tpu.training.attention as ta
    from icd_tpu.data.pipeline import device_prefetch
    from icd_tpu.models.attention import (
        AttentionDecoderParams, init_attention_decoder)
    from icd_tpu.models.bert_embed import BertCaptionEmbedder
    from icd_tpu.models.encoder import (
        init_encoder_attention, trainable_mask)
    from icd_tpu.training.common import partition

    steps = STEPS
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    vocab, bert, tokenizer = _make_vocab_and_bert()
    embedder = BertCaptionEmbedder(vocab, model=bert, tokenizer=tokenizer,
                                   cache_size=1)  # defeat memoization
    embedder_dev = BertCaptionEmbedder(
        vocab, model=bert, tokenizer=tokenizer, cache_size=1, device=True)
    embedder_int8 = BertCaptionEmbedder(
        vocab, model=bert, tokenizer=tokenizer, cache_size=1, device=True,
        int8=True)

    ap = AttentionDecoderParams()
    ap.embed_size = 768
    ap.vocab = vocab
    encoder = init_encoder_attention(jax.random.PRNGKey(0))
    decoder = init_attention_decoder(jax.random.PRNGKey(1), ap)
    mask = {
        "encoder": trainable_mask(encoder, fine_tune=False, head=False),
        "decoder": jax.tree_util.tree_map(lambda _: True, decoder),
    }
    mask["decoder"]["embedding"] = False
    trainable, frozen = partition(
        {"encoder": encoder, "decoder": decoder}, mask)
    tx = optax.adam(1e-4)
    opt_state = tx.init(trainable)
    att_step = jax.jit(ta.make_train_step(
        mask, tx, alpha_c=1.0, dropout_rate=0.5))
    att_step_amp = jax.jit(ta.make_train_step(
        mask, tx, alpha_c=1.0, dropout_rate=0.5,
        compute_dtype=jnp.bfloat16))

    # Per-run random inputs: identical (executable, args) dispatches can
    # be replay-served across PROCESSES (CLAUDE.md), so a re-run with
    # fixed seeds would read ~0 ms device steps.
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    host_batches = []
    for i in range(steps):
        imgs = rng.integers(0, 255, (BATCH, 224, 224, 3), np.uint8)
        caps = np.concatenate(
            [np.full((BATCH, 1), len(vocab) - 3),
             rng.integers(1, N_WORDS, (BATCH, CAP_LEN - 2)),
             np.full((BATCH, 1), len(vocab) - 2)], axis=1).astype(np.int32)
        host_batches.append({"imgs": imgs, "captions": caps})
    decode_lengths = jnp.full((BATCH,), CAP_LEN - 1, jnp.int32)
    key = jax.random.PRNGKey(
        int.from_bytes(os.urandom(2), "little"))

    def run_step(state, b, emb):
        t, f, o = state
        t, f, o, loss = att_step(
            t, f, o, key, jnp.asarray(b["imgs"]),
            jnp.asarray(b["captions"]), decode_lengths,
            jnp.asarray(emb))
        return (t, f, o), float(loss)  # per-step fetch (reference-style)

    def run_step_drained(state, b, emb, pending, step_fn=None):
        # The real train loop drains loss scalars in blocks of 16 via
        # LossDrain (training/common.py, ~2.8 ms/step amortized vs
        # 28.9 ms per-step fetch through the tunnel); mirror that for
        # the overlapped rows so they measure the loop as shipped.
        t, f, o = state
        t, f, o, loss = (step_fn or att_step)(
            t, f, o, key, jnp.asarray(b["imgs"]),
            jnp.asarray(b["captions"]), decode_lengths,
            jnp.asarray(emb))
        pending.append(loss)
        if len(pending) >= 16:
            jax.device_get(pending)
            pending.clear()
        return (t, f, o)

    # Warmup / compile.
    emb0 = embedder(host_batches[0]["captions"])
    state = (trainable, frozen, opt_state)
    state, _ = run_step(state, host_batches[0], emb0)

    def with_bert_gen(it, emb):
        # The train loop's producer shape: embedder runs on the
        # device_prefetch producer thread.
        for b in it:
            b = dict(b)
            b["embeddings"] = emb(b["captions"])
            yield b

    if "--decompose" in sys.argv:
        # Per-component floor decomposition of the overlapped+devBERT
        # step (VERDICT r4 #2): what one host core + the tunnel + the
        # chip each contribute to the measured ~94 ms/step.
        from icd_tpu.utils.benchmarking import tunnel_timer

        salt_base, roundtrip = tunnel_timer()

        # (1) Host string work: tokenize + piece->word segment walk +
        # batch assembly, per-WORD memo warm (steady state of a real
        # epoch), caption-level cache defeated per batch.
        for b in host_batches:  # warm the word memo once
            keys = [tuple(int(t) for t in row) for row in b["captions"]]
            embedder_dev._tokenize_rows(keys)
            embedder_dev._cache.clear()
        assembled = []
        t0 = time.perf_counter()
        for b in host_batches:
            keys = [tuple(int(t) for t in row) for row in b["captions"]]
            rows = embedder_dev._tokenize_rows(keys)
            n_words = b["captions"].shape[1] + 1
            max_len = max(len(ids) for ids, _ in rows)
            ids = np.zeros((len(rows), max_len), np.int32)
            attn = np.zeros((len(rows), max_len), np.int32)
            seg = np.full((len(rows), max_len), -1, np.int32)
            for i, (row_ids, row_seg) in enumerate(rows):
                ids[i, : len(row_ids)] = row_ids
                attn[i, : len(row_ids)] = 1
                seg[i, : len(row_ids)] = row_seg
            embedder_dev._cache.clear()
            assembled.append((ids, attn, seg, n_words))
        tok_t = (time.perf_counter() - t0) / steps

        # (2) Device BERT forward + aligned segment-sum: dispatch with
        # the pre-assembled int arrays, fetch one element. Two warm
        # calls off the clock (fresh-program first-execution trap).
        jb = embedder_dev.jax_bert
        for _ in range(2):
            np.asarray(jb.aligned(*assembled[0])[0, 0, 0])
        t0 = time.perf_counter()
        for a in assembled:
            np.asarray(jb.aligned(*a)[0, 0, 0])
        bert_fwd_t = (time.perf_counter() - t0) / steps - roundtrip

        # (3) Image batch ship: device_put of the (B,224,224,3) uint8
        # batch through the tunnel, synced by a 1-element fetch.
        x = jax.device_put(host_batches[0]["imgs"])
        np.asarray(x[0, 0, 0, 0])  # compile the gather off the clock
        t0 = time.perf_counter()
        for b in host_batches:
            np.asarray(jax.device_put(b["imgs"])[0, 0, 0, 0])
        ship_t = (time.perf_counter() - t0) / steps - roundtrip

        # (4) Device attention train step with EVERYTHING resident:
        # inputs pre-placed, losses drained once at the end — the
        # consumer thread's pure device cost at pipelined dispatch.
        resident = []
        for b, a in zip(host_batches, assembled):
            resident.append((jax.device_put(b["imgs"]),
                             jax.device_put(b["captions"]),
                             jb.aligned(*a)))
        jax.device_get(resident[-1][2][0, 0, 0])  # sync placements
        pend = []
        for _ in range(2):  # warm
            state = run_step_drained(
                state, {"imgs": resident[0][0],
                        "captions": resident[0][1]},
                resident[0][2], pend)
        jax.device_get(pend); pend.clear()
        t0 = time.perf_counter()
        for imgs_d, caps_d, emb_d in resident:
            state = run_step_drained(
                state, {"imgs": imgs_d, "captions": caps_d}, emb_d, pend)
        jax.device_get(pend); pend.clear()
        step_res_t = (time.perf_counter() - t0) / steps

        # (5) The shipped overlapped loop, same session, for the
        # accounting denominator.
        embedder_dev._cache.clear()
        pend = []
        t0 = time.perf_counter()
        for b in device_prefetch(
                with_bert_gen(iter(host_batches), embedder_dev), size=2):
            state = run_step_drained(state, b, b["embeddings"], pend)
        jax.device_get(pend); pend.clear()
        loop_t = (time.perf_counter() - t0) / steps

        producer = tok_t + bert_fwd_t + ship_t
        print("roundtrip:            %6.1f ms" % (roundtrip * 1e3))
        print("tokenize+align+pack:  %6.1f ms/batch (host, word memo "
              "warm)" % (tok_t * 1e3))
        print("device BERT fwd:      %6.1f ms/batch (dispatch+exec, "
              "roundtrip-subtracted)" % (bert_fwd_t * 1e3))
        print("image batch ship:     %6.1f ms/batch (%.1f MB uint8 -> "
              "%.1f MB/s)" % (ship_t * 1e3,
                              host_batches[0]["imgs"].nbytes / 1e6,
                              host_batches[0]["imgs"].nbytes / 1e6
                              / max(ship_t, 1e-9)))
        print("device step resident: %6.1f ms/step (all inputs "
              "pre-placed)" % (step_res_t * 1e3))
        print("producer-thread sum:  %6.1f ms/batch (tok + bert fwd + "
              "ship)" % (producer * 1e3))
        print("overlapped loop:      %6.1f ms/step (%.0f captions/s) "
              "vs max(producer, consumer) = %.1f"
              % (loop_t * 1e3, BATCH / loop_t,
                 max(producer, step_res_t) * 1e3))
        return

    skip_host = "--skip-host" in sys.argv  # quick re-measure of the
    # device rows only; the host-torch rows are ~10 min of the run and
    # stable session to session.

    # Host BERT alone. Clear the cache first: warmup left batch 0's
    # embeddings resident, which would make the first iteration free
    # and understate the per-batch cost by 1/steps.
    bert_t = float("nan")
    if not skip_host:
        embedder._cache.clear()
        t0 = time.perf_counter()
        for b in host_batches:
            embedder(b["captions"])
        bert_t = (time.perf_counter() - t0) / steps

    # Device (JaxBert) embedder alone. The device path returns a device
    # array with NO fetch, and block_until_ready does not wait for
    # remote execution (CLAUDE.md) — fetch one element per call to time
    # dispatch + execution without shipping the (B, T, 768) result.
    np.asarray(embedder_dev(host_batches[0]["captions"])[0, 0, 0])
    embedder_dev._cache.clear()
    t0 = time.perf_counter()
    for b in host_batches:
        np.asarray(embedder_dev(b["captions"])[0, 0, 0])
    bert_dev_t = (time.perf_counter() - t0) / steps

    # Device step alone (reusing one embedding).
    t0 = time.perf_counter()
    for b in host_batches:
        state, _ = run_step(state, b, emb0)
    step_t = (time.perf_counter() - t0) / steps

    # Inline (reference-style critical path).
    inline_t = float("nan")
    if not skip_host:
        embedder._cache.clear()
        t0 = time.perf_counter()
        for b in host_batches:
            state, _ = run_step(state, b, embedder(b["captions"]))
        inline_t = (time.perf_counter() - t0) / steps

    # Overlapped (the train loop's shape: embedder on the prefetch
    # producer thread).
    with_bert = with_bert_gen

    overlap_t = float("nan")
    if not skip_host:
        embedder._cache.clear()
        t0 = time.perf_counter()
        for b in device_prefetch(with_bert(iter(host_batches), embedder),
                                 size=2):
            state, _ = run_step(state, b, b["embeddings"])
        overlap_t = (time.perf_counter() - t0) / steps

    # Overlapped with the device-resident BERT (the train-loop default).
    # Caption-level cache cleared (fresh captions every batch, like a
    # real epoch); the per-WORD wordpiece memo is deliberately LEFT warm
    # after the first pass — its keyspace is the vocabulary, so in a
    # real epoch it saturates within the first few hundred batches and
    # steady state is dict lookups (bert_embed._word_pieces).
    embedder_dev._cache.clear()
    pending = []
    t0 = time.perf_counter()
    for b in device_prefetch(with_bert(iter(host_batches), embedder_dev),
                             size=2):
        state = run_step_drained(state, b, b["embeddings"], pending)
    jax.device_get(pending); pending.clear()
    overlap_dev_t = (time.perf_counter() - t0) / steps

    # Same loop, W8A8 int8 device BERT (ICD_TPU_BERT_INT8 path).
    # Two fetched warm calls off the clock: the first execution of a
    # fresh program through the tunnel can read ~40% slow (CLAUDE.md),
    # and an unfetched warm execution may still be in flight when the
    # timer starts.
    for _ in range(2):
        state, warm_loss = run_step(
            state, host_batches[0],
            embedder_int8(host_batches[0]["captions"]))
        jax.device_get(warm_loss)
    embedder_int8._cache.clear()
    t0 = time.perf_counter()
    for b in device_prefetch(with_bert(iter(host_batches), embedder_int8),
                             size=2):
        state = run_step_drained(state, b, b["embeddings"], pending)
    jax.device_get(pending); pending.clear()
    overlap_int8_t = (time.perf_counter() - t0) / steps

    # Steady-state (epochs >= 2) row: the shipped train loop with
    # ICD_TPU_DEVICE_IMAGE_CACHE (training/attention.py:222-235) once
    # every image is HBM-resident — the producer ships only captions +
    # a (1, 150528) pad row and the step gathers pixels by index on
    # device (bit-identical losses, tests/test_device_image_cache.py).
    # At COCO scale epoch 1 populates the cache (82,783 uniques across
    # 12,942 batches), so this is the real per-step shape of every
    # subsequent `train.py --use_bert` epoch, not a synthetic best case.
    imgcache_t = float("nan")
    if "--imgcache" in sys.argv:
        from icd_tpu.data.pipeline import DeviceImageCache, host_prefetch

        cache = DeviceImageCache(1.0, (224, 224, 3), BATCH,
                                 max_images=steps * BATCH)

        def cached_step(t, f, o, buf, fresh_slots, fresh_imgs, idx,
                        captions, embeddings):
            buf = cache.insert(buf, fresh_slots, fresh_imgs)
            t, f, o, loss = att_step(
                t, f, o, key, cache.gather(buf, idx), captions,
                decode_lengths, embeddings)
            return t, f, o, loss, buf

        cached_fn = jax.jit(cached_step, donate_argnums=3)
        buf = cache.init_buffer()

        def fresh_caption_batches():
            out = []
            for i, b in enumerate(host_batches):
                caps = np.concatenate(
                    [np.full((BATCH, 1), len(vocab) - 3),
                     rng.integers(1, N_WORDS, (BATCH, CAP_LEN - 2)),
                     np.full((BATCH, 1), len(vocab) - 2)],
                    axis=1).astype(np.int32)
                out.append({"imgs": b["imgs"], "captions": caps,
                            "img_ids": list(range(i * BATCH,
                                                  (i + 1) * BATCH))})
            return out

        def cache_gen(batches):
            # Producer thread: BERT fwd dispatch + rewrite (host dict
            # lookups; all-hit batches slice one pad row).
            for b in with_bert(iter(batches), embedder_dev):
                yield cache.rewrite(b)

        def run_epoch(batches, buf, state):
            embedder_dev._cache.clear()
            pend = []
            t0 = time.perf_counter()
            for fb in host_prefetch(cache_gen(batches), size=2):
                t, f, o = state
                t, f, o, loss, buf = cached_fn(
                    t, f, o, buf, jnp.asarray(fb["fresh_slots"]),
                    jnp.asarray(fb["fresh_imgs"]),
                    jnp.asarray(fb["idx"]), jnp.asarray(fb["captions"]),
                    jnp.asarray(fb["embeddings"]))
                state = (t, f, o)
                pend.append(loss)
                if len(pend) >= 16:
                    jax.device_get(pend)
                    pend.clear()
            jax.device_get(pend)
            return state, buf, time.perf_counter() - t0

        # Epoch 1: populate (k=32 bucket compiles + every image ships).
        state, buf, _ = run_epoch(fresh_caption_batches(), buf, state)
        # Warm steady epoch off the clock: first all-hit batch compiles
        # the k=1 bucket program, and a fresh program's first execution
        # can read ~40% slow through the tunnel (CLAUDE.md).
        state, buf, _ = run_epoch(fresh_caption_batches(), buf, state)
        cache.hits = cache.misses = 0
        state, buf, wall = run_epoch(fresh_caption_batches(), buf, state)
        assert cache.misses == 0, "steady epoch should be all-hit"
        imgcache_t = wall / steps

    # Overlapped + device BERT + --amp train step (the TPU-extension
    # config: bf16 compute, f32 master weights — training/attention.py).
    emb_amp = embedder_dev(host_batches[0]["captions"])
    warm = []  # compile + two fetched warm executions off the clock
    for _ in range(2):
        state = run_step_drained(state, host_batches[0], emb_amp, warm,
                                 step_fn=att_step_amp)
    jax.device_get(warm)
    embedder_dev._cache.clear()
    t0 = time.perf_counter()
    for b in device_prefetch(with_bert(iter(host_batches), embedder_dev),
                             size=2):
        state = run_step_drained(state, b, b["embeddings"], pending,
                                 step_fn=att_step_amp)
    jax.device_get(pending); pending.clear()
    overlap_amp_t = (time.perf_counter() - t0) / steps

    print("host BERT alone:   %.1f ms/batch" % (bert_t * 1e3))
    print("device BERT alone: %.1f ms/batch (JaxBert, incl. roundtrip)"
          % (bert_dev_t * 1e3))
    print("device step alone: %.1f ms/step (incl. tunnel roundtrip)"
          % (step_t * 1e3))
    print("inline loop:       %.1f ms/step" % (inline_t * 1e3))
    print("overlapped loop:   %.1f ms/step (%.0f%% of inline)"
          % (overlap_t * 1e3, 100.0 * overlap_t / inline_t))
    print("overlapped+devBERT:%.1f ms/step (%.0f%% of inline, "
          "%.0f captions/s)"
          % (overlap_dev_t * 1e3, 100.0 * overlap_dev_t / inline_t,
             BATCH / overlap_dev_t))
    print("overlapped+devBERT int8: %.1f ms/step (%.0f%% of inline, "
          "%.0f captions/s)"
          % (overlap_int8_t * 1e3, 100.0 * overlap_int8_t / inline_t,
             BATCH / overlap_int8_t))
    print("overlapped+devBERT --amp: %.1f ms/step (%.0f%% of inline, "
          "%.0f captions/s)"
          % (overlap_amp_t * 1e3, 100.0 * overlap_amp_t / inline_t,
             BATCH / overlap_amp_t))
    if imgcache_t == imgcache_t:
        print("overlapped+devBERT imgcache steady epoch: %.1f ms/step "
              "(%.0f captions/s)"
              % (imgcache_t * 1e3, BATCH / imgcache_t))


if __name__ == "__main__":
    main()
