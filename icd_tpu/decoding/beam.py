"""Beam-search caption generation, fully on device.

Reimplements the reference's dynamic-k beam search
(reference: gen_captions.py:16-131) as a fixed-shape
``lax.while_loop`` so it compiles once and runs entirely on TPU:

 - the active beam count shrinks as beams emit <end>
   (gen_captions.py:93-116); here every slot persists but retired slots
   carry -inf scores and a packing argsort keeps the live beams in the
   first ``k_active`` slots, so the flat top-k selection sees exactly
   the candidates the reference's shrinking loop sees
 - completed sequences go to a running best (the reference keeps a list
   and takes the max score at the end, gen_captions.py:123-127 — only
   the argmax is observable, so a running max is equivalent)
 - per-step attention maps are tracked for visualization
   (gen_captions.py:54, 89)
 - the step budget is 51 iterations, matching the reference's
   ``step > 50`` break placement (gen_captions.py:119-121)
 - next-word embeddings come from the learned table even for
   BERT-trained checkpoints, exactly like the reference
   (gen_captions.py:65 uses ``decoder.embedding`` unconditionally and
   :19 notes the bert model "sometimes doesn't converge" under it)

The public wrapper ``attention_caption_image_beam_search`` keeps the
reference's return protocol: (seq, alphas, Caption_End).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..models.attention import decode_step, init_hidden_state

MAX_STEPS = 51  # reference: breaks when step > 50 (gen_captions.py:119)
NEG_INF = -1e9


def _quantize_sym(x, axes):
    """Symmetric per-tensor int8 quantization over ``axes``."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


@partial(jax.jit, static_argnames=("beam_size", "start_id", "end_id",
                                   "max_steps", "int8_grid"))
def beam_search(decoder_params, encoder_out, beam_size, start_id, end_id,
                max_steps=MAX_STEPS, int8_grid=False):
    """Beam-search decode one image's encoder grid.

    Args:
        encoder_out: (P, D) flattened pixel grid for ONE image.
        beam_size: k.
        int8_grid: keep the loop-invariant encoder grid and its attention
            projection as per-image symmetric int8 in HBM and dequantize
            inside the loop body (the convert fuses into each consumer).
            These two tensors are the decode loop's dominant HBM read
            (~51 + 13 MB/step at batch 64 in bf16); int8 cuts that 4x.
            Off by default: captions can differ from the f32/bf16 path
            on near-tie beams (reference parity keeps exact math).

    Returns dict with:
        seq: (max_steps + 1,) int32 best complete sequence, starting with
            start_id; padded with end_id.
        seq_len: scalar int32 true length of seq (incl. start and end).
        alphas: (max_steps + 1, P) attention maps aligned to seq (row 0
            is the reference's initial all-ones map, gen_captions.py:53).
        found: scalar bool — Caption_End.
    """
    k = beam_size
    p = encoder_out.shape[0]
    att = decoder_params["attention"]
    # Keep the grid and its attention projection UNbroadcast: all k beams
    # share one image, and soft_attention broadcasts (P, ...) against the
    # (k, ...) decoder side inside fused elementwise ops — carrying
    # per-beam copies through the while loop costs k x the HBM reads
    # every step (measured 64 MB/step at batch 64, k=5).
    att_enc = encoder_out @ att["enc_att"]["w"] + att["enc_att"]["b"]
    vocab_size = decoder_params["fc"]["w"].shape[1]
    grid_dtype = encoder_out.dtype
    if int8_grid:
        enc_q, enc_s = _quantize_sym(encoder_out, axes=(0, 1))
        att_q, att_s = _quantize_sym(att_enc, axes=(0, 1))

    h, c = init_hidden_state(
        decoder_params,
        jnp.broadcast_to(encoder_out, (k,) + encoder_out.shape))

    seqs = jnp.full((k, max_steps + 1), end_id, jnp.int32)
    seqs = seqs.at[:, 0].set(start_id)
    # Attention maps are NOT carried per-beam through the loop (gathering
    # and re-packing a (k, steps, P) f32 history every iteration was the
    # beam loop's dominant HBM cost, ~100 MB/step at batch 64). Instead
    # each step appends one (k, P) row + one (k,) parent-pointer row, and
    # the winner's alpha trail is reconstructed by backtracking after the
    # loop. alpha_hist[s, j] = attention emitted at step s by the beam
    # packed into slot j; parent_hist[s, j] = that beam's packed slot at
    # step s-1.
    alpha_hist = jnp.zeros((max_steps + 1, k, p), jnp.float32)
    parent_hist = jnp.zeros((max_steps + 1, k), jnp.int32)

    state = dict(
        step=jnp.asarray(1, jnp.int32),
        k_active=jnp.asarray(k, jnp.int32),
        prev_words=jnp.full((k,), start_id, jnp.int32),
        cum_scores=jnp.zeros((k,), jnp.float32),
        seqs=seqs,
        alpha_hist=alpha_hist,
        parent_hist=parent_hist,
        h=h, c=c,
        best_score=jnp.asarray(NEG_INF, jnp.float32),
        best_seq=seqs[0],
        best_step=jnp.asarray(1, jnp.int32),
        best_parent=jnp.asarray(0, jnp.int32),
        best_last_alpha=jnp.ones((p,), jnp.float32),
        best_len=jnp.asarray(2, jnp.int32),
        found=jnp.asarray(False),
    )

    def cond(s):
        return (s["k_active"] > 0) & (s["step"] <= max_steps)

    def body(s):
        step = s["step"]
        slot_ids = jnp.arange(k)
        active = slot_ids < s["k_active"]

        emb = decoder_params["embedding"][s["prev_words"]]
        if int8_grid:
            # Dequantize INSIDE the body: the int8 tensors are what lives
            # in HBM across steps; the converts fuse into their single
            # consumers (weighted-sum reduce / act elementwise chain).
            # Multiply in f32 (int8 * f32 scale promotes) and round the
            # product once to grid_dtype — casting the scale itself to
            # bf16 first would add ~0.4% scale-rounding error on top of
            # the int8 noise floor.
            enc_t = (enc_q * enc_s).astype(grid_dtype)
            att_t = (att_q * att_s).astype(grid_dtype)
        else:
            enc_t, att_t = encoder_out, att_enc
        new_h, new_c, logits, alpha = decode_step(
            decoder_params, enc_t, att_t, emb, s["h"], s["c"])
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
        cand = s["cum_scores"][:, None] + logprobs  # (k, V)

        # Step 1: all beams identical; the reference expands only row 0
        # (gen_captions.py:79-82). Masking rows 1.. to -inf reproduces it.
        first = step == 1
        row_ok = jnp.where(first, slot_ids == 0, active)
        cand = jnp.where(row_ok[:, None], cand, NEG_INF)

        flat = cand.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        prev_idx = top_idx // vocab_size
        next_words = (top_idx % vocab_size).astype(jnp.int32)
        # Only the first k_active selections exist in the reference's
        # shrinking top-k (k on step 1 since row 0 offers V >= k options).
        sel_valid = slot_ids < jnp.where(first, k, s["k_active"])

        # Gather beam state for the selections.
        sel_h = new_h[prev_idx]
        sel_c = new_c[prev_idx]
        sel_seqs = s["seqs"][prev_idx].at[:, step].set(next_words)
        sel_scores = jnp.where(sel_valid, top_scores, NEG_INF)

        finishing = sel_valid & (next_words == end_id)

        # Fold this step's completions into the running best; the alpha
        # trail is represented by (step, parent slot, last row) and
        # reconstructed after the loop.
        comp_scores = jnp.where(finishing, sel_scores, NEG_INF)
        comp_best = jnp.argmax(comp_scores)
        comp_score = comp_scores[comp_best]
        better = comp_score > s["best_score"]
        best_score = jnp.where(better, comp_score, s["best_score"])
        best_seq = jnp.where(better, sel_seqs[comp_best], s["best_seq"])
        best_step = jnp.where(better, step, s["best_step"])
        best_parent = jnp.where(
            better, prev_idx[comp_best], s["best_parent"])
        best_last_alpha = jnp.where(
            better, alpha[prev_idx[comp_best]].astype(jnp.float32),
            s["best_last_alpha"])
        best_len = jnp.where(better, step + 1, s["best_len"])
        found = s["found"] | jnp.any(finishing)

        # Pack survivors (valid, not finishing) into the leading slots in
        # their TOP-K RANK order, exactly the reference's index lists
        # (gen_captions.py:103-116 gathers by incomplete_inds, which
        # preserves rank order). Rank order equals descending score with
        # ties kept in rank order; sorting by score and reversing would
        # flip equal-scored beams (argsort is stable ascending, so the
        # [::-1] flips ties) and diverge from the reference on exact-tie
        # checkpoints. Rank keys are unique, so this argsort is exact.
        survivor = sel_valid & ~finishing
        order = jnp.argsort(jnp.where(survivor, slot_ids, k + slot_ids))
        sel_parents = prev_idx[order]
        alpha_hist = jax.lax.dynamic_update_index_in_dim(
            s["alpha_hist"], alpha[sel_parents].astype(jnp.float32),
            step, 0)
        parent_hist = jax.lax.dynamic_update_index_in_dim(
            s["parent_hist"], sel_parents, step, 0)
        return dict(
            step=step + 1,
            k_active=jnp.sum(survivor).astype(jnp.int32),
            prev_words=next_words[order],
            cum_scores=sel_scores[order],
            seqs=sel_seqs[order],
            alpha_hist=alpha_hist,
            parent_hist=parent_hist,
            h=sel_h[order], c=sel_c[order],
            best_score=best_score, best_seq=best_seq,
            best_step=best_step, best_parent=best_parent,
            best_last_alpha=best_last_alpha,
            best_len=best_len, found=found,
        )

    final = jax.lax.while_loop(cond, body, state)

    # Backtrack the winner's alpha trail: ancestor packed slot at step
    # s-1 is parent_hist[s, slot_at_s]; rows walk from best_step-1 down
    # to 1, row best_step is best_last_alpha, row 0 is the reference's
    # all-ones init map (gen_captions.py:53).
    best_step = final["best_step"]

    def back(slot, s_):
        use = s_ < best_step
        row = jnp.where(use, final["alpha_hist"][s_, slot],
                        jnp.zeros((p,), jnp.float32))
        new_slot = jnp.where(use, final["parent_hist"][s_, slot], slot)
        return new_slot, row

    s_desc = jnp.arange(max_steps, 0, -1)
    _, rows = jax.lax.scan(back, final["best_parent"], s_desc)
    alphas = jnp.zeros((max_steps + 1, p), jnp.float32)
    alphas = alphas.at[0].set(1.0)
    alphas = alphas.at[s_desc].set(rows)
    alphas = alphas.at[best_step].set(final["best_last_alpha"])

    # Failure protocol: [start, end] (gen_captions.py:123-126).
    fail_seq = jnp.full((max_steps + 1,), end_id, jnp.int32)
    fail_seq = fail_seq.at[0].set(start_id)
    seq = jnp.where(final["found"], final["best_seq"], fail_seq)
    seq_len = jnp.where(final["found"], final["best_len"], 2)
    return dict(seq=seq, seq_len=seq_len, alphas=alphas,
                found=final["found"])


def beam_search_batched(decoder_params, encoder_grids, beam_size,
                        start_id, end_id, max_steps=MAX_STEPS,
                        int8_grid=False):
    """vmap beam_search over a batch of (gh, gw, D) or (P, D) grids."""
    if encoder_grids.ndim == 4:
        b = encoder_grids.shape[0]
        encoder_grids = encoder_grids.reshape(
            b, -1, encoder_grids.shape[-1])
    return jax.vmap(
        lambda grid: beam_search(decoder_params, grid, beam_size,
                                 start_id, end_id, max_steps,
                                 int8_grid=int8_grid)
    )(encoder_grids)


def attention_caption_image_beam_search(args, img, encoder_params,
                                        decoder_params, vocab):
    """Reference-protocol wrapper (gen_captions.py:16-131).

    Args:
        img: (1, H, W, 3) image (uint8 or float NHWC). uint8 input is
            scaled /255 WITHOUT ImageNet mean/std, reproducing the
            reference beam path's loader quirk (gen_captions.py:133-143
            leaves the normalization commented out); float input is fed
            as-is.

    Returns:
        (seq list, alphas list of (gh, gw) maps, Caption_End bool).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..models.encoder import encoder_attention_forward
    from ..ops.image import scale_only
    from ..vocabulary import END_TOKEN, START_TOKEN

    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        img = scale_only(img)
    grid, _ = encoder_attention_forward(encoder_params, img, train=False)
    gh, gw = grid.shape[1], grid.shape[2]
    flat = grid.reshape(1, -1, grid.shape[-1])[0]
    out = beam_search(
        decoder_params, flat, args.beam_size,
        start_id=vocab(START_TOKEN), end_id=vocab(END_TOKEN))
    found = bool(out["found"])
    if not found:
        return [vocab(START_TOKEN), vocab(END_TOKEN)], [], False
    n = int(out["seq_len"])
    seq = [int(t) for t in np.asarray(out["seq"])[:n]]
    alphas = [np.asarray(a).reshape(gh, gw)
              for a in np.asarray(out["alphas"])[:n]]
    return seq, alphas, True
