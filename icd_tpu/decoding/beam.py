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

The public wrapper ``attention_caption_image_beam_search`` keeps the
reference's return protocol: (seq, alphas, Caption_End).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..models.attention import decode_step, init_hidden_state

MAX_STEPS = 51  # reference: breaks when step > 50 (gen_captions.py:119)
NEG_INF = -1e9


@partial(jax.jit, static_argnames=("beam_size", "start_id", "end_id",
                                   "max_steps"))
def beam_search(decoder_params, encoder_out, beam_size, start_id, end_id,
                max_steps=MAX_STEPS):
    """Beam-search decode one image's encoder grid.

    Args:
        encoder_out: (P, D) flattened pixel grid for ONE image.
        beam_size: k.

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
    enc = jnp.broadcast_to(encoder_out, (k,) + encoder_out.shape)
    att = decoder_params["attention"]
    att_enc = enc @ att["enc_att"]["w"] + att["enc_att"]["b"]
    vocab_size = decoder_params["fc"]["w"].shape[1]

    h, c = init_hidden_state(decoder_params, enc)

    seqs = jnp.full((k, max_steps + 1), end_id, jnp.int32)
    seqs = seqs.at[:, 0].set(start_id)
    alphas = jnp.zeros((k, max_steps + 1, p), jnp.float32)
    alphas = alphas.at[:, 0, :].set(1.0)  # seqs_alpha init (line 53)

    state = dict(
        step=jnp.asarray(1, jnp.int32),
        k_active=jnp.asarray(k, jnp.int32),
        prev_words=jnp.full((k,), start_id, jnp.int32),
        cum_scores=jnp.zeros((k,), jnp.float32),
        seqs=seqs,
        alphas=alphas,
        h=h, c=c,
        best_score=jnp.asarray(NEG_INF, jnp.float32),
        best_seq=seqs[0],
        best_alpha=alphas[0],
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
        new_h, new_c, logits, alpha = decode_step(
            decoder_params, enc, att_enc, emb, s["h"], s["c"])
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
        sel_alphas = s["alphas"][prev_idx].at[:, step, :].set(
            alpha[prev_idx])
        sel_scores = jnp.where(sel_valid, top_scores, NEG_INF)

        finishing = sel_valid & (next_words == end_id)

        # Fold this step's completions into the running best.
        comp_scores = jnp.where(finishing, sel_scores, NEG_INF)
        comp_best = jnp.argmax(comp_scores)
        comp_score = comp_scores[comp_best]
        better = comp_score > s["best_score"]
        best_score = jnp.where(better, comp_score, s["best_score"])
        best_seq = jnp.where(better, sel_seqs[comp_best], s["best_seq"])
        best_alpha = jnp.where(
            better, sel_alphas[comp_best], s["best_alpha"])
        best_len = jnp.where(better, step + 1, s["best_len"])
        found = s["found"] | jnp.any(finishing)

        # Pack survivors (valid, not finishing) into the leading slots,
        # ordered by score like the reference's index lists.
        survivor = sel_valid & ~finishing
        order = jnp.argsort(
            jnp.where(survivor, sel_scores, NEG_INF))[::-1]
        return dict(
            step=step + 1,
            k_active=jnp.sum(survivor).astype(jnp.int32),
            prev_words=next_words[order],
            cum_scores=sel_scores[order],
            seqs=sel_seqs[order],
            alphas=sel_alphas[order],
            h=sel_h[order], c=sel_c[order],
            best_score=best_score, best_seq=best_seq,
            best_alpha=best_alpha, best_len=best_len, found=found,
        )

    final = jax.lax.while_loop(cond, body, state)

    # Failure protocol: [start, end] (gen_captions.py:123-126).
    fail_seq = jnp.full((max_steps + 1,), end_id, jnp.int32)
    fail_seq = fail_seq.at[0].set(start_id)
    seq = jnp.where(final["found"], final["best_seq"], fail_seq)
    seq_len = jnp.where(final["found"], final["best_len"], 2)
    return dict(seq=seq, seq_len=seq_len, alphas=final["best_alpha"],
                found=final["found"])


def beam_search_batched(decoder_params, encoder_grids, beam_size,
                        start_id, end_id, max_steps=MAX_STEPS):
    """vmap beam_search over a batch of (gh, gw, D) or (P, D) grids."""
    if encoder_grids.ndim == 4:
        b = encoder_grids.shape[0]
        encoder_grids = encoder_grids.reshape(
            b, -1, encoder_grids.shape[-1])
    return jax.vmap(
        lambda grid: beam_search(decoder_params, grid, beam_size,
                                 start_id, end_id, max_steps)
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
