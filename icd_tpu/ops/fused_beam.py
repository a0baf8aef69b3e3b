"""Pallas TPU kernel: the ENTIRE beam-search decode loop in one launch.

STATUS — experimental, measured SLOWER than the XLA loop at reference
serving shapes; kept as a correctness-proven testbed, NOT the serving
path. Measured on v5e (B=64, k=5, V=10k, 51 steps, decode only,
tools/bench_fused_beam.py): kernel 51.7 ms vs XLA while_loop 13.7 ms.
Phase ablation (ICD_TPU_FB_ABLATE): one-hot embedding matmul ~490
us/step (O(R*V*E) MXU work for what XLA serves as a gather), attention
~318 us/step (Mosaic lowers op-by-op and materializes every (kp, P, A)
/ (kp, P, D) intermediate in VMEM — XLA fuses the same chain into one
pass), matmul+logsumexp skeleton ~180 us/step, enc re-streaming DMA ~30
us/step (fully overlapped), top-k + beam bookkeeping ~0 (the exact
one-hot-matmul gather + iterative-max design costs nothing — the
reusable lesson). The VMEM-residency saving this kernel was built for
(weights + att_enc, ~38 MB/step = ~46 us/step of HBM) cannot cover
Mosaic's fusion deficit on V-sized elementwise pipelines, so the XLA
loop stays the serving path (beam.py), and this kernel documents the
boundary: hand-written multi-step decode pays off only when the
per-step math is matmul-shaped, not gather/softmax/top-k-shaped.

The XLA beam loop (icd_tpu/decoding/beam.py, reimplementing reference
gen_captions.py:16-131) costs ~300 us/step at serving shapes (B=64,
k=5, V=10k; tools/bench_beam_parts.py): every one of the 51 steps
re-reads the decoder weights (~25 MB) and the loop-invariant encoder
grid + attention projection (~64 MB) from HBM and pays fixed overhead
for ~30 fusions. This kernel runs ALL decode steps inside one
``pallas_call``:

 - decoder weights, embedding table and att_enc stay VMEM-RESIDENT
   across every timestep (impossible for XLA across scan iterations)
 - the encoder grid streams through a Pallas grid dimension
   (grid = (steps, n_chunks + 1)) so chunk DMA double-buffers against
   compute; the last grid cell per step runs the LSTM/fc/top-k/
   bookkeeping phases
 - flat top-k over (k, V) per image is 5 passes of
   max / first-index-select / mask — exactly ``lax.top_k``'s
   (value desc, index asc) order
 - beam-state gathers (h, c, seqs) are one-hot matmuls on the MXU
   (exact: one product per output element)
 - per-step attention maps are written out RAW (plus parent pointers);
   the winner's alpha trail is backtracked OUTSIDE the kernel, exactly
   like beam.py's append-only history design

Semantics mirror beam.py line by line (candidate masking constants,
step-1 row rule, survivor packing in top-k rank order like the
reference's incomplete_inds gather, running-best completion tracking,
51-step budget). Numerics differ from the XLA path only in
accumulation order (f32 state in-kernel), so near-tie beams can
occasionally diverge; the f32 interpret-mode differential test pins
full-output equality on random problems (tests/test_fused_beam.py).

Layout notes (v5e, 128 MB VMEM): beams are padded per image to
``kp = 8`` rows so every per-image row group is one aligned sublane
tile (Mosaic rejects dynamic sublane slices that are not 8-aligned);
pad slots carry masked state and can never enter candidacy. Rows
(R = B*kp) live on sublanes for every matmul; per-image (B, kp)
bookkeeping lives on lanes; the two layouts convert through tiny exact
one-hot matmuls (no Mosaic relayouts of big tensors). Attention
scores/alphas keep P on sublanes ((kp, P, 1) per image) so the softmax
and the weighted-sum reduce share a layout with the streamed enc chunk,
and the alpha history block is written at untiled indices only.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..decoding.beam import MAX_STEPS

# Comma-set of phase ablations for perf triage (bench-only; breaks
# semantics): natt (skip attention compute), ndma (don't re-stream enc),
# ntopk (skip the top-k passes), nbook (skip packing/bookkeeping),
# nphA (skip embedding/gate matmuls).
_ABLATE = frozenset(
    x for x in os.environ.get("ICD_TPU_FB_ABLATE", "").split(",") if x)

NEG_INF = -1e9  # candidate mask, matching beam.py
_DEAD = -3.0e38  # intra-top-k / pad-lane mask (below any candidate)

# The one-hot gather/permutation matmuls are EXACT arithmetic (ids, state
# shuffles), not numerics: at TPU-default precision the MXU truncates f32
# operands to bf16, which rounds any word id > 256 and re-rounds h/c every
# step (measured end-to-end: decode never emits <end> on a real
# checkpoint). HIGHEST restores full-f32 products; a no-op for bf16
# operands and for the CPU interpreter.
_EXACT = jax.lax.Precision.HIGHEST
_BIG_LANE = 4_000_000  # > any padded vocab lane id, f32-exact
_BIG_FLAT = 8_000_000  # > any flat candidate id, f32-exact


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(att_enc_ref, h0_ref, c0_ref, emb_ref, wd_ref, bd_ref, wf_ref,
            bf_ref, wg_ref, bg_ref, wi_ref, wh_ref, b_ref, wfc_ref, bfc_ref,
            enc_ref,
            # outputs
            alpha_out_ref, parent_out_ref, seq_out_ref, meta_out_ref,
            score_out_ref,
            # scratch
            h_ref, c_ref, words_ref, cum_ref, seqs_ref, ctx_ref, gate_ref,
            att_dec_ref, emb_cur_ref, onehot_ref, kact_ref, best_score_ref,
            best_len_ref, best_step_ref, best_parent_ref, found_ref,
            best_seq_ref,
            *, b, k, kp, p, p_real, d, a, h_dim, e, v, vp, s_len, nc, cb,
            start_id, end_id, cdtype):
    r = b * kp
    step_i = pl.program_id(0)  # 0-based; real step = step_i + 1
    c = pl.program_id(1)
    step = step_i + 1

    f32 = jnp.float32
    row_id = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    slot_of_row = row_id % kp  # pad slots k..kp-1 never enter candidacy
    # Static one-hot converters between row (R, 1) and image (B, kp)
    # layouts: E_b[r, b'] = [b' == r // kp], J[r, j] = [j == r % kp].
    eb = (jax.lax.broadcasted_iota(jnp.int32, (r, b), 1)
          == (row_id // kp)).astype(f32)
    jm = (jax.lax.broadcasted_iota(jnp.int32, (r, kp), 1)
          == slot_of_row).astype(f32)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (b, kp), 1)

    def rows_from_bk(y):  # (B, kp) f32 -> (R, 1), exact
        return jnp.sum(
            jax.lax.dot_general(eb, y.astype(f32), (((1,), (0,)), ((), ())),
                                preferred_element_type=f32,
                                precision=_EXACT) * jm,
            axis=1, keepdims=True)

    def bk_from_rows(x):  # (R, 1) f32 -> (B, kp), exact
        return jax.lax.dot_general(
            eb, x.astype(f32) * jm, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_EXACT)

    # ---- one-time state init ------------------------------------------
    @pl.when((step_i == 0) & (c == 0))
    def _init():
        h_ref[:] = h0_ref[:].astype(f32)
        c_ref[:] = c0_ref[:].astype(f32)
        words_ref[:] = jnp.full((r, 1), start_id, jnp.int32)
        cum_ref[:] = jnp.zeros((r, 1), f32)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (r, s_len), 1)
        seqs_ref[:] = jnp.where(lane_s == 0, float(start_id),
                                float(end_id)).astype(f32)
        kact_ref[:] = jnp.full((b, 1), k, jnp.int32)
        best_score_ref[:] = jnp.full((b, 1), NEG_INF, f32)
        best_len_ref[:] = jnp.full((b, 1), 2, jnp.int32)
        best_step_ref[:] = jnp.ones((b, 1), jnp.int32)
        best_parent_ref[:] = jnp.zeros((b, 1), jnp.int32)
        found_ref[:] = jnp.zeros((b, 1), jnp.int32)
        lane_sb = jax.lax.broadcasted_iota(jnp.int32, (b, s_len), 1)
        best_seq_ref[:] = jnp.where(lane_sb == 0, float(start_id),
                                    float(end_id)).astype(f32)

    active = jnp.any(kact_ref[:] > 0)

    # ---- phase A (c == 0): embeddings, att_dec, gate ------------------
    @pl.when(active & (c == 0))
    def _phase_a():
        if "nphA" in _ABLATE:
            return
        lane_v = jax.lax.broadcasted_iota(jnp.int32, (r, vp), 1)
        onehot_ref[:] = (lane_v == words_ref[:]).astype(cdtype)
        # XLA's gather is exact; bf16 operands already multiply exactly
        # on the MXU (and Mosaic rejects fp32 contract precision on bf16).
        emb_cur_ref[:] = jnp.dot(
            onehot_ref[:], emb_ref[:], preferred_element_type=f32,
            precision=_EXACT if cdtype == f32 else None).astype(cdtype)
        hc = h_ref[:].astype(cdtype)
        att_dec_ref[:] = (jnp.dot(hc, wd_ref[:], preferred_element_type=f32)
                          + bd_ref[:].astype(f32))
        gate_ref[:] = jax.nn.sigmoid(
            jnp.dot(hc, wg_ref[:], preferred_element_type=f32)
            + bg_ref[:].astype(f32))

    # ---- attention + context for this enc chunk (c < NC) --------------
    @pl.when(active & (c < nc))
    def _phase_b():
        if "natt" in _ABLATE:
            ctx_ref[pl.ds(c * cb * kp, cb * kp), :] = jnp.zeros(
                (cb * kp, d), f32)
            return
        wf_row = wf_ref[:].astype(f32)  # (A,)
        bf_scalar = bf_ref[:].astype(f32)[0]  # 32-bit scalar extract
        for i in range(cb):  # images within the chunk (static unroll)
            row0 = pl.multiple_of((c * cb + i) * kp, kp)
            enc_i = enc_ref[0, i]  # (P, D)
            att_enc_i = att_enc_ref[c * cb + i]  # (P, A)
            att_dec_i = att_dec_ref[pl.ds(row0, kp), :]  # (kp, A) f32
            act = jax.nn.relu(att_enc_i[None].astype(f32)
                              + att_dec_i[:, None, :])  # (kp, P, A)
            scores = (jnp.sum(act * wf_row, axis=2, keepdims=True)
                      + bf_scalar)  # (kp, P, 1)
            pix = jax.lax.broadcasted_iota(jnp.int32, (kp, p, 1), 1)
            scores = jnp.where(pix < p_real, scores, -jnp.inf)
            scores = scores - jnp.max(scores, axis=1, keepdims=True)
            num = jnp.exp(scores)
            alpha = num / jnp.sum(num, axis=1, keepdims=True)  # (kp, P, 1)
            ctx = jnp.sum(enc_i[None].astype(f32) * alpha, axis=1)
            ctx_ref[pl.ds(row0, kp), :] = ctx  # (kp, D)
            # Raw alpha history, (P, kp) per image at an untiled index;
            # gather + backtrack happen outside the kernel.
            alpha_out_ref[0, i] = jnp.concatenate(
                [alpha[j] for j in range(kp)], axis=1)

    # ---- phase C/D/E (c == NC): LSTM, fc, top-k, bookkeeping ----------
    @pl.when(active & (c == nc))
    def _phase_cde():
        hc = h_ref[:].astype(cdtype)
        x2 = (gate_ref[:] * ctx_ref[:]).astype(cdtype)
        gates = (jnp.dot(emb_cur_ref[:], wi_ref[0:e, :],
                         preferred_element_type=f32)
                 + jnp.dot(x2, wi_ref[e:e + d, :],
                           preferred_element_type=f32)
                 + jnp.dot(hc, wh_ref[:], preferred_element_type=f32)
                 + b_ref[:].astype(f32))  # (R, 4H)
        gi = jax.nn.sigmoid(gates[:, 0:h_dim])
        gf = jax.nn.sigmoid(gates[:, h_dim:2 * h_dim])
        gg = jnp.tanh(gates[:, 2 * h_dim:3 * h_dim])
        go = jax.nn.sigmoid(gates[:, 3 * h_dim:4 * h_dim])
        c_new = gf * c_ref[:] + gi * gg
        h_new = go * jnp.tanh(c_new)

        logits = (jnp.dot(h_new.astype(cdtype), wfc_ref[:],
                          preferred_element_type=f32)
                  + bfc_ref[:].astype(f32))  # (R, Vp)
        if cdtype == jnp.bfloat16:
            # The XLA serving path materializes bf16 logits before the
            # f32 log_softmax (models/attention.py decode_step) — match.
            logits = logits.astype(jnp.bfloat16).astype(f32)
        lane_v = jax.lax.broadcasted_iota(jnp.int32, (r, vp), 1)
        logits = jnp.where(lane_v < v, logits, NEG_INF)
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1,
                                  keepdims=True))
        ka_rows = rows_from_bk(
            jnp.broadcast_to(kact_ref[:].astype(f32), (b, kp)))
        first = step == 1
        # (no select between i1 vectors on Mosaic: compose logically)
        row_ok = jnp.logical_or(
            jnp.logical_and(first, slot_of_row == 0),
            jnp.logical_and(jnp.logical_not(first),
                            slot_of_row.astype(f32) < ka_rows))
        cand = jnp.where(row_ok & (lane_v < v),
                         (logits - lse) + cum_ref[:], NEG_INF)

        # -- flat top-k per image: k passes of lexicographic max --------
        top_scores = jnp.zeros((b, kp), f32)
        top_flat = jnp.zeros((b, kp), f32)
        if "ntopk" in _ABLATE:
            top_scores = top_scores - 1.0 + jnp.max(cand) * 1e-20
            top_flat = top_flat + lane_k.astype(f32)
        for j in range(k if "ntopk" not in _ABLATE else 0):
            m_row = jnp.max(cand, axis=1, keepdims=True)  # (R, 1)
            m_img = jnp.max(bk_from_rows(m_row), axis=1,
                            keepdims=True)  # (B, 1)
            m_rows = rows_from_bk(jnp.broadcast_to(m_img, (b, kp)))
            l_row = jnp.min(
                jnp.where(cand == m_rows, lane_v, _BIG_LANE),
                axis=1, keepdims=True)  # (R, 1) i32
            flat = jnp.where(
                l_row < _BIG_LANE,
                slot_of_row.astype(f32) * v + l_row.astype(f32),
                float(_BIG_FLAT))
            flat_min = jnp.min(bk_from_rows(flat), axis=1,
                               keepdims=True)  # (B, 1)
            top_scores = jnp.where(lane_k == j,
                                   jnp.broadcast_to(m_img, (b, kp)),
                                   top_scores)
            top_flat = jnp.where(lane_k == j,
                                 jnp.broadcast_to(flat_min, (b, kp)),
                                 top_flat)
            # mask the selected (row, lane) out of cand
            sel_slot = jnp.floor(flat_min / v)  # (B, 1)
            sel_lane = flat_min - sel_slot * v
            sel_rows = rows_from_bk(jnp.broadcast_to(sel_slot, (b, kp)))
            sel_lane_rows = rows_from_bk(
                jnp.broadcast_to(sel_lane, (b, kp)))
            hit = ((slot_of_row.astype(f32) == sel_rows)
                   & (lane_v.astype(f32) == sel_lane_rows))
            cand = jnp.where(hit, _DEAD, cand)

        if "nbook" in _ABLATE:
            h_ref[:] = h_new
            c_ref[:] = c_new
            cum_ref[:] = cum_ref[:] + jnp.max(top_scores) * 1e-20 - 0.01
            parent_out_ref[0] = jnp.zeros((r, 1), jnp.int32)
            return
        prev_r = jnp.floor(top_flat / v)  # (B, kp) parent slot
        next_w = top_flat - prev_r * v  # (B, kp) word id
        kact_f = kact_ref[:].astype(f32)
        sel_valid = lane_k.astype(f32) < jnp.broadcast_to(kact_f, (b, kp))
        sel_scores = jnp.where(sel_valid, top_scores, NEG_INF)
        finishing = sel_valid & (next_w == end_id)

        # -- completion -> running best (first-max tie break) -----------
        comp = jnp.where(finishing, sel_scores, NEG_INF)
        comp_score = jnp.max(comp, axis=1, keepdims=True)  # (B, 1)
        comp_best = jnp.min(jnp.where(comp == comp_score, lane_k, kp),
                            axis=1, keepdims=True)  # (B, 1)
        any_fin = jnp.any(finishing, axis=1, keepdims=True)
        better = any_fin & (comp_score > best_score_ref[:])
        oh_best = (lane_k == comp_best).astype(f32)  # (B, kp)
        parent_best = jnp.sum(oh_best * prev_r, axis=1,
                              keepdims=True)  # (B, 1)
        word_best = jnp.sum(oh_best * next_w, axis=1, keepdims=True)
        # candidate best sequence: seqs[parent] with column step set
        pg_best = (jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
                   .astype(f32) * kp + parent_best)
        g_best = (jax.lax.broadcasted_iota(jnp.int32, (b, r), 1)
                  .astype(f32) == pg_best).astype(f32)  # (B, R)
        seq_cand = jax.lax.dot_general(
            g_best, seqs_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_EXACT)  # (B, S)
        lane_sb = jax.lax.broadcasted_iota(jnp.int32, (b, s_len), 1)
        seq_cand = jnp.where(lane_sb == step, word_best, seq_cand)
        best_seq_ref[:] = jnp.where(better, seq_cand, best_seq_ref[:])
        best_score_ref[:] = jnp.where(better, comp_score,
                                      best_score_ref[:])
        best_len_ref[:] = jnp.where(better, step + 1, best_len_ref[:])
        best_step_ref[:] = jnp.where(better, step, best_step_ref[:])
        best_parent_ref[:] = jnp.where(
            better, parent_best.astype(jnp.int32), best_parent_ref[:])
        found_ref[:] = found_ref[:] | any_fin.astype(jnp.int32)

        # -- survivor packing: top-k RANK order, like beam.py and the
        # reference's incomplete_inds gather (survivors first in rank
        # order, then non-survivors). Rank keys are unique per lane, so
        # iterative min selection is exact with no tie handling.
        survivor = sel_valid & jnp.logical_not(finishing)
        kf = jnp.float32(k)
        keyv = jnp.where(
            survivor, lane_k.astype(f32),
            jnp.where(lane_k < k, lane_k.astype(f32) + kf, -_DEAD))
        order = jnp.zeros((b, kp), f32)
        for j in range(k):
            mj = jnp.min(keyv, axis=1, keepdims=True)  # (B, 1), unique
            lanej = jnp.where(mj >= kf, mj - kf, mj)
            order = jnp.where(lane_k == j,
                              jnp.broadcast_to(lanej, (b, kp)), order)
            keyv = jnp.where(keyv == mj, -_DEAD, keyv)

        def gather_lanes(x):  # x (B, kp); y[:, j] = x[b, order[b, j]]
            y = jnp.zeros((b, kp), f32)
            for j in range(k):
                idxj = jnp.sum(jnp.where(lane_k == j, order, 0.0),
                               axis=1, keepdims=True)
                val = jnp.sum(
                    jnp.where(lane_k.astype(f32) == idxj, x, 0.0),
                    axis=1, keepdims=True)
                y = jnp.where(lane_k == j, jnp.broadcast_to(val, (b, kp)),
                              y)
            return y

        next_w_ord = gather_lanes(next_w)
        score_ord = gather_lanes(jnp.where(sel_valid, top_scores,
                                           NEG_INF))
        prev_r_ord = gather_lanes(prev_r)
        img_base = (jax.lax.broadcasted_iota(jnp.int32, (b, kp), 0)
                    .astype(f32) * kp)
        pg_rows = rows_from_bk(img_base + prev_r_ord)  # (R, 1) f32

        # -- state permutation via exact one-hot matmuls ----------------
        lane_rr = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
        g = (lane_rr.astype(f32) == pg_rows).astype(f32)  # (R, R)
        h_ref[:] = jnp.dot(g, h_new, preferred_element_type=f32,
                           precision=_EXACT)
        c_ref[:] = jnp.dot(g, c_new, preferred_element_type=f32,
                           precision=_EXACT)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (r, s_len), 1)
        seqs_ref[:] = jnp.where(
            lane_s == step, rows_from_bk(next_w_ord),
            jnp.dot(g, seqs_ref[:], preferred_element_type=f32,
                    precision=_EXACT))
        words_ref[:] = rows_from_bk(next_w_ord).astype(jnp.int32)
        cum_ref[:] = rows_from_bk(score_ord)
        kact_ref[:] = jnp.sum(survivor.astype(jnp.int32), axis=1,
                              keepdims=True)
        parent_out_ref[0] = rows_from_bk(prev_r_ord).astype(jnp.int32)

    # ---- final outputs -------------------------------------------------
    @pl.when((step_i == pl.num_programs(0) - 1) & (c == nc))
    def _finalize():
        seq_out_ref[:] = best_seq_ref[:].astype(jnp.int32)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (b, 8), 1)
        meta = jnp.zeros((b, 8), jnp.int32)
        meta = jnp.where(lane8 == 0, best_len_ref[:], meta)
        meta = jnp.where(lane8 == 1, best_step_ref[:], meta)
        meta = jnp.where(lane8 == 2, best_parent_ref[:], meta)
        meta = jnp.where(lane8 == 3, found_ref[:], meta)
        meta = jnp.where(lane8 == 4, kact_ref[:], meta)
        meta_out_ref[:] = meta
        score_out_ref[:] = best_score_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("beam_size", "start_id", "end_id", "max_steps",
                     "chunk_images", "interpret"))
def beam_search_fused(decoder_params, encoder_grids, beam_size, start_id,
                      end_id, max_steps=MAX_STEPS, chunk_images=4,
                      interpret=False):
    """Drop-in for decoding.beam.beam_search_batched via the fused kernel.

    Args:
        encoder_grids: (B, gh, gw, D) or (B, P, D) encoder output.

    Returns the beam_search_batched dict: seq (B, S) int32, seq_len (B,),
    alphas (B, S, P), found (B,).
    """
    if encoder_grids.ndim == 4:
        bsz = encoder_grids.shape[0]
        encoder_grids = encoder_grids.reshape(
            bsz, -1, encoder_grids.shape[-1])
    k = beam_size
    kp = _round_up(k, 8)
    b, p_real, d = encoder_grids.shape
    cb = min(chunk_images, b)
    while b % cb:  # largest divisor <= chunk_images, any batch serves
        cb -= 1
    nc = b // cb
    att = decoder_params["attention"]
    a = att["enc_att"]["w"].shape[1]
    h_dim = decoder_params["lstm"]["wh"].shape[0]
    e = decoder_params["embedding"].shape[1]
    v = decoder_params["fc"]["w"].shape[1]
    vp = _round_up(v, 128)
    p = _round_up(p_real, 8)
    s_len = max_steps + 1
    r = b * kp
    cdtype = encoder_grids.dtype

    from ..models.attention import init_hidden_state

    att_enc = encoder_grids @ att["enc_att"]["w"] + att["enc_att"]["b"]
    h0, c0 = init_hidden_state(decoder_params, encoder_grids)
    h0 = jnp.repeat(h0, kp, axis=0)  # (R, H)
    c0 = jnp.repeat(c0, kp, axis=0)

    enc = encoder_grids
    if p != p_real:
        enc = jnp.pad(enc, ((0, 0), (0, p - p_real), (0, 0)))
        att_enc = jnp.pad(att_enc, ((0, 0), (0, p - p_real), (0, 0)))
    emb = decoder_params["embedding"]
    fc_w, fc_b = decoder_params["fc"]["w"], decoder_params["fc"]["b"]
    if vp != v:
        emb = jnp.pad(emb, ((0, vp - v), (0, 0)))
        fc_w = jnp.pad(fc_w, ((0, 0), (0, vp - v)))
        fc_b = jnp.pad(fc_b, ((0, vp - v),))
    lstm = decoder_params["lstm"]
    b_sum = (lstm["bi"] + lstm["bh"]).astype(jnp.float32)

    kern = functools.partial(
        _kernel, b=b, k=k, kp=kp, p=p, p_real=p_real, d=d, a=a,
        h_dim=h_dim, e=e, v=v, vp=vp, s_len=s_len, nc=nc, cb=cb,
        start_id=start_id, end_id=end_id, cdtype=cdtype)

    f32 = jnp.float32
    const = lambda *shape: pl.BlockSpec(
        shape, (lambda s, c: (0,) * len(shape)), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kern,
        grid=(max_steps, nc + 1),
        in_specs=[
            const(b, p, a),                    # att_enc (resident)
            const(r, h_dim), const(r, h_dim),  # h0, c0
            const(vp, e),                      # embedding
            const(h_dim, a), const(a,),        # wd, bd
            const(a,), const(1,),              # wf, bf
            const(h_dim, d), const(d,),        # wg, bg
            const(e + d, 4 * h_dim),           # wi
            const(h_dim, 4 * h_dim),           # wh
            const(4 * h_dim,),                 # b_sum
            const(h_dim, vp), const(vp,),      # wfc, bfc
            pl.BlockSpec((1, cb, p, d),
                         (lambda s, c: (0, 0, 0, 0)) if "ndma" in _ABLATE
                         else (lambda s, c: (0, jnp.minimum(c, nc - 1),
                                             0, 0)),
                         memory_space=pltpu.VMEM),  # enc chunk stream
        ],
        out_specs=[
            pl.BlockSpec((1, cb, p, kp),
                         lambda s, c: (s + 1, jnp.minimum(c, nc - 1), 0, 0),
                         memory_space=pltpu.VMEM),  # alpha (S, B, P, kp)
            pl.BlockSpec((1, r, 1), lambda s, c: (s + 1, 0, 0),
                         memory_space=pltpu.VMEM),  # parent (S, R, 1)
            const(b, s_len),                   # best_seq
            const(b, 8),                       # meta
            const(b, 1),                       # best_score
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_len, b, p, kp), f32),
            jax.ShapeDtypeStruct((s_len, r, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, s_len), jnp.int32),
            jax.ShapeDtypeStruct((b, 8), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, h_dim), f32),       # h
            pltpu.VMEM((r, h_dim), f32),       # c
            pltpu.VMEM((r, 1), jnp.int32),     # words
            pltpu.VMEM((r, 1), f32),           # cum
            pltpu.VMEM((r, s_len), f32),       # seqs
            pltpu.VMEM((r, d), f32),           # ctx
            pltpu.VMEM((r, d), f32),           # gate
            pltpu.VMEM((r, a), f32),           # att_dec
            pltpu.VMEM((r, e), cdtype),        # emb_cur
            pltpu.VMEM((r, vp), cdtype),       # onehot
            pltpu.VMEM((b, 1), jnp.int32),     # k_active
            pltpu.VMEM((b, 1), f32),           # best_score
            pltpu.VMEM((b, 1), jnp.int32),     # best_len
            pltpu.VMEM((b, 1), jnp.int32),     # best_step
            pltpu.VMEM((b, 1), jnp.int32),     # best_parent
            pltpu.VMEM((b, 1), jnp.int32),     # found
            pltpu.VMEM((b, s_len), f32),       # best_seq
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(att_enc, h0, c0, emb,
      att["dec_att"]["w"], att["dec_att"]["b"],
      att["full_att"]["w"][:, 0], att["full_att"]["b"],
      decoder_params["f_beta"]["w"], decoder_params["f_beta"]["b"],
      lstm["wi"], lstm["wh"], b_sum, fc_w, fc_b,
      enc[None])

    alpha_hist4, parent_hist, best_seq, meta, _ = outs
    # (S, B, P, kp) -> (S, B, kp, P) raw per-step alphas.
    alpha_hist = alpha_hist4.transpose(0, 1, 3, 2)[..., :p_real]
    parent_hist = parent_hist.reshape(s_len, b, kp)
    best_len = meta[:, 0]
    best_step = meta[:, 1]
    best_parent = meta[:, 2]
    found = meta[:, 3] > 0

    # Backtrack the winner's alpha trail (beam.py's post-loop scan, with
    # raw-alpha indexing: the alpha emitted at step s by packed slot j is
    # alpha_raw[s, parent_hist[s, j]]).
    def one_image(alpha_raw, parents, bstep, bparent, fnd):
        def back(slot, s_):
            use = s_ < bstep
            new_slot = jnp.where(use, parents[s_, slot], slot)
            row = jnp.where(use, alpha_raw[s_, new_slot],
                            jnp.zeros((p_real,), f32))
            return new_slot, row

        s_desc = jnp.arange(max_steps, 0, -1)
        _, rows = jax.lax.scan(back, bparent, s_desc)
        alphas = jnp.zeros((s_len, p_real), f32)
        alphas = alphas.at[0].set(1.0)
        alphas = alphas.at[s_desc].set(rows)
        # When no caption completed, beam.py's best_last_alpha keeps its
        # all-ones INIT value in row best_step (=1) — reproduce that.
        last = jnp.where(fnd, alpha_raw[bstep, bparent],
                         jnp.ones((p_real,), f32))
        alphas = alphas.at[bstep].set(last)
        return alphas

    alphas = jax.vmap(one_image, in_axes=(1, 1, 0, 0, 0))(
        alpha_hist, parent_hist, best_step, best_parent, found)

    fail_seq = jnp.full((s_len,), end_id, jnp.int32).at[0].set(start_id)
    seq = jnp.where(found[:, None], best_seq, fail_seq[None])
    seq_len = jnp.where(found, best_len, 2)
    return dict(seq=seq, seq_len=seq_len, alphas=alphas, found=found)
