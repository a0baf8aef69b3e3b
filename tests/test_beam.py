"""Beam search equivalence vs a literal dynamic-k re-implementation of
the reference algorithm (gen_captions.py:16-131), plus greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icd_tpu.decoding.beam import beam_search, beam_search_batched
from icd_tpu.decoding.greedy import greedy_decode_baseline
from icd_tpu.models.attention import (
    AttentionDecoderParams, decode_step, init_attention_decoder,
    init_hidden_state)
from icd_tpu.models.lstm import lstm_cell


class FakeVocab:
    def __init__(self, n):
        self.w2i = {str(i): i for i in range(n)}
        self.i2w = {i: str(i) for i in range(n)}

    def __len__(self):
        return len(self.w2i)


ENC, V, P = 12, 17, 9
START, END = V - 3, V - 2


def _params(seed, end_bias=0.0):
    p = AttentionDecoderParams()
    p.attention_dim = 8
    p.decoder_dim = 10
    p.embed_size = 6
    p.vocab = FakeVocab(V)
    params = init_attention_decoder(
        jax.random.PRNGKey(seed), p, encoder_dim=ENC)
    if end_bias:
        params["fc"]["b"] = params["fc"]["b"].at[END].add(end_bias)
    return params


def reference_beam_search(params, enc_grid, k, max_check=50):
    """Literal dynamic-k control flow of gen_captions.py:16-131 (numpy
    orchestration, our decode_step as the math)."""
    enc = jnp.broadcast_to(enc_grid, (k,) + enc_grid.shape)
    att = params["attention"]
    att_enc = enc @ att["enc_att"]["w"] + att["enc_att"]["b"]
    h, c = init_hidden_state(params, enc)
    h, c = np.asarray(h), np.asarray(c)
    enc_np = np.asarray(enc)
    att_np = np.asarray(att_enc)

    k_prev = np.full((k,), START, np.int64)
    seqs = [[START] for _ in range(k)]
    top_scores = np.zeros((k,))
    complete, complete_scores = [], []
    step = 1
    while True:
        s = len(k_prev)
        emb = params["embedding"][jnp.asarray(k_prev)]
        nh, nc, logits, _ = decode_step(
            params, jnp.asarray(enc_np[:s]), jnp.asarray(att_np[:s]),
            emb, jnp.asarray(h[:s]), jnp.asarray(c[:s]))
        logprobs = np.asarray(jax.nn.log_softmax(logits, axis=1))
        scores = top_scores[:, None] + logprobs
        # Stable DESCENDING top-k (ties keep ascending index), matching
        # torch.topk / lax.top_k; np.argsort(flat)[::-1] would reverse
        # equal-valued entries and diverge from the reference on ties.
        if step == 1:
            flat = scores[0]
            top_idx = np.argsort(-flat, kind="stable")[:k]
            top_vals = flat[top_idx]
            prev_inds = np.zeros(k, np.int64)
            next_words = top_idx
        else:
            flat = scores.reshape(-1)
            top_idx = np.argsort(-flat, kind="stable")[:s]
            top_vals = flat[top_idx]
            prev_inds = top_idx // V
            next_words = top_idx % V
        seqs = [seqs[p] + [int(w)] for p, w in zip(prev_inds, next_words)]
        incomplete = [i for i, w in enumerate(next_words) if w != END]
        comp = [i for i in range(len(next_words)) if i not in incomplete]
        for i in comp:
            complete.append(seqs[i])
            complete_scores.append(top_vals[i])
        kk = len(incomplete)
        if kk == 0:
            break
        seqs = [seqs[i] for i in incomplete]
        h = np.asarray(nh)[prev_inds[incomplete]]
        c = np.asarray(nc)[prev_inds[incomplete]]
        enc_np = enc_np[:kk]
        att_np = att_np[:kk]
        top_scores = top_vals[incomplete]
        k_prev = next_words[incomplete]
        if step > max_check:
            break
        step += 1

    if not complete:
        return None, None, False
    best = int(np.argmax(complete_scores))
    return complete[best], float(complete_scores[best]), True


@pytest.mark.parametrize("seed,end_bias,k", [
    (0, 3.0, 3), (1, 2.0, 5), (2, 4.0, 2), (5, 1.5, 4)])
def test_beam_matches_reference_algorithm(seed, end_bias, k):
    params = _params(seed, end_bias)
    grid = jax.random.normal(jax.random.PRNGKey(100 + seed), (P, ENC))
    ref_seq, ref_score, ref_found = reference_beam_search(params, grid, k)
    out = beam_search(params, grid, k, START, END)
    assert bool(out["found"]) == ref_found
    if ref_found:
        n = int(out["seq_len"])
        ours = [int(t) for t in np.asarray(out["seq"])[:n]]
        assert ours == ref_seq, (ours, ref_seq)


@pytest.mark.parametrize("seed,end_bias,k", [(0, 3.0, 3), (1, 2.0, 5)])
def test_beam_alphas_match_sequence_replay(seed, end_bias, k):
    """A beam's hidden-state path depends only on its own token history,
    so replaying the winning tokens through decode_step must reproduce
    the backtracked alpha trail exactly."""
    params = _params(seed, end_bias)
    grid = jax.random.normal(jax.random.PRNGKey(200 + seed), (P, ENC))
    out = beam_search(params, grid, k, START, END)
    assert bool(out["found"])
    n = int(out["seq_len"])
    seq = [int(t) for t in np.asarray(out["seq"])[:n]]
    alphas = np.asarray(out["alphas"])

    att = params["attention"]
    att_enc = grid @ att["enc_att"]["w"] + att["enc_att"]["b"]
    h, c = init_hidden_state(params, grid[None])
    np.testing.assert_array_equal(alphas[0], np.ones(P))
    for t in range(1, n):
        emb = params["embedding"][jnp.asarray([seq[t - 1]])]
        h, c, _, alpha = decode_step(
            params, grid[None], att_enc[None], emb, h, c)
        np.testing.assert_allclose(alphas[t], np.asarray(alpha[0]),
                                   rtol=1e-6, atol=1e-6)
    # Rows past the winner's end stay zeroed.
    if n <= out["alphas"].shape[0] - 1:
        np.testing.assert_array_equal(alphas[n:], 0.0)


def test_beam_no_completion():
    params = _params(3, end_bias=-50.0)  # end never selected
    grid = jax.random.normal(jax.random.PRNGKey(7), (P, ENC))
    out = beam_search(params, grid, 3, START, END)
    assert not bool(out["found"])
    seq = np.asarray(out["seq"])
    assert seq[0] == START and seq[1] == END  # failure protocol


def test_beam_batched():
    params = _params(0, end_bias=3.0)
    grids = jax.random.normal(jax.random.PRNGKey(9), (4, 3, 3, ENC))
    out = beam_search_batched(params, grids, 3, START, END)
    assert out["seq"].shape[0] == 4
    single = beam_search(params, grids.reshape(4, -1, ENC)[0], 3,
                         START, END)
    np.testing.assert_array_equal(
        np.asarray(out["seq"][0]), np.asarray(single["seq"]))


def test_greedy_matches_stepwise():
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)

    p = BaselineDecoderParams()
    p.vocab_size = V
    p.embed_size = 6
    p.hidden_size = 8
    d = init_baseline_decoder(jax.random.PRNGKey(0), p)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 6))
    toks = np.asarray(greedy_decode_baseline(d, feats, START, END,
                                             max_len=10))

    # Stepwise python reference.
    h = jnp.zeros((2, 8))
    c = jnp.zeros((2, 8))
    h, c = lstm_cell(d["lstm"], feats, h, c)
    expected = []
    tok = jnp.argmax(h @ d["linear"]["w"] + d["linear"]["b"], axis=-1)
    expected.append(np.asarray(tok))
    for _ in range(9):
        h, c = lstm_cell(d["lstm"], d["embedding"][tok], h, c)
        nxt = jnp.argmax(h @ d["linear"]["w"] + d["linear"]["b"], axis=-1)
        done = np.asarray(expected).T
        finished = (done == END).any(axis=1)
        nxt = jnp.where(jnp.asarray(finished), END, nxt)
        expected.append(np.asarray(nxt))
        tok = nxt
    np.testing.assert_array_equal(toks, np.asarray(expected).T)


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 4), (2, 5)])
def test_beam_matches_reference_on_exact_ties(seed, k):
    """Exact-tie pin: groups of words share identical fc columns,
    biases, AND embeddings, so candidate scores collide bitwise at every
    step. Pins found/seq agreement with the literal reference control
    flow under heavy ties. Note the survivor-packing tie order itself
    (top-k RANK order, beam.py) is justified by direct correspondence to
    the reference's incomplete_inds gather (gen_captions.py:103-116);
    constructions where a reversed packing changes the FINAL caption
    require a completion routed through a surviving tied pair and were
    not reachable in this harness — this test guards the surrounding
    tie plumbing (stable top-k, completion argmax, twin-beam futures)."""
    params = _params(seed, end_bias=2.0)
    w, b, emb = (params["fc"]["w"], params["fc"]["b"],
                 params["embedding"])
    # Biased ABOVE the rest so the tied groups actually occupy beam
    # slots (otherwise end/other words win and no tie is observable).
    for grp, bias in [((3, 4, 5, 6), 3.0), ((8, 9, 10), 2.8)]:
        idx = jnp.asarray(grp)
        w = w.at[:, idx].set(w[:, grp[0]][:, None])
        b = b.at[idx].set(b[grp[0]] + bias)
        emb = emb.at[idx].set(emb[grp[0]])
    params["fc"]["w"], params["fc"]["b"] = w, b
    params["embedding"] = emb

    grid = jax.random.normal(jax.random.PRNGKey(300 + seed), (P, ENC))
    ref_seq, ref_score, ref_found = reference_beam_search(
        params, grid, k)
    out = beam_search(params, grid, k, START, END)
    assert bool(out["found"]) == ref_found
    if ref_found:
        n = int(out["seq_len"])
        ours = [int(t) for t in np.asarray(out["seq"])[:n]]
        assert ours == ref_seq, (ours, ref_seq)
        np.testing.assert_allclose(float(out["best_score"])
                                   if "best_score" in out else ref_score,
                                   ref_score, rtol=1e-6)
