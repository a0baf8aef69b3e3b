"""Differential tests: fused Pallas beam kernel vs the XLA beam loop.

The kernel (ops/fused_beam.py) reimplements beam.py's while-loop body —
candidate masking, lax.top_k tie order, survivor packing, running-best
completion tracking, alpha backtrack protocol — so a full-output
equality differential on random problems (f32, interpret mode) is the
correctness bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icd_tpu.decoding.beam import beam_search_batched
from icd_tpu.models.attention import (AttentionDecoderParams,
                                      init_attention_decoder)
from icd_tpu.ops.fused_beam import beam_search_fused


def _make(vocab, att_dim, dec_dim, emb_dim, enc_dim, seed=1):
    class Cfg(AttentionDecoderParams):
        pass

    # (class bodies can't see enclosing-function locals)
    Cfg.attention_dim = att_dim
    Cfg.decoder_dim = dec_dim
    Cfg.embed_size = emb_dim
    Cfg.vocab = list(range(vocab))
    return init_attention_decoder(jax.random.PRNGKey(seed), Cfg(),
                                  encoder_dim=enc_dim)


# One deliberately small problem (CI budget: the cost here is the
# interpret-mode trace + XLA-loop compile, not execution — the kernel
# is a documented negative result kept as a testbed, NOTES.md). Multi-
# cell grids (b > chunk) stay covered; the fallback-chunking and
# failure-protocol paths share one compile below.
@pytest.mark.parametrize("seed,b,k,p,chunk", [(0, 4, 5, 16, 2)])
def test_fused_beam_matches_xla_loop(seed, b, k, p, chunk):
    v, d = 40, 64
    dec = _make(v, 24, 32, 16, d, seed=seed)
    grids = jax.random.normal(jax.random.PRNGKey(seed + 10),
                              (b, p, d)) * 0.5
    max_steps = 7
    ref = beam_search_batched(dec, grids, k, v - 3, v - 2,
                              max_steps=max_steps)
    out = beam_search_fused(dec, grids, k, v - 3, v - 2,
                            max_steps=max_steps, chunk_images=chunk,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["seq"]),
                                  np.asarray(out["seq"]))
    np.testing.assert_array_equal(np.asarray(ref["seq_len"]),
                                  np.asarray(out["seq_len"]))
    np.testing.assert_array_equal(np.asarray(ref["found"]),
                                  np.asarray(out["found"]))
    np.testing.assert_allclose(np.asarray(ref["alphas"]),
                               np.asarray(out["alphas"]),
                               rtol=0, atol=5e-6)


def test_fused_beam_fallback_chunk_and_failure_protocol():
    """One compile covers two edge paths: chunk_images that doesn't
    divide the batch falls back to the largest divisor (b=6, chunk=4 ->
    cb=3), and a decoder whose <end> is unreachable exercises the
    no-beam-finishes [start, end] protocol on every image."""
    v, d, b, k, p = 24, 32, 6, 3, 8
    dec = _make(v, 16, 16, 8, d, seed=5)
    # Make <end> unreachable: huge negative fc bias on the end token.
    dec["fc"]["b"] = dec["fc"]["b"].at[v - 2].set(-1e9)
    grids = jax.random.normal(jax.random.PRNGKey(6), (b, p, d)) * 0.5
    ref = beam_search_batched(dec, grids, k, v - 3, v - 2, max_steps=5)
    out = beam_search_fused(dec, grids, k, v - 3, v - 2, max_steps=5,
                            chunk_images=4, interpret=True)
    assert not np.asarray(out["found"]).any()
    np.testing.assert_array_equal(np.asarray(ref["seq"]),
                                  np.asarray(out["seq"]))
    np.testing.assert_array_equal(np.asarray(ref["seq_len"]),
                                  np.asarray(out["seq_len"]))
    np.testing.assert_array_equal(np.asarray(out["seq_len"]),
                                  np.full((b,), 2))
