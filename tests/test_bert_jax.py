"""JAX BERT encoder differentials vs transformers' torch BertModel."""

import numpy as np
import pytest
import torch

from icd_tpu.models.bert_jax import (
    JaxBert, bert_encoder_forward, bert_from_torch)

import jax


@pytest.fixture(scope="module")
def torch_bert():
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    config = BertConfig(
        vocab_size=43, hidden_size=24, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=64)
    return BertModel(config).eval()


def _torch_hidden(model, ids, attn):
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                    attention_mask=torch.from_numpy(attn.astype(np.int64)))
    return out.last_hidden_state.numpy()


def test_forward_matches_torch_full_mask(torch_bert):
    params, cfg = bert_from_torch(torch_bert)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 43, (3, 11)).astype(np.int32)
    attn = np.ones((3, 11), np.int32)
    ref = _torch_hidden(torch_bert, ids, attn)
    import jax.numpy as jnp

    ours = bert_encoder_forward(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(ids),
        jnp.asarray(attn), num_heads=cfg["num_heads"],
        ln_eps=cfg["ln_eps"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_forward_matches_torch_with_padding(torch_bert):
    """Padded positions are masked out of attention; valid rows match."""
    params, cfg = bert_from_torch(torch_bert)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 43, (2, 9)).astype(np.int32)
    attn = np.ones((2, 9), np.int32)
    attn[0, 6:] = 0
    attn[1, 4:] = 0
    ids[attn == 0] = 0
    ref = _torch_hidden(torch_bert, ids, attn)
    import jax.numpy as jnp

    ours = np.asarray(bert_encoder_forward(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(ids),
        jnp.asarray(attn), num_heads=cfg["num_heads"],
        ln_eps=cfg["ln_eps"]))
    np.testing.assert_allclose(ours[0, :6], ref[0, :6], atol=2e-5)
    np.testing.assert_allclose(ours[1, :4], ref[1, :4], atol=2e-5)


def test_jaxbert_bucketing_invariant(torch_bert):
    """Bucket padding must not change the unpadded rows' embeddings."""
    jb = JaxBert(torch_bert, bucket=16)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 43, (2, 7)).astype(np.int32)
    attn = np.ones((2, 7), np.int32)
    out7 = jb(ids, attn)
    assert out7.shape == (2, 7, 24)
    ref = _torch_hidden(torch_bert, ids, attn)
    np.testing.assert_allclose(out7, ref, atol=2e-5)


def test_int8_forward_close_to_f32(torch_bert):
    """W8A8 BERT (quantize_bert_params + _apply_lin dispatch) tracks the
    f32 forward: per-output-channel int8 weights + dynamic per-row
    activation quant keep the hidden states within quantization noise.
    The bound is loose by design (int8 IS lossy); what the test pins is
    that the q/dq plumbing is wired to the right scales — a transposed
    scale or dropped bias blows past it by orders of magnitude."""
    import jax.numpy as jnp

    from icd_tpu.models.bert_jax import quantize_bert_params

    params, cfg = bert_from_torch(torch_bert)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 43, (3, 11)).astype(np.int32)
    attn = np.ones((3, 11), np.int32)
    f32 = np.asarray(bert_encoder_forward(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(ids),
        jnp.asarray(attn), num_heads=cfg["num_heads"],
        ln_eps=cfg["ln_eps"]))
    q = np.asarray(bert_encoder_forward(
        jax.tree_util.tree_map(jnp.asarray, quantize_bert_params(params)),
        jnp.asarray(ids), jnp.asarray(attn), num_heads=cfg["num_heads"],
        ln_eps=cfg["ln_eps"]))
    assert q.dtype == np.float32
    err = np.abs(q - f32).max()
    scale = np.abs(f32).max()
    assert err < 0.05 * scale, (err, scale)
    # Cosine similarity per position stays near 1.
    dots = (q * f32).sum(-1)
    norms = np.linalg.norm(q, axis=-1) * np.linalg.norm(f32, axis=-1)
    assert (dots / norms).min() > 0.999


def test_embedder_int8_device_close_to_host(torch_bert):
    """BertCaptionEmbedder(device=True, int8=True) end-to-end: aligned
    embeddings stay within int8 noise of the torch host path."""
    from icd_tpu.models.bert_embed import BertCaptionEmbedder
    from icd_tpu.vocabulary import (
        END_TOKEN, PAD_TOKEN, START_TOKEN, UNK_TOKEN, Vocabulary)
    from transformers import BertTokenizer
    import os
    import tempfile

    wordpieces = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "man", "rid",
                  "##ing", "horse", "<", "start", "end", "pad", "unk",
                  ">"]
    vp = os.path.join(tempfile.mkdtemp(), "vocab.txt")
    with open(vp, "w") as f:
        f.write("\n".join(wordpieces))
    tokenizer = BertTokenizer(vp, do_lower_case=True)
    v = Vocabulary()
    v.add_word(PAD_TOKEN)
    for w in ["a", "man", "riding", "horse"]:
        v.add_word(w)
    v.add_word(START_TOKEN)
    v.add_word(END_TOKEN)
    v.add_word(UNK_TOKEN)
    captions = np.asarray(
        [[v(START_TOKEN), v("a"), v("man"), v("riding"), v("horse"),
          v(END_TOKEN)]], np.int32)
    host = BertCaptionEmbedder(v, model=torch_bert, tokenizer=tokenizer)
    dev8 = BertCaptionEmbedder(v, model=torch_bert, tokenizer=tokenizer,
                               device=True, int8=True)
    a = np.asarray(dev8(captions))
    b = host(captions)
    assert np.abs(a - b).max() < 0.05 * np.abs(b).max()


def test_embedder_device_equals_host(torch_bert):
    """BertCaptionEmbedder(device=True) produces the same aligned
    embeddings as the torch host path."""
    from icd_tpu.models.bert_embed import BertCaptionEmbedder
    from icd_tpu.vocabulary import (
        END_TOKEN, PAD_TOKEN, START_TOKEN, UNK_TOKEN, Vocabulary)
    from transformers import BertTokenizer

    wordpieces = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "man", "rid",
                  "##ing", "horse", "on", "the", "beach", ".", "<",
                  "start", "end", "pad", "unk", ">"]
    import tempfile, os

    vp = os.path.join(tempfile.mkdtemp(), "vocab.txt")
    with open(vp, "w") as f:
        f.write("\n".join(wordpieces))
    # Reuse the module torch_bert but with a tokenizer over this vocab
    # (ids stay within the model's 43-token table).
    tokenizer = BertTokenizer(vp, do_lower_case=True)

    v = Vocabulary()
    v.add_word(PAD_TOKEN)
    for w in ["a", "man", "riding", "horse", "on", "the", "beach", "."]:
        v.add_word(w)
    v.add_word(START_TOKEN)
    v.add_word(END_TOKEN)
    v.add_word(UNK_TOKEN)

    captions = np.asarray(
        [[v(START_TOKEN), v("a"), v("man"), v("riding"), v("horse"),
          v(END_TOKEN)],
         [v(START_TOKEN), v("the"), v("horse"), v("on"), v("beach"),
          v(END_TOKEN)]], np.int32)

    host = BertCaptionEmbedder(v, model=torch_bert, tokenizer=tokenizer)
    dev = BertCaptionEmbedder(v, model=torch_bert, tokenizer=tokenizer,
                              device=True)
    np.testing.assert_allclose(dev(captions), host(captions), atol=3e-5)


def test_aligned_n_words_bucketed_no_recompile(torch_bert):
    """aligned() buckets n_words: nearby caption lengths must reuse one
    compiled program (raw per-batch maxima would recompile the whole
    encoder per distinct length), and the sliced output must equal the
    segment-sum at the exact length."""
    jb = JaxBert(torch_bert, bucket=16)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 43, (2, 9)).astype(np.int32)
    attn = np.ones((2, 9), np.int32)
    seg = np.tile(np.arange(9, dtype=np.int32), (2, 1))

    outs = {}
    for n_words in (9, 10, 12):
        outs[n_words] = np.asarray(jb.aligned(ids, attn, seg, n_words))
        assert outs[n_words].shape == (2, n_words, 24)
    assert jb._fwd_aligned._cache_size() == 1
    # Shared rows identical across bucketed calls; rows past the pieces
    # are zero (no segment routes there).
    np.testing.assert_array_equal(outs[12][:, :9], outs[9])
    np.testing.assert_array_equal(outs[12][:, 9:], 0.0)
    # Sliced output matches the torch-side expectation: per-piece
    # identity segments make aligned == hidden states.
    ref = _torch_hidden(torch_bert, ids, attn)
    np.testing.assert_allclose(outs[9], ref, atol=2e-5)
