"""Static-calibration int8 backbone: BN folding, calibration, serving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icd_tpu.models.resnet import (
    batch_norm, conv2d, init_resnet, resnet_forward)
from icd_tpu.models.resnet_int8 import (
    N_SITES_RESNET101, _qconv, calibrate_act_maxes,
    collect_conv_input_maxes, quantize_resnet, resnet_int8_forward)


def _jitter_bn(params, seed=1):
    """Give BN nontrivial stats so folding is actually exercised."""
    k = [seed]
    for blocks in params["layers"]:
        for b in blocks:
            for name in b:
                if not (name.startswith("bn") or name == "downsample"):
                    continue
                bn = b[name]["bn"] if name == "downsample" else b[name]
                c = bn["mean"].shape[0]
                kk = jax.random.PRNGKey(k[0])
                k[0] += 1
                bn["mean"] = jax.random.normal(kk, (c,)) * 0.1
                bn["var"] = jnp.ones((c,)) + jax.random.uniform(kk, (c,)) * .5
                bn["scale"] = 1 + jax.random.normal(kk, (c,)) * 0.1
                bn["bias"] = jax.random.normal(kk, (c,)) * 0.05
    return params


def test_qconv_matches_conv_plus_bn():
    """The folded site reproduces batch_norm(conv2d(x, w)) in eval mode."""
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 10, 10, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
    bn = {
        "scale": 1 + jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.2,
        "bias": jax.random.normal(jax.random.PRNGKey(3), (16,)) * 0.1,
        "mean": jax.random.normal(jax.random.PRNGKey(4), (16,)) * 0.1,
        "var": jnp.ones((16,)) + jax.random.uniform(
            jax.random.PRNGKey(5), (16,)),
    }
    ref, _ = batch_norm(conv2d(x, w, stride=1, padding=1), bn, train=False)

    from icd_tpu.models.resnet_int8 import _quantize_site
    site = _quantize_site(w, bn, float(jnp.max(jnp.abs(x))))
    out = _qconv(x, site, stride=1, padding=1)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_site_count_and_order_resnet101_shape():
    """Calibration emits one scale per conv site; quantize consumes all."""
    params = init_resnet(jax.random.PRNGKey(0), (2, 2), (4, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    maxes = collect_conv_input_maxes(params, x, compute_dtype=jnp.float32)
    # 1 stem + 4 blocks * 3 convs + 2 downsamples
    assert maxes.shape == (15,)
    q = quantize_resnet(params, np.asarray(maxes))
    assert len(q["layers"]) == 2 and "downsample" in q["layers"][1][0]
    # ResNet-101 constant stays honest.
    assert N_SITES_RESNET101 == 1 + sum((3, 4, 23, 3)) * 3 + 4


def test_quantize_rejects_extra_scales():
    params = init_resnet(jax.random.PRNGKey(0), (1,), (4,))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    maxes = np.asarray(
        collect_conv_input_maxes(params, x, compute_dtype=jnp.float32))
    try:
        quantize_resnet(params, np.concatenate([maxes, [1.0]]))
    except ValueError as e:
        assert "extra" in str(e)
    else:
        raise AssertionError("expected ValueError on extra scales")


def test_int8_backbone_close_to_float():
    params = _jitter_bn(init_resnet(jax.random.PRNGKey(0), (2, 2, 2),
                                    (8, 16, 32)))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3))
    ref, _ = resnet_forward(params, x, train=False)
    maxes = calibrate_act_maxes(params, x, compute_dtype=jnp.float32)
    q = quantize_resnet(params, maxes)
    out = resnet_int8_forward(q, x, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.08, rel
    corr = np.corrcoef(np.asarray(ref, np.float32).ravel(),
                       np.asarray(out, np.float32).ravel())[0, 1]
    assert corr > 0.99, corr


def test_int8_resident_trunk_close_to_bf16_residual():
    """residual='int8' (the serving default) adds only marginal error
    over the conservative bf16-residual variant."""
    params = _jitter_bn(init_resnet(jax.random.PRNGKey(0), (2, 2, 2),
                                    (8, 16, 32)))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3))
    ref, _ = resnet_forward(params, x, train=False)
    q = quantize_resnet(
        params, calibrate_act_maxes(params, x, compute_dtype=jnp.float32))
    ref = np.asarray(ref, np.float32)

    def rel(res):
        out = np.asarray(resnet_int8_forward(
            q, x, out_dtype=jnp.float32, residual=res), np.float32)
        return np.linalg.norm(out - ref) / np.linalg.norm(ref)

    r_bf16, r_int8 = rel("bf16"), rel("int8")
    assert r_int8 < 0.08, r_int8
    assert r_int8 < r_bf16 + 0.02, (r_int8, r_bf16)
    try:
        resnet_int8_forward(q, x, residual="f64")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError on unknown residual")


def test_s2d_stem_bit_exact():
    """Space-to-depth stem == stock 7x7/2 stem, bit for bit (the int32
    accumulator makes the tap reordering exact, not approximate)."""
    from icd_tpu.models.resnet_int8 import _qconv, _stem_s2d

    key = jax.random.PRNGKey(3)
    site = {
        "wq": jax.random.randint(key, (7, 7, 3, 16), -127, 128, jnp.int8),
        "scale": jax.random.uniform(key, (16,), jnp.float32),
        "bias": jax.random.uniform(key, (16,), jnp.float32),
        "inv_in": jnp.float32(17.3),
    }
    for shape in [(2, 64, 64, 3), (1, 32, 48, 3)]:
        x = jax.random.normal(jax.random.PRNGKey(4), shape) * 3
        a = np.asarray(_qconv(x, site, stride=2, padding=3))
        b = np.asarray(_stem_s2d(x, site))
        assert a.shape == b.shape
        assert np.array_equal(a, b), shape


def test_quantize_commutes_with_maxpool():
    """round/clip monotonicity: pooling s8 == pooling float then s8."""
    from icd_tpu.models.resnet import max_pool
    from icd_tpu.models.resnet_int8 import _requant

    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8)))
    inv = jnp.float32(127.0 / float(jnp.max(x)))
    a = max_pool(_requant(x, inv), window=3, stride=2, padding=1)
    b = _requant(max_pool(x, window=3, stride=2, padding=1), inv)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_calibration_max_over_batches():
    params = init_resnet(jax.random.PRNGKey(0), (1,), (4,))
    b1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    b2 = b1 * 3.0
    m1 = calibrate_act_maxes(params, b1, compute_dtype=jnp.float32)
    m12 = calibrate_act_maxes(params, [b1, b2], compute_dtype=jnp.float32)
    assert np.all(m12 >= m1)
    assert m12[0] > m1[0] * 2.5  # first site sees the scaled input


def test_int8_captioner_runs_and_matches_bf16_tokens_mostly():
    """End-to-end serving path: jit-compiles from uint8 and decodes."""
    from icd_tpu.decoding.serve import make_captioner, make_int8_captioner
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import init_encoder

    p = BaselineDecoderParams()
    p.vocab_size = 50
    p.embed_size = 16
    p.hidden_size = 16
    encoder = init_encoder(jax.random.PRNGKey(0), 16)
    # Shrink the backbone for test speed.
    encoder["resnet"] = init_resnet(jax.random.PRNGKey(1), (1, 1),
                                    (8, 16))
    encoder["embed"] = {
        "w": jax.random.normal(jax.random.PRNGKey(2), (64, 16)) * 0.1,
        "b": jnp.zeros((16,)),
    }
    decoder = init_baseline_decoder(jax.random.PRNGKey(3), p)
    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(4), (2, 32, 32, 3)) * 255).astype(jnp.uint8))

    ref_fn = make_captioner(encoder, decoder, start_id=47, end_id=48,
                            max_len=8, compute_dtype=jnp.float32)
    int8_fn = make_int8_captioner(encoder, decoder, start_id=47, end_id=48,
                                  max_len=8, compute_dtype=jnp.float32,
                                  calib_imgs=imgs)
    ref_toks = np.asarray(ref_fn(imgs))
    toks = np.asarray(int8_fn(imgs))
    assert toks.shape == ref_toks.shape
    assert toks.dtype == ref_toks.dtype
    # Reusing the saved scales reproduces the exact same program.
    again = make_int8_captioner(encoder, decoder, start_id=47, end_id=48,
                                max_len=8, compute_dtype=jnp.float32,
                                act_maxes=int8_fn.act_maxes)
    assert np.array_equal(np.asarray(again(imgs)), toks)


def test_int8_attention_captioner_runs():
    from icd_tpu.decoding.serve import (
        make_attention_captioner, make_int8_attention_captioner)
    from icd_tpu.models.attention import (
        AttentionDecoderParams, init_attention_decoder)

    encoder = {"resnet": init_resnet(jax.random.PRNGKey(1), (1, 1),
                                     (8, 16))}
    p = AttentionDecoderParams()
    p.vocab = list(range(50))
    p.embed_size = 16
    p.decoder_dim = 16
    p.attention_dim = 16
    # encoder_dim 64 = final channels of the shrunken backbone
    decoder = init_attention_decoder(jax.random.PRNGKey(2), p,
                                     encoder_dim=64)
    imgs = jnp.asarray((jax.random.uniform(
        jax.random.PRNGKey(3), (2, 32, 32, 3)) * 255).astype(jnp.uint8))

    ref_fn = make_attention_captioner(
        encoder, decoder, start_id=47, end_id=48, max_len=6,
        compute_dtype=jnp.float32)
    fn = make_int8_attention_captioner(
        encoder, decoder, start_id=47, end_id=48, max_len=6,
        compute_dtype=jnp.float32, calib_imgs=imgs)
    ref_toks, ref_alphas = ref_fn(imgs)
    toks, alphas = fn(imgs)
    assert toks.shape == tuple(ref_toks.shape)
    assert alphas.shape == tuple(ref_alphas.shape)
    # 1 stem + 2 blocks * 3 convs + 2 downsamples
    assert fn.act_maxes.shape[0] == 9


def test_int8_decoder_matches_float_mostly():
    """W8A8 decode loop (ops/qlinear) vs the float greedy decode: same
    shapes/contract, and token streams agree except near-tie argmaxes."""
    from icd_tpu.decoding.greedy import (greedy_decode_baseline,
                                         greedy_decode_baseline_int8,
                                         quantize_baseline_decoder)
    from icd_tpu.models.baseline import (BaselineDecoderParams,
                                         init_baseline_decoder)

    p = BaselineDecoderParams()
    p.vocab_size = 50
    p.embed_size = 16
    p.hidden_size = 16
    dec = init_baseline_decoder(jax.random.PRNGKey(0), p)
    feats = jax.random.normal(jax.random.PRNGKey(1), (6, 16)) * 0.5

    ref = np.asarray(greedy_decode_baseline(dec, feats, 47, 48,
                                            max_len=8))
    qdec = quantize_baseline_decoder(dec)
    out = np.asarray(greedy_decode_baseline_int8(qdec, feats, 47, 48,
                                                 max_len=8))
    assert out.shape == ref.shape
    assert out.dtype == np.int32
    # random near-zero logits are the worst case for argmax flips; the
    # streams must still mostly agree token-for-token
    agree = (out == ref).mean()
    assert agree > 0.7, agree


def test_int8_attention_decoder_matches_float_mostly():
    from icd_tpu.decoding.greedy_attention import (
        greedy_decode_attention, greedy_decode_attention_int8,
        quantize_attention_decoder)
    from icd_tpu.models.attention import (AttentionDecoderParams,
                                          init_attention_decoder)

    class _V:
        def __len__(self):
            return 40

    p = AttentionDecoderParams()
    p.attention_dim = 12
    p.decoder_dim = 12
    p.embed_size = 8
    p.vocab = _V()
    dec = init_attention_decoder(jax.random.PRNGKey(0), p,
                                 encoder_dim=16)
    grid = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 16)) * 0.5
    ref_t, ref_a = greedy_decode_attention(dec, grid, 37, 38, max_len=7)
    qdec = quantize_attention_decoder(dec)
    out_t, out_a = greedy_decode_attention_int8(dec, qdec, grid, 37, 38,
                                                max_len=7)
    assert out_t.shape == ref_t.shape and out_a.shape == ref_a.shape
    agree = (np.asarray(out_t) == np.asarray(ref_t)).mean()
    assert agree > 0.7, agree


def test_qlinear_matmul_accuracy():
    """qmatmul relative error is at the int8 noise floor (~1%)."""
    from icd_tpu.ops.qlinear import qmatmul, quantize_linear

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (8, 32))
    w = jax.random.normal(k2, (32, 64))
    wq, ws = quantize_linear(w)
    exact = np.asarray(x @ w)
    approx = np.asarray(qmatmul(x, wq, ws))
    rel = np.linalg.norm(approx - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_qlstm_split_segments_beat_shared_scale():
    """Per-segment activation scales on mixed-range LSTM inputs.

    The attention decode loop feeds ``[embedding, gated context]``
    whose dynamic ranges differ ~10x on trained models; one shared
    per-row abs-max quantizes the small segment with the large one's
    step size. qlstm_cell's tuple input must (a) match the float cell
    much tighter than the concatenated call and (b) be exactly the
    concatenated call when ranges are equal-scale slices.
    """
    import functools

    from icd_tpu.models.lstm import init_lstm, lstm_cell
    from icd_tpu.ops.qlinear import (
        qlstm_cell, qmatmul, quantize_lstm, quantize_rows)

    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    e, d, hdim, b = 24, 40, 16, 8
    params = init_lstm(keys[0], e + d, hdim)
    qp = quantize_lstm(params)
    # emb ~N(0, 0.05), context ~N(0, 2.0): a 40x range mismatch.
    emb = jax.random.normal(keys[1], (b, e)) * 0.05
    ctx = jax.random.normal(keys[2], (b, d)) * 2.0
    h = jax.random.normal(keys[3], (b, hdim)) * 0.3
    c = jax.random.normal(keys[4], (b, hdim)) * 0.3
    x = jnp.concatenate([emb, ctx], axis=-1)

    # The token-identity signal: the embedding's contribution to the
    # gates. Under the shared scale it is quantized with the context's
    # step size and mostly destroyed; per-segment scales recover it.
    g_emb_f = emb @ params["wi"][:e]
    xq, xs = quantize_rows(x)
    g_emb_shared = (xq[:, :e].astype(jnp.float32)
                    @ qp["wiq"][:e].astype(jnp.float32)) * (xs * qp["wis"])
    g_emb_split = qmatmul(emb, qp["wiq"][:e], qp["wis"])
    err = lambda a: float(
        jnp.linalg.norm(a - g_emb_f) / jnp.linalg.norm(g_emb_f))
    assert err(g_emb_split) < 0.1 * err(g_emb_shared), (
        err(g_emb_split), err(g_emb_shared))  # measured 0.007 vs 0.242

    # Whole-cell output must not get worse, and a one-segment tuple is
    # bitwise the array call (the baseline decode path is unchanged).
    h_f, _ = lstm_cell(params, x, h, c)
    cell = functools.partial(qlstm_cell, qp, h=h, c=c)
    h_shared, _ = cell(x)
    h_split, _ = cell((emb, ctx))
    herr = lambda a: float(jnp.linalg.norm(a - h_f) / jnp.linalg.norm(h_f))
    assert herr(h_split) <= herr(h_shared) * 1.001, (herr(h_split),
                                                     herr(h_shared))
    h_one, _ = cell((x,))
    assert np.array_equal(np.asarray(h_one), np.asarray(h_shared))

    # A mis-split input (segments not covering every input-weight row)
    # must fail loudly instead of silently dropping gate contributions;
    # an empty tuple is a degenerate case of the same error.
    with pytest.raises(ValueError, match="segments cover"):
        cell((emb,))
    with pytest.raises(ValueError, match="segments cover"):
        cell(())


def test_int8_captioner_requires_calibration():
    from icd_tpu.decoding.serve import make_int8_captioner
    from icd_tpu.models.baseline import (
        BaselineDecoderParams, init_baseline_decoder)
    from icd_tpu.models.encoder import init_encoder

    p = BaselineDecoderParams()
    p.vocab_size = 50
    p.embed_size = 16
    p.hidden_size = 16
    encoder = init_encoder(jax.random.PRNGKey(0), 16)
    decoder = init_baseline_decoder(jax.random.PRNGKey(1), p)
    try:
        make_int8_captioner(encoder, decoder, start_id=1, end_id=2)
    except ValueError as e:
        assert "calib" in str(e)
    else:
        raise AssertionError("expected ValueError without calibration")
