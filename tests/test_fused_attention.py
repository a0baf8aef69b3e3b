"""Pallas fused attention kernel vs pure-JAX reference (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import icd_tpu.ops.fused_attention as fa
from icd_tpu.models.attention import (
    AttentionDecoderParams, init_attention_decoder, soft_attention)


class FakeVocab(dict):
    def __len__(self):
        return 19


def _inputs(b=8, p=196, d=64, a=32, h_dim=48, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 8)
    enc = jax.random.normal(ks[0], (b, p, d))
    att_enc = jax.random.normal(ks[1], (b, p, a))
    h = jax.random.normal(ks[2], (b, h_dim))
    wd = jax.random.normal(ks[3], (h_dim, a)) * 0.3
    bd = jax.random.normal(ks[4], (a,)) * 0.1
    wf = jax.random.normal(ks[5], (a,)) * 0.3
    bf = jnp.asarray([0.05])
    wg = jax.random.normal(ks[6], (h_dim, d)) * 0.3
    bg = jax.random.normal(ks[7], (d,)) * 0.1
    return enc, att_enc, h, wd, bd, wf, bf, wg, bg


# Two shapes only (CI budget; the kernel is a kept-for-the-record
# negative result, NOTES.md): the reference 196-pixel grid and one
# non-dividing pixel count.
@pytest.mark.parametrize("b,p", [(8, 196), (4, 100)])
def test_kernel_matches_reference_interpret(monkeypatch, b, p):
    args = _inputs(b=b, p=p)
    ref_ctx, ref_alpha = fa.fused_attention_reference(*args)

    with jax.disable_jit():
        orig = pl.pallas_call
        monkeypatch.setattr(
            pl, "pallas_call",
            functools.partial(orig, interpret=True))
        ctx, alpha = fa.fused_attention_pallas.__wrapped__(*args)
    np.testing.assert_allclose(
        np.asarray(ctx), np.asarray(ref_ctx), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), atol=2e-6)


def test_reference_matches_soft_attention():
    """fused reference == soft_attention + gate composition."""
    p = AttentionDecoderParams()
    p.attention_dim = 32
    p.decoder_dim = 48
    p.embed_size = 8
    p.vocab = FakeVocab()
    params = init_attention_decoder(jax.random.PRNGKey(0), p,
                                    encoder_dim=64)
    enc = jax.random.normal(jax.random.PRNGKey(1), (4, 49, 64))
    h = jax.random.normal(jax.random.PRNGKey(2), (4, 48))
    att = params["attention"]
    att_enc = enc @ att["enc_att"]["w"] + att["enc_att"]["b"]

    weighted, alpha = soft_attention(att, enc, h, att_enc)
    gate = jax.nn.sigmoid(
        h @ params["f_beta"]["w"] + params["f_beta"]["b"])
    expected = gate * weighted

    ctx, alpha2 = fa.fused_attention_reference(
        enc, att_enc, h, att["dec_att"]["w"], att["dec_att"]["b"],
        att["full_att"]["w"][:, 0], att["full_att"]["b"],
        params["f_beta"]["w"], params["f_beta"]["b"])
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(expected),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha2), np.asarray(alpha),
                               atol=1e-6)


def test_dispatch_fallback_on_cpu():
    assert not fa.use_pallas()  # tests force the cpu platform
    args = _inputs(b=2, p=49)
    params = {
        "attention": {
            "dec_att": {"w": args[3], "b": args[4]},
            "full_att": {"w": args[5][:, None], "b": args[6]},
            "enc_att": {"w": None, "b": None},
        },
        "f_beta": {"w": args[7], "b": args[8]},
    }
    ctx, alpha = fa.fused_attention_step(params, args[0], args[1], args[2])
    ref_ctx, ref_alpha = fa.fused_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx))
