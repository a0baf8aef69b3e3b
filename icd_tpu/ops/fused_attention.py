"""Pallas TPU kernel: fused soft-attention decode-step context.

One decode step of the attention decoder computes (reference:
models/attention.py:43-61, 270-271):

    att_dec = h @ Wd + bd                       (B, A)
    act     = relu(att_enc + att_dec[:, None])  (B, P, A)   <- HBM hog
    scores  = act @ wf + bf                     (B, P)
    alpha   = softmax_P(scores)
    ctx     = sum_P(enc * alpha)                (B, D)
    gated   = sigmoid(h @ Wg + bg) * ctx        (B, D)

XLA materializes ``act`` (B*P*A floats) to HBM every timestep; this
kernel keeps the whole chain in VMEM, streaming one batch block per
grid program. Blocks: B is tiled by ``block_b``; P and A stay resident
(P<=~512, A<=512 for all reference configs — a (8, 256, 512) bf16
activation block is ~2 MB).

``fused_attention_step(...)`` dispatches to the kernel only when
ICD_TPU_PALLAS=1 and inputs are bf16 on TPU; the default is the XLA
path. Measured on v5e at the reference's serving shapes (B=64, P=196,
D=2048, A=512): XLA 0.050 ms/step vs this kernel 0.281 ms/step — XLA's
automatic fusion already keeps the activation out of HBM and runs the
score reduction on the MXU, so hand-scheduling loses here ("don't
hand-schedule what the compiler already does"). The kernel is kept as
the starting point for a future multi-step decode kernel where weights
stay VMEM-resident across timesteps (which XLA cannot do across scan
iterations). Both paths are numerically cross-checked in tests via
interpret mode and were validated on real TPU (max bf16 ctx err 2e-3).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(enc_ref, att_enc_ref, h_ref, wd_ref, bd_ref, wf_ref, bf_ref,
            wg_ref, bg_ref, ctx_ref, alpha_ref, *, p_actual):
    # One batch block. Shapes: enc (Bb, P, D), att_enc (Bb, P, A),
    # h (Bb, H); weights replicated across programs.
    h = h_ref[:]
    att_dec = jnp.dot(h, wd_ref[:],
                      preferred_element_type=jnp.float32) + bd_ref[:]
    act = jax.nn.relu(att_enc_ref[:] + att_dec[:, None, :])  # (Bb, P, A)
    scores = jnp.sum(act * wf_ref[:][None, None, :], axis=2) + bf_ref[0]
    # Mask padded pixel slots, then a numerically-stable softmax over P.
    p = scores.shape[1]
    pix = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(pix < p_actual, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=1, keepdims=True)
    num = jnp.exp(scores)
    alpha = num / jnp.sum(num, axis=1, keepdims=True)
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)
    ctx = jnp.sum(enc_ref[:] * alpha[:, :, None].astype(enc_ref.dtype),
                  axis=1)  # (Bb, D)
    gate = jax.nn.sigmoid(
        jnp.dot(h, wg_ref[:], preferred_element_type=jnp.float32)
        + bg_ref[:])
    ctx_ref[:] = (gate * ctx.astype(jnp.float32)).astype(ctx_ref.dtype)


def _pick_block_b(b, p_pad, d, a, h_dim, itemsize):
    """Batch block size: 16 when the double-buffered working set allows,
    else 8 (Mosaic requires the sublane dim of 2D blocks be a multiple
    of 8)."""
    budget = 48 * 1024 * 1024
    weights = (h_dim * a + h_dim * d + d + a) * itemsize
    per_b = 2 * (p_pad * d + p_pad * a) * itemsize + 4 * d * 4
    avail = budget - weights
    if 16 * per_b <= avail:
        return 16
    return 8


@functools.partial(jax.jit, static_argnames=("block_b",))
def fused_attention_pallas(enc, att_enc, h, wd, bd, wf, bf, wg, bg,
                           block_b=None):
    """(gated context (B, D), alpha (B, P)) via the fused TPU kernel."""
    b, p, d = enc.shape
    a = att_enc.shape[-1]
    if block_b is None:
        block_b = _pick_block_b(
            b, _round_up(p, 128), d, a, h.shape[-1], enc.dtype.itemsize)
    p_pad = _round_up(p, 128)
    b_pad = _round_up(b, block_b)
    if p_pad != p:
        enc = jnp.pad(enc, ((0, 0), (0, p_pad - p), (0, 0)))
        att_enc = jnp.pad(att_enc, ((0, 0), (0, p_pad - p), (0, 0)))
    if b_pad != b:
        enc = jnp.pad(enc, ((0, b_pad - b), (0, 0), (0, 0)))
        att_enc = jnp.pad(att_enc, ((0, b_pad - b), (0, 0), (0, 0)))
        h = jnp.pad(h, ((0, b_pad - b), (0, 0)))

    grid = (b_pad // block_b,)
    ctx, alpha = pl.pallas_call(
        functools.partial(_kernel, p_actual=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, p_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, p_pad, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, h.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h.shape[-1], a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((a,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h.shape[-1], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, p_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d), enc.dtype),
            jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(enc, att_enc, h, wd, bd, wf, bf, wg, bg)
    return ctx[:b], alpha[:b, :p]


def fused_attention_reference(enc, att_enc, h, wd, bd, wf, bf, wg, bg):
    """Pure-JAX reference of the same fused step."""
    att_dec = h @ wd + bd
    act = jax.nn.relu(att_enc + att_dec[:, None, :])
    scores = jnp.sum(act * wf[None, None, :], axis=2) + bf[0]
    alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
    ctx = jnp.sum(enc * alpha[:, :, None].astype(enc.dtype), axis=1)
    gate = jax.nn.sigmoid(h @ wg + bg)
    return (gate * ctx.astype(gate.dtype)).astype(enc.dtype), alpha


def use_pallas():
    if not os.environ.get("ICD_TPU_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fused_attention_step(decoder_params, enc, att_enc, h):
    """Gated attention context for one decode step.

    Drop-in for the attention+gate portion of decode_step
    (models/attention.py decode_step); returns (gated ctx (B, D),
    alpha (B, P)). The Pallas kernel is the bf16 serving path; f32
    inputs (and non-TPU platforms) take the pure-JAX reference.
    """
    att = decoder_params["attention"]
    args = (enc, att_enc, h,
            att["dec_att"]["w"], att["dec_att"]["b"],
            att["full_att"]["w"][:, 0], att["full_att"]["b"],
            decoder_params["f_beta"]["w"], decoder_params["f_beta"]["b"])
    if use_pallas() and enc.dtype == jnp.bfloat16:
        return fused_attention_pallas(*args)
    return fused_attention_reference(*args)
