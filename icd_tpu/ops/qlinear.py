"""W8A8 dynamic-quantized matmuls for the serving decode loop.

The greedy decode loop is weight-HBM-bound: every step re-reads the
vocab projection (H x V, ~10 MB bf16 at the flagship shapes) and the
LSTM gate weights (~8 MB) from HBM for a few hundred MFLOPs of matmul.
Storing those weights as per-output-channel int8 halves the per-step
weight traffic, and the v5e MXU runs the s8 x s8 products at 2x bf16
throughput; the only runtime additions are a per-row abs-max over the
(B, H) activations (tiny) and an elementwise dequant that XLA fuses
into the matmul epilogue. Measured on-chip: 17.8 vs 26.1 us/step on
the isolated 25-step decode core (NOTES.md).

Unlike the backbone (models/resnet_int8.py), no calibration is needed:
activations here are (B, H)-sized, so dynamic per-row scaling costs
almost nothing — the reason dynamic quant LOST on the backbone
(ops/quant.py) was activation-map-sized reduction passes, which don't
exist at decode shapes.

The reference has no quantized path (its decoders are f32 torch,
reference models/baseline.py:43-57); this is a TPU-native serving
extension, opt-in via make_int8_captioner(int8_decoder=True).
"""

import jax
import jax.numpy as jnp


def quantize_linear(w):
    """(I, O) float -> (wq int8, scale (O,) f32) per-output-channel."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_rows(x):
    """(B, I) float -> (xq int8, scale (B, 1) f32) per-row symmetric."""
    x = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def qmatmul(x, wq, ws):
    """Dynamic W8A8 x @ w: quantize x per row, int32 accumulate,
    dequantize with the outer product of scales. Returns f32."""
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xs * ws)


def quantize_lstm(params):
    """lstm.py param dict -> int8 gate weights (bias summed, f32)."""
    wiq, wis = quantize_linear(params["wi"])
    whq, whs = quantize_linear(params["wh"])
    bias = (params["bi"].astype(jnp.float32)
            + params["bh"].astype(jnp.float32))
    return {"wiq": wiq, "wis": wis, "whq": whq, "whs": whs, "b": bias}


def qlstm_cell(qp, x, h, c):
    """lstm_cell with W8A8 gate matmuls; x/h/c f32, returns f32.

    ``x`` may be a tuple of row-concatenable segments, each quantized
    with its OWN per-row scale. A single abs-max over a mixed-range
    input (the attention decoder feeds ``[embedding, gated context]``,
    whose segments differ in scale by an order of magnitude on trained
    models) quantizes the small segment with the large segment's step
    size, wasting most of the int8 grid on it; splitting recovers that
    precision at identical FLOPs — the per-output-channel int8 weight
    rows are just sliced per segment. Single-array ``x`` is bitwise
    unchanged."""
    from ..models.lstm import gates_to_state

    segs = x if isinstance(x, tuple) else (x,)
    off, acc = 0, None
    for seg in segs:
        w = qp["wiq"][off:off + seg.shape[-1]]
        t = qmatmul(seg, w, qp["wis"])
        acc = t if acc is None else acc + t
        off += seg.shape[-1]
    if off != qp["wiq"].shape[0]:
        raise ValueError(
            f"qlstm_cell input segments cover {off} rows of the "
            f"{qp['wiq'].shape[0]}-row input weight; a mis-split input "
            "would silently drop the remaining rows' gate contributions")
    gates = acc + qmatmul(h, qp["whq"], qp["whs"]) + qp["b"]
    return gates_to_state(gates, c)
