"""Static-calibration W8A8 int8 ResNet backbone (serving fast path).

The dynamic-quant path (ops/quant.py) measured SLOWER end-to-end than
bf16 because every layer pays a full abs-max reduction pass over its
activations before it can quantize. This module removes that cost the
standard production way:

 1. **Calibrate once** (``calibrate_act_maxes``): run a few batches
    through the float backbone and record the abs-max of every conv
    input (104 sites for ResNet-101, in deterministic call order).
 2. **Quantize once at build time** (``quantize_resnet``): weights go
    to per-output-channel int8; the inference-mode BatchNorm that
    follows every conv is *folded into the dequantization affine*, so
    each conv site carries just ``{wq int8, scale[c], bias[c],
    inv_in}`` where ``out = conv_int8(q(x)) * scale + bias`` equals
    ``batch_norm(conv(x, w))`` up to quantization error.
 3. **Serve** (``resnet_int8_forward``): between int8 MXU convs the
    only runtime work is one elementwise chain (affine -> relu ->
    requantize) that XLA fuses into a single pass; there are no
    runtime reductions and no weight handling at all.

v5e's MXU runs int8 at 2x bf16 throughput (measured on this chip: 460
vs 222 TFLOP/s on an isolated ResNet-stage conv), and the serving
pipeline is encoder-conv bound, so this is the headline-throughput
path. Accuracy: per-channel weights + calibrated per-tensor
activations is the torch.ao / TensorRT "ptq default" recipe; parity
tests bound the feature error against the f32 backbone.

The reference has no quantized path (its encoder is torchvision
ResNet-101 in f32, reference models/encoder.py:38-43); this is a
TPU-native extension, opt-in via ``make_int8_captioner``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import normalize_imagenet
from .resnet import BN_EPS, conv2d, max_pool, resnet_forward

N_SITES_RESNET101 = 104  # 1 stem + 33*3 bottleneck + 4 downsample


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

def collect_conv_input_maxes(params, imgs, compute_dtype=jnp.bfloat16):
    """One forward pass; returns (n_sites,) f32 abs-max of each conv input.

    Sites are ordered by call order in resnet_forward (stem, then per
    block conv1, conv2, conv3, downsample) — quantize_resnet consumes
    the same order. ``imgs`` may be uint8 (normalized here, matching
    encoder_forward) or pre-normalized floats.
    """
    x = normalize_imagenet(imgs) if imgs.dtype == jnp.uint8 else imgs
    maxes = []

    def recording_conv(x, w, stride=1, padding=0):
        maxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        return conv2d(x, w, stride=stride, padding=padding)

    resnet_forward(params, x, train=False, compute_dtype=compute_dtype,
                   conv=recording_conv)
    return jnp.stack(maxes)


def calibrate_act_maxes(params, batches, compute_dtype=jnp.bfloat16):
    """Elementwise max of collect_conv_input_maxes over batches.

    ``batches``: iterable of (B, H, W, 3) arrays (uint8 or float). A
    single array is treated as one batch.
    """
    if hasattr(batches, "ndim"):
        batches = [batches]
    fwd = jax.jit(
        lambda b: collect_conv_input_maxes(params, b, compute_dtype))
    maxes = None
    for b in batches:
        v = np.asarray(fwd(jnp.asarray(b)), np.float32)
        maxes = v if maxes is None else np.maximum(maxes, v)
    if maxes is None:
        raise ValueError("calibrate_act_maxes: no calibration batches")
    return maxes


# ---------------------------------------------------------------------------
# Build-time quantization (BN folded into the dequant affine)
# ---------------------------------------------------------------------------

def _np32(x):
    return np.asarray(jax.device_get(x)).astype(np.float32)


def _quantize_site(w, bn, act_max):
    act_max = max(float(act_max), 1e-8)
    s_in = act_max / 127.0
    w = _np32(w)
    ws = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    inv_std = 1.0 / np.sqrt(_np32(bn["var"]) + BN_EPS)
    g = _np32(bn["scale"]) * inv_std
    return {
        "wq": jnp.asarray(wq),
        "scale": jnp.asarray((s_in * ws * g).astype(np.float32)),
        "bias": jnp.asarray(
            (_np32(bn["bias"]) - _np32(bn["mean"]) * g).astype(np.float32)),
        "inv_in": jnp.float32(1.0 / s_in),
    }


def quantize_resnet(params, act_maxes):
    """Float resnet param tree + calibrated maxes -> int8 serving tree."""
    act_maxes = np.asarray(act_maxes, np.float32)
    it = iter(act_maxes)

    def take():
        v = next(it, None)
        if v is None:
            raise ValueError(
                "act_maxes has too few entries for this backbone "
                "(got {})".format(len(act_maxes)))
        return v

    q = {"stem": _quantize_site(params["stem"]["conv"],
                                params["stem"]["bn"], take()),
         "layers": []}
    for blocks in params["layers"]:
        qblocks = []
        for block in blocks:
            qb = {
                "conv1": _quantize_site(block["conv1"], block["bn1"],
                                        take()),
                "conv2": _quantize_site(block["conv2"], block["bn2"],
                                        take()),
                "conv3": _quantize_site(block["conv3"], block["bn3"],
                                        take()),
            }
            if "downsample" in block:
                qb["downsample"] = _quantize_site(
                    block["downsample"]["conv"], block["downsample"]["bn"],
                    take())
            qblocks.append(qb)
        q["layers"].append(qblocks)
    leftover = len(list(it))
    if leftover:
        raise ValueError(
            "act_maxes has {} extra entries for this backbone".format(
                leftover))
    return q


# ---------------------------------------------------------------------------
# Serving forward
# ---------------------------------------------------------------------------

def _requant(x, inv_in):
    """float -> symmetric s8 with the site's static scale."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_in),
                    -127, 127).astype(jnp.int8)


def _conv_affine(xi, site, stride=1, padding=0):
    """s8 input -> int8 conv (int32 acc) -> folded BN affine, f32 out.

    Keep the conv form even for 1x1 kernels: lowering them as dots over
    flattened pixels was measured 10% SLOWER end-to-end (11,004 vs
    ~12,400 captions/s) despite fusing more epilogues — see NOTES.md.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    acc = jax.lax.conv_general_dilated(
        xi, site["wq"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * site["scale"] + site["bias"]


def _qconv(x, site, stride=1, padding=0):
    """quantize(x) -> int8 conv -> folded BN affine, f32 out."""
    return _conv_affine(_requant(x, site["inv_in"]), site,
                        stride=stride, padding=padding)


def _stem_s2d(x, site):
    """Space-to-depth stem: bit-exact 7x7/2 conv at 4x the MXU lane use.

    MEASURED NEGATIVE RESULT on v5e (batch 64, incl. the following
    maxpool): 1.14 ms vs 0.76 ms stock — XLA's adaptive conv emitter
    already handles the 3-channel stem well, and the s8 pixel-shuffle
    relayout this variant prepends does not fuse into the conv. Kept
    (opt-in via resnet_int8_forward(use_s2d_stem=True)) because the
    transform is bit-exact and the measurement documents the boundary.

    The idea: the stock stem feeds 3 input channels into 128 MXU lanes
    (2.3% occupancy — the classic TPU ResNet bottleneck). Rearranging
    2x2 pixel blocks into channels (3 -> 12) and regrouping the kernel
    the same way computes the IDENTICAL int32 accumulation — the same
    147 taps plus zero taps — so the result is bit-exact, not
    approximate:

      - kernel (7,7,3,64) zero-pads to (8,8,3,64) at the top/left,
        which shifts conv padding 3 -> 4 on those sides (the zero taps
        read the extra padding ring and contribute nothing);
      - 8x8/stride-2 windows tile exactly into 4x4 blocks of 2x2, so
        the transformed conv is (4,4,12,64), stride 1, padding (2,1):
        output position y reads blocks y-2..y+1 = original rows
        2y-4..2y+3, exactly the shifted window.

    The weight regroup is 9.4k elements (free); the pixel shuffle is
    what costs (see above).
    """
    xi = _requant(x, site["inv_in"])  # (B, 224, 224, 3) s8
    b, hh, ww, c = xi.shape
    x2 = xi.reshape(b, hh // 2, 2, ww // 2, 2, c)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2, 4 * c)
    w8 = jnp.pad(site["wq"], ((1, 0), (1, 0), (0, 0), (0, 0)))
    kh, kw, _, co = w8.shape
    w4 = w8.reshape(kh // 2, 2, kw // 2, 2, c, co)
    w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(kh // 2, kw // 2, 4 * c, co)
    acc = jax.lax.conv_general_dilated(
        x2, w4, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * site["scale"] + site["bias"]


def resnet_int8_forward(qparams, x, out_dtype=jnp.bfloat16,
                        residual="int8", use_s2d_stem=False):
    """(B, H, W, 3) normalized float -> stride-32 NHWC features.

    Structure mirrors resnet_forward (inference mode only).

    residual="int8" (default) keeps the whole trunk int8-resident: each
    block output is quantized ONCE with the next block's calibrated
    conv1 input scale, and the shortcut add dequantizes from that same
    s8 tensor — no bf16 intermediates materialize anywhere in the trunk
    (a ~1.1 GB/step HBM saving at batch 64; the quantize even commutes
    with the stem max-pool, which therefore runs on s8). The only extra
    quantization vs residual="bf16" is that the shortcut read is the
    8-bit value instead of the exact one; caption-level parity is
    re-validated in NOTES.md. residual="bf16" is the conservative
    variant that keeps block outputs in ``out_dtype``.
    """
    if residual not in ("int8", "bf16"):
        raise ValueError("residual must be 'int8' or 'bf16'")
    # Space-to-depth stem: measured SLOWER on v5e (1.14 vs 0.76
    # ms/batch-64 incl. pool) — XLA's conv emitter already handles the
    # 3-channel stem well and the s8 pixel shuffle doesn't pay for the
    # lane-occupancy win. Kept opt-in as a bit-exact documented variant
    # (see _stem_s2d); stock path is the default.
    if (use_s2d_stem and qparams["stem"]["wq"].shape[:2] == (7, 7)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        stem_out = jax.nn.relu(_stem_s2d(x, qparams["stem"]))
    else:
        stem_out = jax.nn.relu(
            _qconv(x, qparams["stem"], stride=2, padding=3))

    if residual == "bf16":
        out = max_pool(stem_out.astype(out_dtype),
                       window=3, stride=2, padding=1)
        for stage, blocks in enumerate(qparams["layers"]):
            for b, qb in enumerate(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                h = jax.nn.relu(_qconv(out, qb["conv1"]))
                h = jax.nn.relu(
                    _qconv(h, qb["conv2"], stride=stride, padding=1))
                h = _qconv(h, qb["conv3"])
                if "downsample" in qb:
                    shortcut = _qconv(out, qb["downsample"], stride=stride)
                else:
                    shortcut = out.astype(jnp.float32)
                out = jax.nn.relu(h + shortcut).astype(out_dtype)
        return out

    # int8-resident trunk. Walk with one-block lookahead: each block
    # output is quantized with the NEXT conv1's calibrated input scale
    # (the very tensor that scale was calibrated on).
    all_blocks = [(qb, 2 if (stage > 0 and b == 0) else 1)
                  for stage, blocks in enumerate(qparams["layers"])
                  for b, qb in enumerate(blocks)]
    first_site = all_blocks[0][0]["conv1"]
    # round/clip are monotone, so quantize commutes with max-pool:
    # pooling runs on s8.
    q = max_pool(_requant(stem_out, first_site["inv_in"]),
                 window=3, stride=2, padding=1)
    in_scale = 1.0 / first_site["inv_in"]
    for i, (qb, stride) in enumerate(all_blocks):
        h = jax.nn.relu(_conv_affine(q, qb["conv1"]))
        h = jax.nn.relu(_qconv(h, qb["conv2"], stride=stride, padding=1))
        h = _qconv(h, qb["conv3"])
        if "downsample" in qb:
            shortcut = _conv_affine(q, qb["downsample"], stride=stride)
        else:
            shortcut = q.astype(jnp.float32) * in_scale
        out = jax.nn.relu(h + shortcut)
        if i + 1 == len(all_blocks):
            return out.astype(out_dtype)
        nxt = all_blocks[i + 1][0]["conv1"]
        q = _requant(out, nxt["inv_in"])
        in_scale = 1.0 / nxt["inv_in"]
