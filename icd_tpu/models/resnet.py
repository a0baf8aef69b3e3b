"""Pure-JAX ResNet-101 backbone (TPU-native NHWC layout).

Replaces the reference's torchvision ResNet-101 encoder backbone
(reference: models/encoder.py:38-43, 90-95 keeps the conv stack frozen).
Everything is functional: parameters are nested-dict pytrees, batch-norm
running statistics are part of the tree and threaded through the forward
pass, and the whole stack jits into a single XLA program that tiles the
convolutions onto the MXU.

Weight layout is HWIO (convs) so converted torchvision checkpoints
(``from_torch_state_dict``) need only an OIHW->HWIO transpose. Compute
dtype is configurable; bfloat16 is the TPU fast path, float32 the
parity path.

Structure: stem (7x7/2 conv, BN, ReLU, 3x3/2 maxpool) then stages of
bottleneck blocks [3, 4, 23, 3] at widths [64, 128, 256, 512] with
expansion 4 -> 2048 final channels at stride 32.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

RESNET101_DEPTHS = (3, 4, 23, 3)
RESNET_WIDTHS = (64, 128, 256, 512)
EXPANSION = 4
BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch convention: new = (1 - m) * old + m * batch


# ---------------------------------------------------------------------------
# Functional ops
# ---------------------------------------------------------------------------

def conv2d(x, w, stride=1, padding=0):
    """NHWC x HWIO convolution with symmetric padding."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(x, bn, train=False):
    """BatchNorm over NHWC channels.

    train=True normalizes with batch statistics and returns updated
    running stats (the reference runs the frozen encoder's BN in train
    mode during training, models/baseline.py:197-198); train=False uses
    running statistics.
    """
    if train:
        # Batch statistics are computed and blended at the RUNNING
        # stats' dtype (f32 under --amp, where only the compute copy of
        # the params is bf16), so the threaded-back stats never lose
        # precision to the compute dtype. Identity for uniform trees.
        stat_dtype = bn["mean"].dtype
        xs = x.astype(stat_dtype)
        mean = jnp.mean(xs, axis=(0, 1, 2))
        var = jnp.var(xs, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        # torch tracks unbiased variance in running stats.
        unbiased = var * (n / max(n - 1, 1))
        new_bn = dict(
            bn,
            mean=(1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
            var=(1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased)
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    inv = jax.lax.rsqrt(var + BN_EPS) * bn["scale"]
    y = (x - mean) * inv + bn["bias"]
    # Keep the activation at the compute dtype even when the stats are
    # wider (the f32 math fuses; only the narrow result is written).
    return y.astype(x.dtype), new_bn


def max_pool(x, window=3, stride=2, padding=1):
    """Max pooling over NHWC spatial dims, -inf padded (torch semantics)."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.asarray(
        jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)))


def adaptive_avg_pool2d(x, out_hw):
    """torch.nn.AdaptiveAvgPool2d semantics for NHWC.

    Output cell (i, j) averages input rows [floor(i*H/oh), ceil((i+1)*H/oh))
    and the analogous columns. Handles both down- and up-sampling; the
    reference uses (14, 14) on a 7x7 grid, which duplicates cells
    (models/encoder.py:92).
    """
    oh, ow = out_hw
    h, w = x.shape[1], x.shape[2]

    def pool_axis(arr, axis, in_size, out_size):
        pieces = []
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -(-((i + 1) * in_size) // out_size)  # ceil
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, end)
            pieces.append(jnp.mean(arr[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, 1, h, oh)
    x = pool_axis(x, 2, w, ow)
    return x


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def _he_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def _bn_params(c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init_resnet(key, depths=RESNET101_DEPTHS, widths=RESNET_WIDTHS,
                in_channels=3, dtype=jnp.float32):
    """Random-init a ResNet parameter tree of the given depth config."""
    keys = iter(jax.random.split(key, 4 + sum(depths) * 4))

    params = {
        "stem": {
            "conv": _he_conv(next(keys), 7, 7, in_channels, widths[0], dtype),
            "bn": _bn_params(widths[0], dtype),
        },
        "layers": [],
    }
    cin = widths[0]
    for stage, (depth, width) in enumerate(zip(depths, widths)):
        blocks = []
        cout = width * EXPANSION
        for b in range(depth):
            stride = 2 if (stage > 0 and b == 0) else 1
            block = {
                "conv1": _he_conv(next(keys), 1, 1, cin, width, dtype),
                "bn1": _bn_params(width, dtype),
                "conv2": _he_conv(next(keys), 3, 3, width, width, dtype),
                "bn2": _bn_params(width, dtype),
                "conv3": _he_conv(next(keys), 1, 1, width, cout, dtype),
                "bn3": _bn_params(cout, dtype),
            }
            if b == 0 and (stride != 1 or cin != cout):
                block["downsample"] = {
                    "conv": _he_conv(next(keys), 1, 1, cin, cout, dtype),
                    "bn": _bn_params(cout, dtype),
                }
            blocks.append(block)
            cin = cout
        params["layers"].append(blocks)
    return params


def init_resnet101(key, dtype=jnp.float32):
    return init_resnet(key, RESNET101_DEPTHS, RESNET_WIDTHS, dtype=dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _cast_keep_bn_stats(params, dtype):
    """Cast all leaves to ``dtype`` EXCEPT BatchNorm running statistics.

    The stats stay at their stored dtype so train-mode forwards update
    them at full precision (batch_norm blends at the stats' dtype) and
    the returned new_params carry master-precision stats — the AMP
    train step threads exactly those back into the f32 state.
    """
    def walk(node):
        if isinstance(node, dict):
            return {k: (v if k in ("mean", "var") else walk(v))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node.astype(dtype)

    return walk(params)


def _bottleneck(block, x, stride, train, conv=conv2d):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with projection shortcut."""
    new_block = dict(block)
    out, new_block["bn1"] = batch_norm(
        conv(x, block["conv1"]), block["bn1"], train)
    out = jax.nn.relu(out)
    out, new_block["bn2"] = batch_norm(
        conv(out, block["conv2"], stride=stride, padding=1),
        block["bn2"], train)
    out = jax.nn.relu(out)
    out, new_block["bn3"] = batch_norm(
        conv(out, block["conv3"]), block["bn3"], train)

    if "downsample" in block:
        shortcut, new_ds_bn = batch_norm(
            conv(x, block["downsample"]["conv"], stride=stride),
            block["downsample"]["bn"], train)
        new_block["downsample"] = dict(
            block["downsample"], bn=new_ds_bn)
    else:
        shortcut = x
    return jax.nn.relu(out + shortcut), new_block


def resnet_forward(params, x, train=False, compute_dtype=None, conv=None):
    """Run the backbone; returns (features NHWC at stride 32, new_params).

    new_params only differs from params in BN running stats (and only
    when train=True); under jit the copy is free when discarded.
    ``conv`` overrides the convolution implementation (e.g.
    ops.quant.int8_conv for the quantized serving path).
    """
    if conv is None:
        conv = conv2d
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = _cast_keep_bn_stats(params, compute_dtype)
    new_params = {"stem": dict(params["stem"]), "layers": []}

    out = conv(x, params["stem"]["conv"], stride=2, padding=3)
    out, new_params["stem"]["bn"] = batch_norm(
        out, params["stem"]["bn"], train)
    out = jax.nn.relu(out)
    out = max_pool(out, window=3, stride=2, padding=1)

    for stage, blocks in enumerate(params["layers"]):
        new_blocks = []
        for b, block in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            out, new_block = _bottleneck(block, out, stride, train,
                                         conv=conv)
            new_blocks.append(new_block)
        new_params["layers"].append(new_blocks)
    return out, new_params


# ---------------------------------------------------------------------------
# torchvision checkpoint conversion
# ---------------------------------------------------------------------------

def from_torch_state_dict(state_dict, depths=RESNET101_DEPTHS,
                          dtype=np.float32):
    """Convert a torchvision ResNet state_dict to our parameter tree.

    Accepts the standard naming (conv1.*, bn1.*, layer{1..4}.{i}.conv{1..3},
    layer{x}.0.downsample.{0,1}); tensors may be torch tensors or numpy
    arrays. Conv kernels transpose OIHW -> HWIO. The classifier fc.* is
    ignored (the reference drops it too, models/encoder.py:38-39).
    """

    def arr(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, dtype=dtype)

    def conv(name):
        return jnp.asarray(arr(name).transpose(2, 3, 1, 0))

    def bn(prefix):
        return {
            "scale": jnp.asarray(arr(prefix + ".weight")),
            "bias": jnp.asarray(arr(prefix + ".bias")),
            "mean": jnp.asarray(arr(prefix + ".running_mean")),
            "var": jnp.asarray(arr(prefix + ".running_var")),
        }

    params = {
        "stem": {"conv": conv("conv1.weight"), "bn": bn("bn1")},
        "layers": [],
    }
    for stage, depth in enumerate(depths):
        blocks = []
        for b in range(depth):
            p = "layer{}.{}".format(stage + 1, b)
            block = {
                "conv1": conv(p + ".conv1.weight"), "bn1": bn(p + ".bn1"),
                "conv2": conv(p + ".conv2.weight"), "bn2": bn(p + ".bn2"),
                "conv3": conv(p + ".conv3.weight"), "bn3": bn(p + ".bn3"),
            }
            if p + ".downsample.0.weight" in state_dict:
                block["downsample"] = {
                    "conv": conv(p + ".downsample.0.weight"),
                    "bn": bn(p + ".downsample.1"),
                }
            blocks.append(block)
        params["layers"].append(blocks)
    return params
