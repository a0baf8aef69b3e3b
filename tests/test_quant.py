"""int8 dynamic-quantized conv path: accuracy vs float reference."""

import jax
import jax.numpy as jnp
import numpy as np

from icd_tpu.models.resnet import conv2d, init_resnet, resnet_forward
from icd_tpu.ops.quant import int8_conv


def test_int8_conv_close_to_float():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8)) * 0.1
    ref = conv2d(x, w, stride=1, padding=1)
    q = int8_conv(x, w, stride=1, padding=1)
    # W8A8 error budget: ~1% relative on random gaussians.
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_backbone_features_close():
    params = init_resnet(jax.random.PRNGKey(0), (1, 1, 1, 1),
                         (4, 4, 8, 8))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    ref, _ = resnet_forward(params, x, train=False)
    q, _ = resnet_forward(params, x, train=False, conv=int8_conv)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    # Errors accumulate across layers; BN renormalizes between convs.
    assert rel < 0.15, rel
    # Feature ranking should be mostly preserved.
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(q).ravel())[0, 1]
    assert corr > 0.98, corr
