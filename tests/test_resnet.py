"""ResNet numerics parity vs torch (CPU), plus encoder head shapes.

torchvision isn't installed here, so the test builds a miniature torch
ResNet with torchvision-compatible state_dict naming and checks our
converted JAX forward matches torch to float32 tolerance — validating
conv padding, BN semantics (train and eval), max-pool, adaptive pool,
and the OIHW->HWIO converter in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from icd_tpu.models.encoder import (
    encoder_attention_forward, encoder_forward,
    init_encoder, init_encoder_attention, trainable_mask)
from icd_tpu.models.resnet import (
    adaptive_avg_pool2d, batch_norm, from_torch_state_dict, init_resnet,
    max_pool, resnet_forward)

EXPANSION = 4


class TorchBottleneck(nn.Module):
    def __init__(self, cin, width, stride, downsample):
        super().__init__()
        cout = width * EXPANSION
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchMiniResNet(nn.Module):
    """torchvision-style ResNet with arbitrary depths/widths."""

    def __init__(self, depths, widths):
        super().__init__()
        self.conv1 = nn.Conv2d(3, widths[0], 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(widths[0])
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = widths[0]
        for stage, (depth, width) in enumerate(zip(depths, widths)):
            blocks = []
            cout = width * EXPANSION
            for b in range(depth):
                stride = 2 if (stage > 0 and b == 0) else 1
                ds = None
                if b == 0 and (stride != 1 or cin != cout):
                    ds = nn.Sequential(
                        nn.Conv2d(cin, cout, 1, stride, bias=False),
                        nn.BatchNorm2d(cout))
                blocks.append(TorchBottleneck(cin, width, stride, ds))
                cin = cout
            setattr(self, "layer{}".format(stage + 1), nn.Sequential(*blocks))
        self.depths = depths

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for stage in range(len(self.depths)):
            x = getattr(self, "layer{}".format(stage + 1))(x)
        return x


DEPTHS = (1, 1, 1, 1)
WIDTHS = (4, 4, 8, 8)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(
                m.weight.shape, generator=g) * 0.2 + 1.0)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


@pytest.fixture(scope="module")
def torch_and_jax():
    torch.manual_seed(0)
    model = TorchMiniResNet(DEPTHS, WIDTHS).eval()
    with torch.no_grad():
        _randomize_bn_stats(model)
    params = from_torch_state_dict(model.state_dict(), DEPTHS)
    return model, params


def test_eval_forward_matches_torch(torch_and_jax):
    model, params = torch_and_jax
    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = resnet_forward(params, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-4)


def test_train_mode_bn_matches_torch(torch_and_jax):
    model, params = torch_and_jax
    x = np.random.default_rng(2).normal(size=(4, 32, 32, 3)).astype(np.float32)
    tmodel = TorchMiniResNet(DEPTHS, WIDTHS)
    tmodel.load_state_dict(model.state_dict())
    tmodel.train()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours, new_params = resnet_forward(params, jnp.asarray(x), train=True)
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)
    # Running stats must have been updated torch-style.
    ref_sd = tmodel.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_params["stem"]["bn"]["mean"]),
        ref_sd["bn1.running_mean"].numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["stem"]["bn"]["var"]),
        ref_sd["bn1.running_var"].numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 7), (14, 14)), ((14, 14), (7, 7)), ((5, 5), (3, 3)),
    ((3, 3), (5, 5)), ((7, 7), (7, 7))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = np.random.default_rng(3).normal(
        size=(2, *in_hw, 5)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), out_hw).numpy()
    ours = adaptive_avg_pool2d(jnp.asarray(x), out_hw)
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=1e-6)


def test_max_pool_matches_torch():
    x = np.random.default_rng(4).normal(size=(2, 13, 13, 3)).astype(np.float32)
    ref = F.max_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1).numpy()
    ours = max_pool(jnp.asarray(x), 3, 2, 1)
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=1e-6)


def test_encoder_heads_shapes():
    key = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.uint8)

    params = init_encoder(key, embed_size=32)
    out, _ = encoder_forward(params, imgs)
    assert out.shape == (2, 32)

    att_params = init_encoder_attention(key)
    grid, _ = encoder_attention_forward(att_params, imgs)
    assert grid.shape == (2, 14, 14, 2048)


def test_trainable_mask_structure():
    key = jax.random.PRNGKey(0)
    params = {"resnet": init_resnet(key, DEPTHS, WIDTHS),
              "embed": {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}}
    frozen = trainable_mask(params, fine_tune=False)
    leaves = jax.tree_util.tree_leaves(frozen["resnet"])
    assert not any(leaves)
    assert all(jax.tree_util.tree_leaves(frozen["embed"]))

    tuned = trainable_mask(params, fine_tune=True)
    assert tuned["resnet"]["layers"][0][0]["conv1"] is False
    assert tuned["resnet"]["layers"][1][0]["conv1"] is True
    # BN running stats never trainable.
    assert tuned["resnet"]["layers"][1][0]["bn1"]["mean"] is False


def test_jit_and_grad_through_backbone():
    """The whole encoder jits and grads flow (fine-tune path)."""
    key = jax.random.PRNGKey(0)
    params = {"resnet": init_resnet(key, DEPTHS, WIDTHS)}

    @jax.jit
    def loss_fn(p, x):
        feats, _ = resnet_forward(p["resnet"], x, train=False)
        return jnp.sum(feats ** 2)

    x = jnp.ones((1, 32, 32, 3))
    g = jax.grad(loss_fn)(params, x)
    gnorm = sum(jnp.sum(jnp.abs(leaf))
                for leaf in jax.tree_util.tree_leaves(g))
    assert bool(gnorm > 0)
