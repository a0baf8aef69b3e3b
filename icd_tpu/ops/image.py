"""Device-side image ingest ops.

The host pipeline ships uint8 NHWC images; these ops run inside the
jitted step so the /255 + ImageNet normalization fuses with the first
convolution (one HBM read instead of a separate float32 transfer +
normalize pass — the reference does this on host in torchvision
transforms, models/baseline.py:123-128).
"""

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(imgs, dtype=jnp.float32):
    """uint8/float NHWC -> normalized float NHWC.

    Matches transforms.ToTensor() + Normalize(mean, std) of the
    reference drivers (models/baseline.py:123-128).
    """
    x = imgs.astype(dtype)
    if imgs.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (x - mean) / std


def scale_only(imgs, dtype=jnp.float32):
    """uint8 NHWC -> [0,1] float NHWC without mean/std.

    Reproduces the reference's beam-search image loader, which divides
    by 255 but leaves the ImageNet normalization commented out
    (gen_captions.py:133-143).
    """
    x = imgs.astype(dtype)
    if imgs.dtype == jnp.uint8:
        x = x / 255.0
    return x


def resize_bilinear(imgs, out_hw):
    """Device-side bilinear resize (NHWC), align_corners=False.

    Used by the high-throughput ingest path to move resizing off the
    host: feed raw decoded frames and resize+normalize on device.
    """
    import jax

    b, _, _, c = imgs.shape
    return jax.image.resize(
        imgs.astype(jnp.float32),
        (b, out_hw[0], out_hw[1], c), method="bilinear")
