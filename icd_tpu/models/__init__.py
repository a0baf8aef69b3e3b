from . import resnet  # noqa: F401
from .encoder import (  # noqa: F401
    encoder_attention_forward, encoder_forward,
    init_encoder, init_encoder_attention, trainable_mask)
