"""Converters from reference PyTorch artifacts to icd_tpu pytrees.

Covers the parity path of BASELINE.json ("reproduce the reference
eval_data JSONs on the pinned checkpoints"):

 - torchvision ResNet-101 ``resnet101.pth`` state dicts (the file the
   reference downloads, models/encoder.py:9-20)
 - reference *whole-module* checkpoints (``torch.save`` of the modules
   themselves, checkpoint.py:51-60) — unpickling those requires the
   reference repo on sys.path, which ``convert_reference_checkpoint``
   arranges
 - plain state dicts of the reference's Encoder / BaselineDecoder /
   AttentionDecoder modules (note the encoder wraps the backbone in
   ``nn.Sequential``, so keys look like ``resnet.4.0.conv1.weight``)

LSTM/LSTMCell weights keep PyTorch's (i, f, g, o) gate order — our
cells use the same layout (models/lstm.py), so conversion is just a
transpose.
"""

import numpy as np

from .models.lstm import from_torch_lstm
from .models.resnet import from_torch_state_dict as resnet_from_torch

# torch nn.Sequential(list(resnet.children())[:k]) index -> torchvision name
_SEQ_TO_NAME = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                "6": "layer3", "7": "layer4"}


def _arr(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _lin(sd, prefix):
    return {"w": _arr(sd[prefix + ".weight"]).T,
            "b": _arr(sd[prefix + ".bias"])}


def _unwrap_sequential(sd, wrapper="resnet."):
    """Map 'resnet.4.0.conv1.weight' -> 'layer1.0.conv1.weight'."""
    out = {}
    for key, val in sd.items():
        if key.startswith(wrapper):
            rest = key[len(wrapper):]
            idx, _, tail = rest.partition(".")
            name = _SEQ_TO_NAME.get(idx)
            if name is None:
                continue  # relu/maxpool/avgpool have no params
            out[name + ("." + tail if tail else "")] = val
    return out


def _infer_depths(resnet_sd):
    depths = []
    for stage in range(1, 5):
        blocks = {int(k.split(".")[1]) for k in resnet_sd
                  if k.startswith("layer{}.".format(stage))}
        depths.append(max(blocks) + 1 if blocks else 0)
    return tuple(depths)


def convert_encoder_state_dict(sd):
    """Reference Encoder/EncoderAttention state dict -> our tree."""
    resnet_sd = _unwrap_sequential(sd)
    tree = {"resnet": resnet_from_torch(
        resnet_sd, depths=_infer_depths(resnet_sd))}
    if "embed.weight" in sd:
        tree["embed"] = _lin(sd, "embed")
    return tree


def load_resnet101_pth(path):
    """torchvision resnet101.pth -> backbone tree (classifier dropped)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return resnet_from_torch(sd)


def convert_baseline_decoder_state_dict(sd):
    """Reference BaselineDecoder state dict -> our tree
    (models/baseline.py:43-57 naming)."""
    return {
        "embedding": _arr(sd["embedding.weight"]),
        "lstm": from_torch_lstm(
            sd["lstm.weight_ih_l0"], sd["lstm.weight_hh_l0"],
            sd["lstm.bias_ih_l0"], sd["lstm.bias_hh_l0"]),
        "linear": _lin(sd, "linear"),
    }


def convert_attention_decoder_state_dict(sd):
    """Reference AttentionDecoder state dict -> our tree
    (models/attention.py:102-123 naming)."""
    return {
        "attention": {
            "enc_att": _lin(sd, "attention.enc_att"),
            "dec_att": _lin(sd, "attention.dec_att"),
            "full_att": _lin(sd, "attention.full_att"),
        },
        "lstm": from_torch_lstm(
            sd["decode_step.weight_ih"], sd["decode_step.weight_hh"],
            sd["decode_step.bias_ih"], sd["decode_step.bias_hh"]),
        "h_lin": _lin(sd, "h_lin"),
        "c_lin": _lin(sd, "c_lin"),
        "f_beta": _lin(sd, "f_beta"),
        "fc": _lin(sd, "fc"),
        "embedding": _arr(sd["embedding.weight"]),
    }


def convert_reference_checkpoint(path, reference_root="/root/reference",
                                 model_type=None):
    """Load a reference .pth.tar (whole pickled modules,
    checkpoint.py:51-60) and convert to our checkpoint dict.

    Requires torch and the reference repo for the pickled classes;
    install_reference_shims supplies stand-ins for the reference's
    uninstalled dependencies (torchvision / pytorch_pretrained_bert /
    bcolz) — unpickling restores module state without running their
    constructors, so skeleton classes with the right qualified names
    are sufficient.

    .. warning:: TRUST BOUNDARY — only pass checkpoint files you trust.
       The whole-module pickle format the reference uses is arbitrary
       code execution by construction: ``torch.load(weights_only=False)``
       runs whatever the pickle says, and the reference repo is put on
       sys.path for its classes. This is inherent to consuming the
       reference's ``.pth.tar`` artifacts, not an icd_tpu design choice
       (our own checkpoints are plain numpy-pytree pickles saved and
       loaded by this codebase)."""
    import torch

    from .compat import install_reference_shims

    install_reference_shims(reference_root)
    chkpt = torch.load(path, map_location="cpu", weights_only=False)

    encoder_sd = chkpt["encoder"].state_dict()
    decoder = chkpt["decoder"]
    decoder_sd = decoder.state_dict()
    if model_type is None:
        model_type = ("attention" if any(
            k.startswith("attention.") for k in decoder_sd) else "baseline")

    if model_type == "attention":
        dec_tree = convert_attention_decoder_state_dict(decoder_sd)
    else:
        dec_tree = convert_baseline_decoder_state_dict(decoder_sd)

    return {
        "epoch": chkpt["epoch"],
        "metrics": chkpt.get("metrics", {}),
        "encoder": convert_encoder_state_dict(encoder_sd),
        "decoder": dec_tree,
        "encoder_optimizer": None,
        "decoder_optimizer": None,
        # The pickled decoder module carries use_bert (the reference's
        # eval relies on it, attention.py:96,242); surface it so eval.py
        # restores BERT teacher forcing for converted checkpoints too.
        "config": {"model": model_type,
                   "use_bert": bool(getattr(decoder, "use_bert", False))},
    }
