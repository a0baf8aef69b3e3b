"""Export icd_tpu checkpoints to the reference's ``.pth.tar`` format.

The inverse of :mod:`icd_tpu.convert`: takes an icd_tpu checkpoint dict
(numpy/JAX pytrees, icd_tpu/checkpoint.py) and writes a whole-module
PyTorch checkpoint exactly as the reference's ``save_checkpoint`` does
(reference: checkpoint.py:39-62 — a dict of the pickled ``encoder`` /
``decoder`` modules themselves plus epoch/optimizers/metrics). The
result is consumable by the unmodified reference code: its ``eval.py``,
``gen_captions.py``, notebooks, and ``--checkpoint`` resume all load it
(resume note: optimizers are exported FRESH — Adam moments are not
carried over, since the two frameworks' optimizer states are not
layout-compatible).

Requires torch and the reference repo (for the module classes); where
torchvision / pytorch_pretrained_bert are not installed, the functional
compat shims stand in (icd_tpu/compat.py) — modules exported under a
shim unpickle wherever the same shim (or the real package, for
torchvision, whose class layout the shim mirrors) is importable. BERT
checkpoints are the exception: the shim's BertModel wraps transformers
internally, so a bert_attention export is only loadable where the shim
is installed too (document at the call site).

Weight layout inverses (see icd_tpu/convert.py for the forward maps):
conv kernels HWIO -> OIHW, linears transposed back to (out, in), LSTM
kept in PyTorch's (i, f, g, o) gate order (models/lstm.py).
"""

import os

import numpy as np

# our resnet tree stage index -> torchvision layer name; the reference
# encoders wrap torchvision children in nn.Sequential (encoder.py:36-38,
# 88-90), which renames 'layer1.*' -> 'resnet.4.*' etc.
_NAME_TO_SEQ = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                "layer3": "6", "layer4": "7"}


def _np(x):
    return np.asarray(x, np.float32)


def _lin(tree):
    """Our {'w': (in, out), 'b': (out,)} -> torch Linear tensors."""
    import torch

    return (torch.from_numpy(_np(tree["w"]).T.copy()),
            torch.from_numpy(_np(tree["b"])))


def resnet_to_torch_state_dict(tree):
    """Our backbone tree -> torchvision-named state dict (inverse of
    models/resnet.py from_torch_state_dict)."""
    import torch

    sd = {}

    def conv(name, k):
        sd[name] = torch.from_numpy(_np(k).transpose(3, 2, 0, 1).copy())

    def bn(prefix, p):
        sd[prefix + ".weight"] = torch.from_numpy(_np(p["scale"]))
        sd[prefix + ".bias"] = torch.from_numpy(_np(p["bias"]))
        sd[prefix + ".running_mean"] = torch.from_numpy(_np(p["mean"]))
        sd[prefix + ".running_var"] = torch.from_numpy(_np(p["var"]))

    conv("conv1.weight", tree["stem"]["conv"])
    bn("bn1", tree["stem"]["bn"])
    for stage, blocks in enumerate(tree["layers"]):
        for b, block in enumerate(blocks):
            p = "layer{}.{}".format(stage + 1, b)
            for i in (1, 2, 3):
                conv("{}.conv{}.weight".format(p, i),
                     block["conv{}".format(i)])
                bn("{}.bn{}".format(p, i), block["bn{}".format(i)])
            if "downsample" in block:
                conv(p + ".downsample.0.weight",
                     block["downsample"]["conv"])
                bn(p + ".downsample.1", block["downsample"]["bn"])
    return sd


def encoder_to_torch_state_dict(tree):
    """Our encoder tree -> reference Encoder/EncoderAttention state dict
    ('resnet.<seq idx>.' wrapping + optional 'embed.' head)."""
    sd = {}
    for key, val in resnet_to_torch_state_dict(tree["resnet"]).items():
        top, _, rest = key.partition(".")
        idx = _NAME_TO_SEQ[top]
        sd["resnet.{}{}".format(idx, "." + rest if rest else "")] = val
    if "embed" in tree:
        sd["embed.weight"], sd["embed.bias"] = _lin(tree["embed"])
    return sd


def _lstm_to_torch(tree, prefix):
    """Our lstm tree -> torch weight_ih/weight_hh/bias_ih/bias_hh."""
    import torch

    return {
        prefix + "weight_ih": torch.from_numpy(_np(tree["wi"]).T.copy()),
        prefix + "weight_hh": torch.from_numpy(_np(tree["wh"]).T.copy()),
        prefix + "bias_ih": torch.from_numpy(_np(tree["bi"])),
        prefix + "bias_hh": torch.from_numpy(_np(tree["bh"])),
    }


def baseline_decoder_to_torch_state_dict(tree):
    import torch

    sd = {"embedding.weight": torch.from_numpy(_np(tree["embedding"]))}
    sd.update(_lstm_to_torch(tree["lstm"], "lstm."))
    # torch nn.LSTM names its first layer's tensors *_l0.
    sd = {(k + "_l0" if k.startswith("lstm.") else k): v
          for k, v in sd.items()}
    sd["linear.weight"], sd["linear.bias"] = _lin(tree["linear"])
    return sd


def attention_decoder_to_torch_state_dict(tree):
    import torch

    sd = {"embedding.weight": torch.from_numpy(_np(tree["embedding"]))}
    for name in ("enc_att", "dec_att", "full_att"):
        w, b = _lin(tree["attention"][name])
        sd["attention.{}.weight".format(name)] = w
        sd["attention.{}.bias".format(name)] = b
    sd.update(_lstm_to_torch(tree["lstm"], "decode_step."))
    for name in ("h_lin", "c_lin", "f_beta", "fc"):
        sd["{}.weight".format(name)], sd["{}.bias".format(name)] = _lin(
            tree[name])
    return sd


def _reference_vocab(reference_root):
    """The current ICD_TPU_ROOT vocab as a REFERENCE Vocabulary instance
    (AttentionDecoder asserts the concrete class, attention.py:84)."""
    import vocabulary as ref_vocab_mod  # resolved from the reference

    from .vocabulary import load_vocab

    ours = load_vocab()
    if isinstance(ours, ref_vocab_mod.Vocabulary):
        return ours
    ref = ref_vocab_mod.Vocabulary.__new__(ref_vocab_mod.Vocabulary)
    ref.w2i = dict(ours.w2i)
    ref.i2w = dict(ours.i2w)
    ref.idx = getattr(ours, "idx", len(ours.i2w))
    return ref


def export_reference_checkpoint(chkpt, out_path,
                                reference_root="/root/reference",
                                decoder_lr=4e-4):
    """Write an icd_tpu checkpoint as a reference whole-module .pth.tar.

    Args:
        chkpt: icd_tpu checkpoint dict (icd_tpu.checkpoint.load_checkpoint).
        out_path: destination .pth.tar path.
        reference_root: checkout of the reference repo (module classes).
        decoder_lr: lr for the exported FRESH decoder Adam (the reference
            resume path expects a live optimizer; moments start empty).
    """
    import sys

    import torch

    from .compat import install_reference_shims

    install_reference_shims(reference_root)
    if reference_root not in sys.path:
        sys.path.append(reference_root)

    cfg = chkpt.get("config") or {}
    model_type = cfg.get("model") or (
        "attention" if "attention" in chkpt["decoder"] else "baseline")
    enc_tree = chkpt["encoder"]
    dec_tree = chkpt["decoder"]
    vocab_size = int(np.asarray(dec_tree["embedding"]).shape[0])
    embed_size = int(np.asarray(dec_tree["embedding"]).shape[1])

    # The reference encoder constructors load resnet101 weights from
    # disk/torchvision (encoder.py:9-20) before we overwrite every
    # parameter anyway; bypass that requirement with a fresh random
    # backbone for construction only.
    import models.encoder as ref_encoder_mod

    orig_loader = ref_encoder_mod._load_resnet101_model
    ref_encoder_mod._load_resnet101_model = (
        lambda: __import__("torchvision").models.resnet101(
            pretrained=False))
    try:
        if model_type == "baseline":
            import models.baseline as ref_baseline

            encoder = ref_encoder_mod.Encoder(embed_size)
            params = ref_baseline.BaselineDecoderParams()
            params.vocab_size = vocab_size
            params.embed_size = embed_size
            params.hidden_size = (cfg.get("decoder_dim")
                                  or int(np.asarray(
                                      dec_tree["lstm"]["wh"]).shape[0]))
            decoder = ref_baseline.BaselineDecoder(params)
            dec_sd = baseline_decoder_to_torch_state_dict(dec_tree)
        else:
            import models.attention as ref_attention

            device = torch.device("cpu")
            encoder = ref_encoder_mod.EncoderAttention()
            params = ref_attention.AttentionDecoderParams()
            params.embed_size = embed_size
            params.decoder_dim = (cfg.get("decoder_dim") or int(
                np.asarray(dec_tree["lstm"]["wh"]).shape[0]))
            params.attention_dim = (cfg.get("attention_dim") or int(
                np.asarray(
                    dec_tree["attention"]["enc_att"]["w"]).shape[1]))
            dropout = cfg.get("decoder_dropout")
            params.dropout = 0.5 if dropout is None else dropout
            params.use_bert = bool(cfg.get("use_bert", False))
            params.vocab = _reference_vocab(reference_root)
            decoder = ref_attention.AttentionDecoder(device, params)
            dec_sd = attention_decoder_to_torch_state_dict(dec_tree)
    finally:
        ref_encoder_mod._load_resnet101_model = orig_loader

    enc_sd = encoder_to_torch_state_dict(enc_tree)
    for module, sd, what in ((encoder, enc_sd, "encoder"),
                             (decoder, dec_sd, "decoder")):
        missing, unexpected = module.load_state_dict(sd, strict=False)
        assert not unexpected, (what, unexpected)
        # Acceptable gaps: BN num_batches_tracked counters (torch-only
        # bookkeeping), and the frozen BERT submodule the reference
        # decoder constructs itself (attention.py:96-100 'bert_model'),
        # whose weights come from from_pretrained, not the checkpoint.
        leftover = [k for k in missing
                    if not k.endswith("num_batches_tracked")
                    and not k.startswith(("bert.", "bert_model."))]
        assert not leftover, (what, leftover)

    encoder.eval()
    decoder.eval()
    dec_params = [p for p in decoder.parameters() if p.requires_grad]
    decoder_optimizer = (torch.optim.Adam(dec_params, lr=decoder_lr)
                         if dec_params else None)

    state = {
        "epoch": chkpt.get("epoch", 0),
        "metrics": chkpt.get("metrics", {}),
        "encoder": encoder,
        "decoder": decoder,
        "encoder_optimizer": None,
        "decoder_optimizer": decoder_optimizer,
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    torch.save(state, out_path)
    return out_path
