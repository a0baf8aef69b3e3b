"""Import shims for unpickling reference whole-module checkpoints.

The reference saves *entire pickled nn.Module/optimizer objects*
(reference: checkpoint.py:51-60), so loading a real ``.pth.tar`` needs
every class referenced by the pickle to be importable:

 - ``models.encoder`` / ``models.baseline`` / ``models.attention`` /
   ``vocabulary`` — provided by putting ``/root/reference`` on sys.path,
 - ``torchvision.models.resnet.{ResNet,Bottleneck}`` — torchvision is
   not installed here; :func:`install_reference_shims` registers a
   functional torch implementation under those exact names,
 - ``pytorch_pretrained_bert`` (bert_attention checkpoints) and
   ``bcolz`` (imported at the top of reference embed.py) — skeletal
   shims: unpickling an ``nn.Module`` restores ``__dict__`` without
   running ``__init__``, so a bare class with the right qualified name
   is sufficient to recover ``state_dict()``.

Unpickling never executes the shimmed constructors; only the class
*names* must resolve. The torchvision ResNet here is nevertheless a
real, forward-capable torch model (standard Bottleneck ResNet, written
against the architecture definition — matching torchvision's module
registration order conv1,bn1,relu,maxpool,layer1-4,avgpool,fc so that
``list(resnet.children())`` slicing in the reference encoder
(models/encoder.py:38-39, 90-91) behaves identically), because tests
use it to *construct* reference-format checkpoints to round-trip.

Shims only install when the real package is absent.
"""

import importlib
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module_missing(name):
    if name in sys.modules:
        return False
    try:
        importlib.import_module(name)
        return False
    except ImportError:
        return True


def _build_torchvision_stub():
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1,
                                   bias=False)
            self.bn3 = nn.BatchNorm2d(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, depth, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride=stride, bias=False),
                    nn.BatchNorm2d(planes * block.expansion))
            blocks = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, depth):
                blocks.append(block(self.inplanes, planes))
            return nn.Sequential(*blocks)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def resnet101(pretrained=False, **kwargs):
        if pretrained:
            raise RuntimeError(
                "torchvision shim cannot download pretrained weights "
                "(zero-egress environment). Convert a local "
                "models/resnet101.pth via icd_tpu.convert."
                "load_resnet101_pth instead.")
        return ResNet(Bottleneck, [3, 4, 23, 3], **kwargs)

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    for obj in (Bottleneck, ResNet):
        obj.__module__ = "torchvision.models.resnet"
        obj.__qualname__ = obj.__name__
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    resnet_mod.resnet101 = resnet101

    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet = resnet_mod
    models_mod.ResNet = ResNet
    models_mod.resnet101 = resnet101

    transforms_mod = _build_transforms_module()

    tv = types.ModuleType("torchvision")
    tv.__is_icd_tpu_shim__ = True
    tv.models = models_mod
    tv.transforms = transforms_mod
    return {"torchvision": tv,
            "torchvision.models": models_mod,
            "torchvision.models.resnet": resnet_mod,
            "torchvision.transforms": transforms_mod}


def _build_transforms_module():
    """Functional Compose/Resize/ToTensor/Normalize with torchvision's
    PIL semantics (reference drivers: models/baseline.py:123-128,
    models/attention.py:296-301). These are real implementations — the
    oracle harness (tools/ref_oracle.py) runs the reference train/eval
    code under this shim, so the transforms must transform, not just
    unpickle. Resize matches torchvision's PIL path: (h, w) size tuple,
    bilinear resample; ToTensor is HWC uint8 -> CHW float32 / 255;
    Normalize is per-channel (x - mean) / std."""
    import numpy as np
    import torch
    from PIL import Image

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                short, long = (w, h) if w <= h else (h, w)
                new_short = self.size
                # torchvision's PIL path truncates (int(size*long/short),
                # functional_pil.py), it does not round.
                new_long = int(self.size * long / short)
                nw, nh = ((new_short, new_long) if w <= h
                          else (new_long, new_short))
            else:
                nh, nw = self.size  # torchvision order is (h, w)
            return img.resize((nw, nh), self.interpolation)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            return t.to(torch.float32).div(255)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = mean
            self.std = std

        def __call__(self, t):
            mean = torch.as_tensor(self.mean, dtype=t.dtype)
            std = torch.as_tensor(self.std, dtype=t.dtype)
            return (t - mean[:, None, None]) / std[:, None, None]

    transforms_mod = types.ModuleType("torchvision.transforms")
    for cls in (Compose, Resize, ToTensor, Normalize):
        cls.__module__ = "torchvision.transforms"
        setattr(transforms_mod, cls.__name__, cls)
    return transforms_mod


def _build_bert_stub():
    import os

    from torch import nn

    class BertModel(nn.Module):
        """pytorch_pretrained_bert.BertModel stand-in.

        Two jobs:
         - unpickling reference bert_attention checkpoints (state is
           restored via ``__dict__`` without running ``__init__``, so
           the class only has to resolve by qualified name), and
         - a FUNCTIONAL ``from_pretrained`` when ``BERT_MODEL_DIR``
           points at a local transformers checkout, wrapping
           ``transformers.BertModel`` behind pytorch_pretrained_bert's
           call convention — ``model(ids)`` returns
           ``(encoded_layers, pooled_output)`` where ``encoded_layers``
           is the per-layer hidden-state list the reference indexes as
           ``encoded_layers[11]`` (reference: models/attention.py:99,
           178-181). This is what lets the oracle harness
           (tools/ref_oracle.py) run the reference's --use_bert path
           live against the same local BERT icd_tpu uses. The local
           model must have 12 encoder layers for index 11 to mean
           "final layer" exactly as it does on bert-base.
        """

        @classmethod
        def from_pretrained(cls, *a, **k):
            src = os.environ.get("BERT_MODEL_DIR")
            if not src:
                raise RuntimeError(
                    "pytorch_pretrained_bert shim cannot download "
                    "weights; set BERT_MODEL_DIR to a local transformers "
                    "save_pretrained directory (tools/make_tiny_bert.py "
                    "builds one), or use icd_tpu.models.bert_embed.")
            from transformers import BertModel as _HFBertModel

            self = cls()
            self.hf = _HFBertModel.from_pretrained(src)
            self.hf.eval()
            return self

        def forward(self, input_ids, token_type_ids=None,
                    attention_mask=None, output_all_encoded_layers=True):
            out = self.hf(input_ids=input_ids,
                          token_type_ids=token_type_ids,
                          attention_mask=attention_mask,
                          output_hidden_states=True)
            # hidden_states[0] is the embedding output;
            # [1:] are the encoder layers = encoded_layers.
            layers = list(out.hidden_states[1:])
            if not output_all_encoded_layers:
                return layers[-1], out.pooler_output
            return layers, out.pooler_output

    class BertTokenizer:
        @classmethod
        def from_pretrained(cls, *a, **k):
            src = os.environ.get("BERT_MODEL_DIR")
            if not src:
                raise RuntimeError(
                    "pytorch_pretrained_bert shim cannot download "
                    "vocabs; set BERT_MODEL_DIR to a local transformers "
                    "save_pretrained directory, or use "
                    "icd_tpu.models.bert_embed.")
            # The transformers tokenizer IS API-compatible with the two
            # methods the reference calls (tokenize /
            # convert_tokens_to_ids, reference: attention.py:172-173)
            # and pickles under its own importable name, so return it
            # directly rather than wrapping.
            from transformers import BertTokenizer as _HFBertTokenizer

            return _HFBertTokenizer.from_pretrained(src)

    modeling = types.ModuleType("pytorch_pretrained_bert.modeling")
    tokenization = types.ModuleType("pytorch_pretrained_bert.tokenization")
    BertModel.__module__ = "pytorch_pretrained_bert.modeling"
    BertModel.__qualname__ = "BertModel"
    BertTokenizer.__module__ = "pytorch_pretrained_bert.tokenization"
    BertTokenizer.__qualname__ = "BertTokenizer"
    modeling.BertModel = BertModel
    tokenization.BertTokenizer = BertTokenizer

    pkg = types.ModuleType("pytorch_pretrained_bert")
    pkg.__is_icd_tpu_shim__ = True
    pkg.modeling = modeling
    pkg.tokenization = tokenization
    pkg.BertModel = BertModel
    pkg.BertTokenizer = BertTokenizer
    return {"pytorch_pretrained_bert": pkg,
            "pytorch_pretrained_bert.modeling": modeling,
            "pytorch_pretrained_bert.tokenization": tokenization}


class _RaisingModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            # Introspection machinery (inspect, pickle, import system)
            # probes dunders; answer honestly instead of exploding.
            raise AttributeError(name)
        raise RuntimeError(
            "{}.{} is a shim for unpickling reference checkpoints only; "
            "the real package is not installed.".format(
                self.__name__, name))


def _with_specs(mods):
    """Stub modules need a real ``__spec__``: ``importlib.util.find_spec``
    raises ``ValueError`` on spec-less sys.modules entries, which breaks
    third-party availability probes (e.g. transformers checking for
    torchvision)."""
    for name, mod in mods.items():
        if mod.__spec__ is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mods


def install_reference_shims(reference_root=REFERENCE_ROOT):
    """Make reference whole-module pickles loadable: reference repo on
    sys.path, our pycocotools shim importable, and stand-in modules for
    the reference's uninstalled dependencies.

    The reference root is APPENDED to sys.path: unpickling only needs
    names that exist nowhere else (``models.*``, ``vocabulary``), and
    appending keeps this repo's own root-level ``train``/``eval``
    modules from being shadowed by the reference's same-named files.

    Returns an opaque state token for :func:`uninstall_reference_shims`
    (tests use it to de-pollute the process; production CLIs can ignore
    it — the shims are idempotent and harmless once loading is done).
    """
    import os

    state = {"paths": [], "modules": []}
    if reference_root not in sys.path and os.path.isdir(reference_root):
        sys.path.append(reference_root)
        state["paths"].append(reference_root)
    # pycocotools for reference dataset.py/vocabulary.py imports
    # (the reference appends the cwd-relative 'cocoapi/PythonAPI/').
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shim_dir = os.path.join(repo_root, "cocoapi", "PythonAPI")
    if _module_missing("pycocotools") and shim_dir not in sys.path:
        sys.path.append(shim_dir)
        state["paths"].append(shim_dir)

    stubs = {}
    if _module_missing("torchvision"):
        stubs.update(_build_torchvision_stub())
    if _module_missing("pytorch_pretrained_bert"):
        stubs.update(_build_bert_stub())
    if _module_missing("bcolz"):
        bcolz = _RaisingModule("bcolz")
        bcolz.__is_icd_tpu_shim__ = True
        stubs["bcolz"] = bcolz
    sys.modules.update(_with_specs(stubs))
    state["modules"].extend(stubs)
    return state


def uninstall_reference_shims(state):
    """Undo :func:`install_reference_shims` (plus any reference modules
    imported meanwhile): restores sys.path and evicts the stub modules
    and everything imported from the reference root, so one caller's
    shims can't leak into unrelated code (a spec-less ``torchvision``
    stub breaks transformers; ``/root/reference`` on sys.path shadows
    same-named modules)."""
    for p in state["paths"]:
        if p in sys.path:
            sys.path.remove(p)
    for name in state["modules"]:
        sys.modules.pop(name, None)
    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None)
        if f and f.startswith(REFERENCE_ROOT):
            del sys.modules[name]
