"""CLI flag parity: our parsers expose exactly the reference's flags."""

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_our_train():
    # Load by explicit path: other tests put /root/reference on sys.path,
    # where a different train.py lives.
    spec = importlib.util.spec_from_file_location(
        "icd_train_cli", os.path.join(REPO, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _reference_flags(path):
    with open(path) as f:
        src = f.read()
    flags = set()
    for m in re.finditer(r"add_argument\(\s*['\"]([^'\"]+)['\"]", src):
        flags.add(m.group(1))
    return flags


def _our_flags(parser):
    flags = set()
    for action in parser._actions:
        if action.option_strings:
            flags.update(action.option_strings)
        elif action.dest != "help":
            flags.add(action.dest)
    return flags - {"-h", "--help"}


# Deliberate TPU-only additions on top of the reference's flag set;
# every reference flag must still exist with reference semantics.
TRAIN_EXTENSIONS = {"--amp", "--int8_encoder"}


def test_train_flags_match_reference():
    our_train = _load_our_train()
    ref = _reference_flags("/root/reference/train.py")
    ours = _our_flags(our_train.build_parser())
    assert ref - ours == set(), sorted(ref - ours)
    assert ours - ref == TRAIN_EXTENSIONS, sorted(ours - ref)


def test_eval_flags_match_reference():
    ref = _reference_flags("/root/reference/eval.py")
    # our eval.py builds its parser inside main; extract the same way.
    ours = _reference_flags("/root/repo/eval.py")
    assert ref == ours, (sorted(ref - ours), sorted(ours - ref))


def test_init_flags_match_reference():
    ref = _reference_flags("/root/reference/init.py")
    ours = _reference_flags("/root/repo/init.py")
    assert ref == ours, (sorted(ref - ours), sorted(ours - ref))


def test_train_defaults_match_reference():
    """Spot-check defaults and choices against the reference source."""
    parser = _load_our_train().build_parser()
    by_dest = {a.dest: a for a in parser._actions}
    assert by_dest["attention_dim"].default == 512
    assert by_dest["embed_size"].default == 512
    assert by_dest["batch_size"].default == 32
    assert by_dest["grad_clip"].default == 5.0
    assert by_dest["alpha_c"].default == 1.0
    assert by_dest["max_caption_length"].default == -1
    assert sorted(by_dest["model"].choices) == ["attention", "baseline"]
    # truthy-string bool quirk preserved (type=bool)
    assert by_dest["use_glove"].type is bool
    assert by_dest["fine_tune_encoder"].type is bool


def test_extension_flags_parse_real_booleans():
    """TPU-extension flags (--amp/--int8_encoder) are NOT reference flags,
    so they get real boolean parsing: '--int8_encoder False' must disable,
    not silently enable via the truthy-string quirk."""
    import pytest

    parser = _load_our_train().build_parser()
    ns = parser.parse_args(["m", "--amp", "False", "--int8_encoder", "0"])
    assert ns.amp is False and ns.int8_encoder is False
    ns = parser.parse_args(["m", "--amp", "True", "--int8_encoder", "1"])
    assert ns.amp is True and ns.int8_encoder is True
    with pytest.raises(SystemExit):
        parser.parse_args(["m", "--amp", "maybe"])


def test_eval_cli_restores_use_bert(use_coco_root, monkeypatch, capsys):
    """eval.py reads use_bert from the checkpoint config and passes it to
    the attention evaluate driver (the reference's pickled decoder module
    carries the flag into its forward instead)."""
    import pickle
    import sys

    import icd_tpu.training.attention as ta

    state = {"epoch": 0, "metrics": {},
             "encoder": {}, "decoder": {},
             "encoder_optimizer": None, "decoder_optimizer": None,
             "config": {"model": "attention", "use_bert": True}}
    with open(os.path.join(use_coco_root, "checkpoints",
                           "bertwire_0.ckpt"), "wb") as f:
        pickle.dump(state, f)

    seen = {}

    def fake_evaluate(args, encoder, decoder, use_bert=False):
        seen["use_bert"] = use_bert
        return {"Bleu_1": 0.0, "losses": []}

    monkeypatch.setattr(ta, "evaluate", fake_evaluate)
    spec = importlib.util.spec_from_file_location(
        "icd_eval_cli", os.path.join(REPO, "eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "bertwire_0.ckpt", "--model_type", "attention"])
    mod.main()
    assert seen["use_bert"] is True
