"""Run the REFERENCE torch code as a local parity oracle.

The strongest local parity proof available without the real COCO /
pretrained artifacts: drive the *actual reference implementation*
(reference: train.py:11-79 -> models/{baseline,attention}.py ->
checkpoint.py:39-62, then eval.py:21-45) end-to-end on the synthetic
COCO fixture, producing genuine whole-module ``.pth.tar`` checkpoints
and reference-written ``eval_data/*.json`` — then evaluate the SAME
checkpoint with icd_tpu (auto-converted on load, icd_tpu/checkpoint.py)
and assert the metric dicts agree. This welds shut the one link the
per-component differential tests leave open: nobody else has run the
reference's own driver code against ours on identical inputs.

Environment substitutions (each one shared by BOTH sides, so it cannot
fake agreement):
 - torchvision is not installed -> the functional shim ResNet/transforms
   (icd_tpu/compat.py); the ResNet-101 weights come from a generated
   ``models/resnet101.pth`` both sides load/convert.
 - nltk's punkt data is absent -> reference ``nltk.tokenize
   .word_tokenize`` is patched to icd_tpu's Treebank tokenizer (itself
   corpus-differential-tested against real NLTK, tests/test_tokenize.py).
 - meteor-1.5.jar + java are absent (also absent from the reference
   snapshot, reference: .MISSING_LARGE_BLOBS) -> the pure-Python
   METEOR 1.5 stdio server (tools/meteor_stdio.py — faithful on the
   id-string eval protocol, icd_tpu/eval_func/meteor_py.py) served to
   the reference via a PATH ``java`` shim and to icd_tpu via
   METEOR_CMD, so the welded METEOR column carries the real algorithm.
 - pytorch_pretrained_bert + bert-base-uncased are absent -> the
   reference's BERT path (models/attention.py:96-100, 166-215) runs
   through the functional compat shim wrapping transformers, loading a
   local 12-encoder-layer BERT (so the reference's
   ``encoded_layers[11]`` is the final layer, exactly as on bert-base)
   built by tools/make_tiny_bert.py from the fixture vocabulary; both
   sides read the SAME BERT_MODEL_DIR weights.
 - torch>=2.6 defaults ``torch.load(weights_only=True)``, which rejects
   the reference's whole-module pickles -> patched back to the legacy
   default the reference was written against (trusted: the pickle was
   produced seconds earlier by the reference itself).

Subcommands:
  prepare <root> [--train N --val N --seed S]   build the oracle root
  run-ref <root> <script> [args...]             run a reference CLI
  run-ours <root> <script> [args...]            run an icd_tpu CLI (CPU)
  compare <ref.json> <ours.json> [--tol ...]    assert metric parity
  full <root> [--families baseline,glove_baseline,attention,
               glove_attention,bert_attention]  the whole loop
  beam <root> [--family attention --k 5 --n_images 4]
               beam-search parity: the reference's actual
               gen_captions.py beam vs icd_tpu's, token-for-token
  export <root> [--families baseline,attention]
               the REVERSE weld: icd_tpu trains, exports a reference
               .pth.tar (icd_tpu/export.py), the unmodified reference
               eval.py reproduces our metric dict

Example (what tests/test_oracle.py automates):
  python tools/ref_oracle.py full /tmp/oracle --train 48 --val 24
"""

import argparse
import hashlib
import json
import os
import runpy
import shutil
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"
FAKE_METEOR = os.path.join(REPO_ROOT, "tools", "meteor_stdio.py")


# ----------------------------------------------------------------- cache
#
# Reference-side oracle artifacts (the fixture data, vocab.pkl, the
# seeded resnet101.pth, the reference-trained .pth.tar checkpoints and
# reference-written eval JSONs) are deterministic functions of the
# reference code (read-only), this harness, the shims both sides share,
# and the fixture parameters. Re-deriving them dominates the pytest
# suite (~12 of ~25 min), so tests/test_oracle.py keys a persistent
# root on a hash of exactly those inputs and the stages below skip
# reference-side work whose outputs already exist. icd_tpu's own
# convert/eval/export paths — the code under test — always run fresh.

ORACLE_CACHE_INPUTS = (
    # this harness + the stdio METEOR both sides score through
    "tools/ref_oracle.py", "tools/meteor_stdio.py",
    # fixture generators
    "tools/make_synthetic_coco.py", "tools/make_tiny_bert.py",
    # shims the REFERENCE side executes through
    "icd_tpu/compat.py", "icd_tpu/data/tokenize.py",
    "icd_tpu/data/embed.py", "icd_tpu/eval_func/meteor_py.py",
)


def cache_key(n_train, n_val, seed):
    """Hash of every input that determines reference-side artifacts."""
    import numpy
    import torch

    h = hashlib.sha256()
    for rel in ORACLE_CACHE_INPUTS:
        with open(os.path.join(REPO_ROOT, rel), "rb") as f:
            h.update(rel.encode())
            h.update(f.read())
    h.update("torch={} numpy={} py={}.{} train={} val={} seed={}".format(
        torch.__version__, numpy.__version__, sys.version_info[0],
        sys.version_info[1], n_train, n_val, seed).encode())
    return h.hexdigest()[:16]


def cached_root(n_train=48, n_val=24, seed=0):
    """Persistent oracle root for these params, or None when disabled
    (ICD_TPU_ORACLE_CACHE=0). An existing root missing its .prepared
    sentinel (a prior prepare died midway) is wiped and rebuilt."""
    base = os.environ.get(
        "ICD_TPU_ORACLE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "icd_tpu_oracle"))
    if base in ("0", ""):
        return None
    root = os.path.join(base, cache_key(n_train, n_val, seed))
    sentinel = os.path.join(root, ".prepared")
    if os.path.isdir(root) and not os.path.exists(sentinel):
        shutil.rmtree(root)
    if not os.path.exists(sentinel):
        os.makedirs(root, exist_ok=True)
        # Fresh subprocess with a clean env: the caller (pytest) may
        # carry ICD_TPU_ROOT / JAX platform overrides that must not
        # leak into the oracle root's construction.
        env = dict(os.environ)
        env.pop("ICD_TPU_ROOT", None)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "prepare", root,
             "--train", str(n_train), "--val", str(n_val),
             "--seed", str(seed)],
            check=True, cwd=REPO_ROOT, env=env)
        with open(sentinel, "w") as f:
            f.write(cache_key(n_train, n_val, seed) + "\n")
        # GC stale entries (other keys) so edits to the hashed inputs
        # don't accumulate dead ~100 MB roots.
        me = os.path.basename(root)
        for entry in os.listdir(base):
            if entry != me and len(entry) == 16:
                shutil.rmtree(os.path.join(base, entry),
                              ignore_errors=True)
    return root


# ---------------------------------------------------------------- prepare

def prepare(root, n_train=48, n_val=24, seed=0):
    """Build a self-contained oracle root: synthetic COCO fixture,
    seeded resnet101.pth, reference-built vocab.pkl, refbug-compat
    glove_vectors.pkl, and the fake-java PATH shim."""
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    from make_synthetic_coco import make_split

    make_split(root, "train", n_train, seed)
    make_split(root, "val", n_val, seed + 1)
    for sub in ("pkldata", "checkpoints", "eval_data", "models",
                "glove.6B", "bin"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    _write_resnet101_pth(os.path.join(root, "models", "resnet101.pth"),
                         seed=seed + 7)
    _write_java_shim(os.path.join(root, "bin", "java"))

    # Vocabulary: built by the REFERENCE's own init.py (authentic
    # Counter order + threshold semantics), threshold 1 so the tiny
    # fixture keeps its words.
    run_reference(root, "init.py", ["--vocab", "True",
                                    "--vocab_threshold", "1"])

    # GloVe: the reference's generate_glove_vectors cannot run without
    # a literal 400k-line glove file (reference: embed.py:29 hard-codes
    # reshape((400000, 300))) and bcolz; its OUTPUT format is a plain
    # pickled (V, 300) float64 matrix that load_glove_vectors consumes
    # (embed.py:64-68). Produce that artifact with icd_tpu's generator
    # in reference-bug-compat mode (all rows random — what the
    # published runs actually trained on, icd_tpu/data/embed.py:9-17);
    # both sides then load the SAME pickle.
    _write_tiny_glove(root)
    env = dict(os.environ, ICD_TPU_ROOT=root, ICD_TPU_GLOVE_REFBUG="1")
    subprocess.run(
        [sys.executable, "-c",
         "from icd_tpu.data.embed import generate_glove_vectors; "
         "generate_glove_vectors()"],
        cwd=REPO_ROOT, env=env, check=True)

    # Local BERT for the bert_attention family: 12 encoder layers so
    # the reference's encoded_layers[11] (attention.py:178-181) selects
    # the final layer exactly as it does on bert-base; wordpiece vocab
    # derived from the reference-built vocab.pkl so every fixture word
    # tokenizes cleanly (both alignment walks need that, see
    # icd_tpu/models/bert_embed.py degradation note).
    subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools",
                                      "make_tiny_bert.py"),
         os.path.join(root, "bertbase"), "--layers", "12"],
        cwd=REPO_ROOT, env=dict(os.environ, ICD_TPU_ROOT=root),
        check=True)
    print("oracle root prepared at {}".format(root), flush=True)


def _write_resnet101_pth(path, seed):
    """A seeded torchvision-format resnet101 state dict (the file the
    reference loads on its cluster hosts, reference: encoder.py:9-20).
    BN running stats are perturbed away from the (0, 1) init so weight
    conversion fidelity is actually exercised."""
    import torch

    sys.path.insert(0, REPO_ROOT)
    from icd_tpu.compat import _build_torchvision_stub

    mods = _build_torchvision_stub()
    torch.manual_seed(seed)
    model = mods["torchvision.models.resnet"].resnet101(pretrained=False)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.uniform_(-0.2, 0.2)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    torch.save(model.state_dict(), path)


def _write_java_shim(path):
    with open(path, "w") as f:
        f.write("#!/bin/sh\nexec {} {} \"$@\"\n".format(
            sys.executable, FAKE_METEOR))
    os.chmod(path, 0o755)


def _write_tiny_glove(root):
    """A small well-formed glove.6B.300d.txt covering a few fixture
    words (exercises the correct-lookup path when REFBUG is off)."""
    import numpy as np

    rng = np.random.default_rng(3)
    words = ["a", "the", "in", "of", "image", "red", "green", "blue",
             "yellow", "circle", "square", "triangle", "top", "bottom",
             "left", "right"]
    with open(os.path.join(root, "glove.6B", "glove.6B.300d.txt"),
              "w") as f:
        for w in words:
            vec = rng.normal(size=300)
            f.write(w + " " + " ".join("%.5f" % v for v in vec) + "\n")


# ------------------------------------------------------------ run-ref

def run_reference(root, script, args, env_extra=None):
    """Run a reference CLI in a fresh subprocess rooted at ``root``."""
    cmd = [sys.executable, os.path.abspath(__file__), "run-ref", root,
           script] + list(args)
    env = dict(os.environ, **(env_extra or {}))
    env["PATH"] = os.path.join(root, "bin") + os.pathsep + env["PATH"]
    subprocess.run(cmd, check=True, env=env)


def _exec_reference(root, script, args):
    """(in-subprocess) bootstrap the shims and runpy the reference CLI."""
    _bootstrap_reference(root)
    sys.argv = [script] + list(args)
    runpy.run_path(os.path.join(REFERENCE_ROOT, script),
                   run_name="__main__")


def _bootstrap_reference(root):
    """(in-subprocess) install the reference-side environment shims."""
    os.chdir(root)
    os.environ["PATH"] = (os.path.join(root, "bin") + os.pathsep +
                          os.environ.get("PATH", ""))

    sys.path.insert(0, REPO_ROOT)  # for icd_tpu.compat
    from icd_tpu.compat import install_reference_shims

    install_reference_shims()
    # Reference modules must win name resolution (models/, dataset,
    # vocabulary, checkpoint, metric, pathconf, train_utils, embed).
    if REFERENCE_ROOT in sys.path:
        sys.path.remove(REFERENCE_ROOT)
    sys.path.insert(0, REFERENCE_ROOT)

    # nltk is installed but its punkt data is not (the reference repo
    # vendors only a .gitkeep, reference: nltk_data/.gitkeep); route
    # word_tokenize to icd_tpu's Treebank implementation on BOTH sides.
    import nltk
    import nltk.tokenize

    from icd_tpu.data.tokenize import word_tokenize as _wt

    nltk.download = lambda *a, **k: True
    nltk.word_tokenize = _wt
    nltk.tokenize.word_tokenize = _wt

    # Reference encoder.py:9-20 only loads the local models/resnet101.pth
    # on its cluster hosts; impersonate one (the alternative branch
    # downloads from torchvision — zero egress here).
    import socket

    socket.gethostname = lambda: "oracle-shannon"

    # torch>=2.6 flipped torch.load's default to weights_only=True,
    # which rejects the reference's own whole-module pickles
    # (reference: checkpoint.py:15-18 predates that). Restore the
    # legacy default for checkpoints this harness itself produced.
    import torch

    # The reference CLIs never seed (only captions.ipynb does,
    # torch.manual_seed(67) in cell 0); seed here so oracle training
    # runs are reproducible — the beam stage depends on a model that
    # reliably completes captions within the 50-step budget.
    torch.manual_seed(int(os.environ.get("ICD_TPU_ORACLE_SEED", "67")))

    _orig_load = torch.load

    def _legacy_load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _legacy_load


# ------------------------------------------------------------ run-ours

def run_ours(root, script, args, env_extra=None):
    cmd = [sys.executable, os.path.abspath(__file__), "run-ours", root,
           script] + list(args)
    env = dict(os.environ, **(env_extra or {}))
    subprocess.run(cmd, check=True, env=env)


def _exec_ours(root, script, args):
    """(in-subprocess) run an icd_tpu CLI on the CPU platform against
    the oracle root (the parity comparison is a numerics check, not a
    perf run; CPU keeps f32 matmuls exact — CLAUDE.md MXU caveat)."""
    _bootstrap_ours(root)
    sys.argv = [script] + list(args)
    runpy.run_path(os.path.join(REPO_ROOT, script), run_name="__main__")


def _bootstrap_ours(root):
    # icd_tpu/__init__.py re-honors the JAX_PLATFORMS env contract (the
    # axon sitecustomize pins it to the TPU), so set BOTH the env var
    # (wins after icd_tpu import) and the config (wins before it).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["ICD_TPU_ROOT"] = root
    os.environ.setdefault(
        "METEOR_CMD", "{} {}".format(sys.executable, FAKE_METEOR))
    sys.path.insert(0, REPO_ROOT)


# ------------------------------------------------------------- compare

METRIC_KEYS = ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
               "ROUGE_L", "CIDEr")


def compare(ref_json, ours_json, metric_tol=1e-6, loss_tol=5e-3):
    """Assert metric-dict parity between a reference-produced and an
    icd_tpu-produced eval_data JSON on the same checkpoint.

    Corpus metrics must agree to metric_tol (they are exact when every
    teacher-forced argmax agrees; summation order differs because the
    reference shuffles its val loader, reference: baseline.py:307).
    Per-sample losses are compared as SORTED lists (same shuffle) to
    loss_tol — torch-CPU vs JAX-CPU f32 through a 101-layer conv stack.
    """
    with open(ref_json) as f:
        ref = json.load(f)
    with open(ours_json) as f:
        ours = json.load(f)

    report = {"ref": ref_json, "ours": ours_json}
    worst_metric = 0.0
    for key in METRIC_KEYS:
        d = abs(ref[key] - ours[key])
        worst_metric = max(worst_metric, d)
        assert d <= metric_tol, (
            "{}: reference {} vs ours {} (diff {:.3g} > tol {:g})".format(
                key, ref[key], ours[key], d, metric_tol))

    rl, ol = sorted(ref["losses"]), sorted(ours["losses"])
    assert len(rl) == len(ol), (len(rl), len(ol))
    worst_loss = max(abs(a - b) for a, b in zip(rl, ol)) if rl else 0.0
    assert worst_loss <= loss_tol, (
        "per-sample loss diff {:.3g} > tol {:g}".format(
            worst_loss, loss_tol))
    mean_d = abs(sum(rl) / len(rl) - sum(ol) / len(ol)) if rl else 0.0

    report.update(ok=True, max_metric_diff=worst_metric,
                  max_sorted_loss_diff=worst_loss, mean_loss_diff=mean_d,
                  n_losses=len(rl))
    print(json.dumps(report), flush=True)
    return report


# ----------------------------------------------------------------- beam

def _exec_beam_ref(root, ckpt, images, k, out_json):
    """(in-subprocess) run the REFERENCE's beam search
    (reference: gen_captions.py:16-131) on ``images`` with the
    whole-module checkpoint, the way captions.ipynb drives it
    (cell 2: .eval() + decoder.device; the beam itself runs under
    no_grad semantics — it only reads)."""
    _bootstrap_reference(root)
    import torch

    import gen_captions as rg  # resolves to the reference module
    from vocabulary import load_vocab

    device = torch.device("cpu")
    chk = torch.load(os.path.join(root, "checkpoints", ckpt),
                     map_location=device)
    encoder = chk["encoder"].eval()
    decoder = chk["decoder"].eval()
    decoder.device = device
    vocab = load_vocab()
    args = argparse.Namespace(beam_size=int(k))

    out = []
    with torch.no_grad():
        for path in images:
            img = rg.load_img(device, path)
            seq, _alphas, found = rg.attention_caption_image_beam_search(
                device, args, img, encoder, decoder, vocab)
            out.append({"image": os.path.basename(path),
                        "found": bool(found),
                        "seq": [int(t) for t in seq],
                        "words": [vocab.i2w[int(t)] for t in seq]})
    with open(out_json, "w") as f:
        json.dump(out, f)


def _exec_beam_ours(root, ckpt, images, k, out_json):
    """(in-subprocess) run icd_tpu's beam search (gen_captions.py /
    icd_tpu/decoding/beam.py) on the converted checkpoint."""
    _bootstrap_ours(root)
    import types

    import jax
    import jax.numpy as jnp

    import gen_captions as og  # OUR root-level module (REPO_ROOT wins)
    from icd_tpu.checkpoint import load_checkpoint, unpack_checkpoint
    from icd_tpu.vocabulary import load_vocab

    args = types.SimpleNamespace(checkpoint=ckpt, beam_size=int(k))
    chk = load_checkpoint(args)  # auto-converts the reference .pth.tar
    _, encoder, decoder, _, _, _ = unpack_checkpoint(chk)
    encoder = jax.tree_util.tree_map(jnp.asarray, encoder)
    decoder = jax.tree_util.tree_map(jnp.asarray, decoder)
    vocab = load_vocab()

    out = []
    for path in images:
        img = og.load_img(path)
        seq, _alphas, found = og.attention_caption_image_beam_search(
            args, img, encoder, decoder, vocab)
        out.append({"image": os.path.basename(path),
                    "found": bool(found),
                    "seq": [int(t) for t in seq],
                    "words": [vocab.i2w[int(t)] for t in seq]})
    with open(out_json, "w") as f:
        json.dump(out, f)


def compare_beam(ref_json, ours_json):
    """Assert the emitted beam sequences are IDENTICAL per image."""
    with open(ref_json) as f:
        ref = json.load(f)
    with open(ours_json) as f:
        ours = json.load(f)
    assert len(ref) == len(ours), (len(ref), len(ours))
    for r, o in zip(ref, ours):
        assert r["image"] == o["image"], (r["image"], o["image"])
        assert r["found"] == o["found"], (r, o)
        assert r["seq"] == o["seq"], (
            "beam divergence on {}:\n  ref  {}\n  ours {}".format(
                r["image"], r["words"], o["words"]))
    report = {"ref": ref_json, "ours": ours_json, "ok": True,
              "n_images": len(ref), "beam_exact": True,
              "n_found": sum(r["found"] for r in ref)}
    print(json.dumps(report), flush=True)
    return report


def beam(root, family="attention", k=5, n_images=4, n_train=48, n_val=24,
         seed=0, epochs=3, batch_size=8):
    """Beam-search parity: the reference's actual
    attention_caption_image_beam_search vs icd_tpu's beam on the same
    converted checkpoint and the same val images, sequences compared
    token-for-token. Trains a dedicated seeded checkpoint
    (oracle_beam_<family>, default 3 epochs — enough that the fixture
    model reliably completes captions inside the reference's 50-step
    budget, exercising the dynamic-k retirement path rather than just
    the not-found fallback)."""
    if not os.path.exists(os.path.join(root, "pkldata", "vocab.pkl")):
        prepare(root, n_train=n_train, n_val=n_val, seed=seed)

    train_flags, model_type, env_extra = FAMILIES[family]
    assert model_type == "attention", (
        "the reference's beam search exists only for the attention "
        "decoder (reference: gen_captions.py:16)")
    env_extra = {key: v.format(root=root) for key, v in env_extra.items()}
    name = "oracle_beam_{}".format(family)
    ckpt = "{}_{}.pth.tar".format(name, epochs - 1)
    if not os.path.exists(os.path.join(root, "checkpoints", ckpt)):
        run_reference(root, "train.py", [
            name, "--epochs", str(epochs), "--batch_size",
            str(batch_size), "--workers", "0", "--print_freq", "1000",
            # 10x the default decoder lr: the 48-caption fixture needs
            # a model that free-runs to <end> within the 50-step beam
            # budget in few epochs (at the default 4e-4 it still emits
            # 'the the the...' after 6 epochs).
            "--decoder_lr", "4e-3",
        ] + train_flags, env_extra)

    img_dir = os.path.join(root, "cocoapi", "images", "val2014")
    images = [os.path.join(img_dir, f)
              for f in sorted(os.listdir(img_dir))[:n_images]]
    ref_out = os.path.join(root, "eval_data",
                           "beam_ref_{}.json".format(family))
    ours_out = os.path.join(root, "eval_data",
                            "beam_ours_{}.json".format(family))

    me = os.path.abspath(__file__)
    env = dict(os.environ, **env_extra)
    env["PATH"] = os.path.join(root, "bin") + os.pathsep + env["PATH"]
    if not os.path.exists(ref_out):  # deterministic in a cached root
        subprocess.run(
            [sys.executable, me, "beam-ref", root, ckpt, ref_out,
             "--k", str(k), "--images", ",".join(images)],
            check=True, env=env)
    subprocess.run(
        [sys.executable, me, "beam-ours", root, ckpt, ours_out,
         "--k", str(k), "--images", ",".join(images)],
        check=True, env=dict(os.environ, **env_extra))
    return compare_beam(ref_out, ours_out)


# --------------------------------------------------------------- export

def _exec_export(root, ckpt, out_path):
    """(in-subprocess) export an icd_tpu checkpoint to the reference's
    whole-module .pth.tar (icd_tpu/export.py)."""
    _bootstrap_ours(root)
    from icd_tpu.checkpoint import load_checkpoint
    from icd_tpu.export import export_reference_checkpoint

    chkpt = load_checkpoint(name=ckpt, verbose=False)
    export_reference_checkpoint(chkpt, out_path,
                                reference_root=REFERENCE_ROOT)
    print("exported {} -> {}".format(ckpt, out_path), flush=True)


def export(root, families=("baseline", "attention"), n_train=48,
           n_val=24, seed=0, epochs=1, batch_size=8):
    """The REVERSE weld: train with icd_tpu, export the checkpoint to
    the reference's .pth.tar format, and have the UNMODIFIED reference
    eval.py evaluate it — metric dicts must agree with our own eval of
    the same checkpoint. Proves icd_tpu-trained models are consumable
    by the reference ecosystem (eval/gen_captions/notebooks/resume)."""
    if not os.path.exists(os.path.join(root, "pkldata", "vocab.pkl")):
        prepare(root, n_train=n_train, n_val=n_val, seed=seed)

    results = []
    for family in families:
        train_flags, model_type, env_extra = FAMILIES[family]
        assert not env_extra, (
            "export oracle supports shim-free families only (bert "
            "exports are loadable only under the same compat shim; "
            "see icd_tpu/export.py docstring)")
        name = "oracle_export_{}".format(family)
        ckpt_ours = "{}_{}.ckpt".format(name, epochs - 1)
        ckpt_ref = "{}_{}.pth.tar".format(name, epochs - 1)
        stem = "{}_{}".format(name, epochs - 1)

        run_ours(root, "train.py", [
            name, "--epochs", str(epochs), "--batch_size",
            str(batch_size), "--workers", "0", "--print_freq", "1000",
        ] + train_flags)
        run_ours(root, "eval.py",
                 [ckpt_ours, "--model_type", model_type,
                  "--print_freq", "1000"])
        ours_json = os.path.join(root, "eval_data",
                                 "ours_{}.json".format(stem))
        shutil.move(os.path.join(root, "eval_data",
                                 "{}.json".format(stem)), ours_json)

        me = os.path.abspath(__file__)
        subprocess.run(
            [sys.executable, me, "export-ours", root, ckpt_ours,
             os.path.join(root, "checkpoints", ckpt_ref)], check=True)

        run_reference(root, "eval.py", [
            ckpt_ref, "--model_type", model_type, "--print_freq",
            "1000"])
        ref_json = os.path.join(root, "eval_data",
                                "{}.json".format(stem))

        results.append(dict(compare(ref_json, ours_json),
                            family=family, direction="ours->reference"))
    print(json.dumps({"oracle": "export ok",
                      "families": list(families)}), flush=True)
    return results


# ---------------------------------------------------------------- full

FAMILIES = {
    # family -> (train flags, eval --model_type, env for BOTH sides;
    # '{root}' in env values is formatted with the oracle root). The
    # five families are the reference's published model matrix
    # (reference: Makefile:6-19).
    "baseline": (["--model", "baseline"], "baseline", {}),
    "glove_baseline": (["--model", "baseline", "--use_glove", "True",
                        "--embed_size", "300",
                        "--fine_tune_embedding", "True"],
                       "baseline", {}),
    "attention": (["--model", "attention", "--attention_dim", "128",
                   "--decoder_dim", "128"], "attention", {}),
    "glove_attention": (["--model", "attention", "--use_glove", "True",
                         "--embed_size", "300", "--attention_dim", "128",
                         "--decoder_dim", "128",
                         "--fine_tune_embedding", "True"],
                        "attention", {}),
    "bert_attention": (["--model", "attention", "--use_bert", "True",
                        "--embed_size", "768", "--attention_dim", "128",
                        "--decoder_dim", "128"],
                       "attention", {"BERT_MODEL_DIR": "{root}/bertbase"}),
}


def full(root, families, n_train=48, n_val=24, seed=0, epochs=1,
         batch_size=8):
    if not os.path.exists(os.path.join(root, "pkldata", "vocab.pkl")):
        prepare(root, n_train=n_train, n_val=n_val, seed=seed)

    results = []
    for family in families:
        train_flags, model_type, env_extra = FAMILIES[family]
        env_extra = {k: v.format(root=root)
                     for k, v in env_extra.items()}
        name = "oracle_{}".format(family)
        ckpt = "{}_{}.pth.tar".format(name, epochs - 1)
        stem = ckpt.split(".")[0]

        # Reference-side artifacts are deterministic given the cached
        # root (see cache_key) — skip stages whose outputs exist.
        ref_json = os.path.join(root, "eval_data",
                                "ref_{}.json".format(stem))
        if not os.path.exists(os.path.join(root, "checkpoints", ckpt)):
            run_reference(root, "train.py", [
                name, "--epochs", str(epochs), "--batch_size",
                str(batch_size), "--workers", "0", "--print_freq",
                "1000"] + train_flags, env_extra)
        if not os.path.exists(ref_json):
            run_reference(root, "eval.py", [
                ckpt, "--model_type", model_type, "--print_freq",
                "1000"], env_extra)
            shutil.move(os.path.join(root, "eval_data",
                                     "{}.json".format(stem)), ref_json)

        run_ours(root, "eval.py",
                 [ckpt, "--model_type", model_type,
                  "--print_freq", "1000"], env_extra)
        ours_json = os.path.join(root, "eval_data",
                                 "{}.json".format(stem))

        results.append(dict(compare(ref_json, ours_json),
                            family=family))
    print(json.dumps({"oracle": "ok", "families": families}), flush=True)
    return results


# ------------------------------------------------------------------ CLI

def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prepare")
    sp.add_argument("root")
    sp.add_argument("--train", type=int, default=48)
    sp.add_argument("--val", type=int, default=24)
    sp.add_argument("--seed", type=int, default=0)

    for cmd in ("run-ref", "run-ours"):
        sp = sub.add_parser(cmd)
        sp.add_argument("root")
        sp.add_argument("script")
        sp.add_argument("args", nargs=argparse.REMAINDER)

    sp = sub.add_parser("compare")
    sp.add_argument("ref_json")
    sp.add_argument("ours_json")
    sp.add_argument("--metric_tol", type=float, default=1e-6)
    sp.add_argument("--loss_tol", type=float, default=5e-3)

    sp = sub.add_parser("full")
    sp.add_argument("root")
    sp.add_argument("--families", default="baseline,glove_baseline,"
                                          "attention,glove_attention,"
                                          "bert_attention")
    sp.add_argument("--train", type=int, default=48)
    sp.add_argument("--val", type=int, default=24)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--epochs", type=int, default=1)
    sp.add_argument("--batch_size", type=int, default=8)

    sp = sub.add_parser("beam")
    sp.add_argument("root")
    sp.add_argument("--family", default="attention")
    sp.add_argument("--k", type=int, default=5)
    sp.add_argument("--n_images", type=int, default=4)
    sp.add_argument("--train", type=int, default=48)
    sp.add_argument("--val", type=int, default=24)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--epochs", type=int, default=3)
    sp.add_argument("--batch_size", type=int, default=8)

    for cmd in ("beam-ref", "beam-ours"):
        sp = sub.add_parser(cmd)
        sp.add_argument("root")
        sp.add_argument("ckpt")
        sp.add_argument("out_json")
        sp.add_argument("--k", type=int, default=5)
        sp.add_argument("--images", required=True,
                        help="comma-separated image paths")

    sp = sub.add_parser("export")
    sp.add_argument("root")
    sp.add_argument("--families", default="baseline,attention")
    sp.add_argument("--train", type=int, default=48)
    sp.add_argument("--val", type=int, default=24)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--epochs", type=int, default=1)
    sp.add_argument("--batch_size", type=int, default=8)

    sp = sub.add_parser("export-ours")
    sp.add_argument("root")
    sp.add_argument("ckpt")
    sp.add_argument("out_path")

    a = p.parse_args()
    if a.cmd == "prepare":
        prepare(a.root, a.train, a.val, a.seed)
    elif a.cmd == "run-ref":
        _exec_reference(a.root, a.script, a.args)
    elif a.cmd == "run-ours":
        _exec_ours(a.root, a.script, a.args)
    elif a.cmd == "compare":
        compare(a.ref_json, a.ours_json, a.metric_tol, a.loss_tol)
    elif a.cmd == "full":
        full(a.root, a.families.split(","), a.train, a.val, a.seed,
             a.epochs, a.batch_size)
    elif a.cmd == "beam":
        beam(a.root, a.family, a.k, a.n_images, a.train, a.val, a.seed,
             a.epochs, a.batch_size)
    elif a.cmd == "beam-ref":
        _exec_beam_ref(a.root, a.ckpt, a.images.split(","), a.k,
                       a.out_json)
    elif a.cmd == "beam-ours":
        _exec_beam_ours(a.root, a.ckpt, a.images.split(","), a.k,
                        a.out_json)
    elif a.cmd == "export":
        export(a.root, a.families.split(","), a.train, a.val, a.seed,
               a.epochs, a.batch_size)
    elif a.cmd == "export-ours":
        _exec_export(a.root, a.ckpt, a.out_path)


if __name__ == "__main__":
    main()
