"""Day-1 acceptance dispatcher: detect which REAL artifacts exist and
run whatever subset of the BASELINE.json acceptance protocol they
unlock, printing one JSON verdict line.

The full acceptance ("reproduce the reference eval_data/*.json
bit-for-caption on the pinned checkpoints", BASELINE.json north star;
reference: eval_data/baseline_3.json, checkpoint.py:8-36) needs
artifacts this container cannot fetch (zero egress): real COCO-2014,
the five pinned ``.pth.tar`` checkpoints, ``meteor-1.5.jar`` + java,
and (for training reruns) ``resnet101.pth`` / GloVe / bert-base. This
tool mechanizes the check that used to live in prose (NOTES.md
"Environmental unlocks"): probe each artifact, then for every family
whose checkpoint + data are present, run our ``eval.py`` on the pinned
checkpoint and diff the produced JSON against the reference's published
``eval_data/<stem>.json`` (metrics to tolerance, per-sample losses as
sorted lists — the reference's val loader shuffles, reference:
models/baseline.py:307).

Usage:
  python tools/acceptance.py [--root DIR] [--reference /root/reference]
         [--families baseline_3,glove_baseline_3,basic_att_3,
                     glove_att_3,bert_attention_3]
         [--metric_tol 1e-4] [--loss_tol 5e-3] [--detect_only]

Exit code 0 when every *unlocked* family passes (a fully locked
environment exits 0 with acceptance="locked" — nothing testable is
failing); 1 when any unlocked family fails.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Published family stems (reference: eval_data/*.json names) -> the
# eval.py --model_type that evaluates them and whether the family needs
# BERT weights at eval time (teacher forcing restores --use_bert from
# the pickled module, reference: models/attention.py:96,242-247).
FAMILIES = {
    "baseline_3": ("baseline", False),
    "glove_baseline_3": ("baseline", False),
    "basic_att_3": ("attention", False),
    "glove_att_3": ("attention", False),
    "bert_attention_3": ("attention", True),
}

METRIC_KEYS = ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
               "ROUGE_L", "CIDEr")


def _nonempty_dir(path):
    try:
        next(iter(os.scandir(path)))
        return True
    except (StopIteration, FileNotFoundError, NotADirectoryError):
        return False


def find_checkpoint(stem, root, reference):
    """Pinned checkpoint for a family: reference format preferred
    (that is what 'pinned' means), icd_tpu .ckpt accepted — our
    checkpoint loader converts .pth.tar transparently either way."""
    for base in (os.path.join(root, "checkpoints"),
                 os.path.join(reference, "checkpoints")):
        for ext in (".pth.tar", ".ckpt"):
            p = os.path.join(base, stem + ext)
            if os.path.exists(p):
                return p
    return None


def detect(root, reference):
    """Probe every environmental unlock; pure detection, no execution."""
    ann = os.path.join(root, "cocoapi", "annotations")
    imgs = os.path.join(root, "cocoapi", "images")
    jar = os.environ.get("METEOR_JAR") or os.path.join(
        reference, "eval_func", "meteor", "meteor-1.5.jar")
    found = {
        "coco_train": (
            os.path.exists(os.path.join(ann, "captions_train2014.json"))
            and _nonempty_dir(os.path.join(imgs, "train2014"))),
        "coco_val": (
            os.path.exists(os.path.join(ann, "captions_val2014.json"))
            and _nonempty_dir(os.path.join(imgs, "val2014"))),
        "vocab_pkl": os.path.exists(
            os.path.join(root, "pkldata", "vocab.pkl")),
        "meteor_jar": os.path.exists(jar),
        "java": shutil.which("java") is not None,
        "meteor_py_fallback": True,  # always shipped (eval_func/meteor_py)
        "resnet101_pth": os.path.exists(
            os.path.join(root, "models", "resnet101.pth")),
        "glove_txt": os.path.exists(
            os.path.join(root, "glove.6B", "glove.6B.300d.txt")),
        "bert_weights": _nonempty_dir(os.environ.get("BERT_MODEL_DIR", "")),
    }
    found["checkpoints"] = {
        stem: find_checkpoint(stem, root, reference)
        for stem in FAMILIES}
    found["reference_eval_data"] = {
        stem: os.path.exists(
            os.path.join(reference, "eval_data", stem + ".json"))
        for stem in FAMILIES}
    return found


def soft_compare(ref_path, ours_path, metric_tol, loss_tol):
    """Non-asserting eval_data diff (report, don't crash): metrics to
    metric_tol; per-sample losses length-checked and compared sorted."""
    with open(ref_path) as f:
        ref = json.load(f)
    with open(ours_path) as f:
        ours = json.load(f)
    problems = []
    worst_metric = 0.0
    for key in METRIC_KEYS:
        d = abs(ref[key] - ours[key])
        worst_metric = max(worst_metric, d)
        if d > metric_tol:
            problems.append("{}: ref {} vs ours {}".format(
                key, ref[key], ours[key]))
    rl, ol = sorted(ref.get("losses", [])), sorted(ours.get("losses", []))
    worst_loss = None
    if len(rl) != len(ol):
        problems.append("losses length: ref {} vs ours {}".format(
            len(rl), len(ol)))
    elif rl:
        worst_loss = max(abs(a - b) for a, b in zip(rl, ol))
        if worst_loss > loss_tol:
            problems.append(
                "sorted per-sample loss diff {:.3g}".format(worst_loss))
    return {"ok": not problems, "max_metric_diff": worst_metric,
            "max_sorted_loss_diff": worst_loss, "n_losses": len(ol),
            "problems": problems}


def run_family(stem, ckpt, root, reference, metric_tol, loss_tol):
    """Eval one pinned checkpoint through our CLI and diff the JSON."""
    model_type, _ = FAMILIES[stem]
    env = dict(os.environ, ICD_TPU_ROOT=root)
    # METEOR backend pecking order: real jar+java if present (the full
    # acceptance), else the pure-Python METEOR 1.5 (faithful on the
    # id-string protocol — see icd_tpu/eval_func/meteor_py.py).
    jar = env.get("METEOR_JAR") or os.path.join(
        reference, "eval_func", "meteor", "meteor-1.5.jar")
    if os.path.exists(jar) and shutil.which("java"):
        env["METEOR_JAR"] = jar
        meteor = "jar"
    else:
        env.setdefault("ICD_TPU_METEOR_PY", "1")
        meteor = "python"

    ckpt_dir = os.path.join(root, "checkpoints")
    local = os.path.join(ckpt_dir, os.path.basename(ckpt))
    if not os.path.exists(local):  # reference-dir checkpoint: link in
        os.makedirs(ckpt_dir, exist_ok=True)
        os.symlink(ckpt, local)

    ours_json = os.path.join(root, "eval_data", stem + ".json")
    if os.path.exists(ours_json):
        os.remove(ours_json)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "eval.py"),
         os.path.basename(local), "--model_type", model_type,
         "--print_freq", "1000"],
        env=env, cwd=root, capture_output=True, text=True)
    if proc.returncode != 0 or not os.path.exists(ours_json):
        return {"family": stem, "ok": False, "meteor": meteor,
                "problems": ["eval.py failed (rc={}): {}".format(
                    proc.returncode, proc.stderr[-1500:])]}
    ref_json = os.path.join(reference, "eval_data", stem + ".json")
    rep = soft_compare(ref_json, ours_json, metric_tol, loss_tol)
    rep.update(family=stem, meteor=meteor)
    return rep


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root", default=os.environ.get("ICD_TPU_ROOT", "."),
                   help="data root (reference repo layout)")
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--families", default=",".join(FAMILIES))
    p.add_argument("--metric_tol", type=float, default=1e-4,
                   help="corpus-metric tolerance vs the published JSONs "
                        "(real runs cross torch-cluster vs JAX-TPU "
                        "arithmetic; the oracle weld's bit-identity was "
                        "same-host CPU)")
    p.add_argument("--loss_tol", type=float, default=5e-3)
    p.add_argument("--detect_only", action="store_true",
                   help="print the unlock report without running evals")
    args = p.parse_args(argv)

    root = os.path.abspath(args.root)
    found = detect(root, args.reference)

    # METEOR is scoreable iff jar+java or the Python fallback — always
    # true here, but the verdict line records WHICH backend would run.
    runnable = []
    blocked = {}
    for stem in [s.strip() for s in args.families.split(",") if s.strip()]:
        if stem not in FAMILIES:
            blocked[stem] = "unknown family"
            continue
        _, needs_bert = FAMILIES[stem]
        missing = []
        if not found["coco_val"]:
            missing.append("coco_val")
        if not (found["vocab_pkl"] or found["coco_train"]):
            missing.append("vocab_pkl|coco_train")
        if not found["checkpoints"][stem]:
            missing.append("checkpoint")
        if not found["reference_eval_data"][stem]:
            missing.append("reference_eval_data")
        if needs_bert and not found["bert_weights"]:
            missing.append("bert_weights(BERT_MODEL_DIR)")
        if missing:
            blocked[stem] = "missing: " + ", ".join(missing)
        else:
            runnable.append(stem)

    results = []
    if not args.detect_only and runnable:
        if not found["vocab_pkl"]:  # buildable: coco_train is present
            subprocess.run(
                [sys.executable, os.path.join(REPO_ROOT, "init.py"),
                 "--vocab", "True"],
                env=dict(os.environ, ICD_TPU_ROOT=root), cwd=root,
                check=True)
        for stem in runnable:
            results.append(run_family(
                stem, found["checkpoints"][stem], root, args.reference,
                args.metric_tol, args.loss_tol))

    ok = all(r["ok"] for r in results)
    verdict = {
        "acceptance": ("locked" if not runnable else
                       "detect_only" if args.detect_only else
                       "ok" if ok else "failed"),
        "ok": ok,
        "unlocked": {k: v for k, v in found.items()
                     if k not in ("checkpoints", "reference_eval_data")},
        "checkpoints": found["checkpoints"],
        "runnable": runnable,
        "blocked": blocked,
        "results": results,
    }
    print(json.dumps(verdict), flush=True)
    return 0 if (ok or args.detect_only) else 1


if __name__ == "__main__":
    sys.exit(main())
