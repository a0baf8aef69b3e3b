"""Drive tools/acceptance.py END-TO-END against the cached oracle root.

tools/acceptance.py's detect->eval->diff path is unit-tested against
faked artifact layouts (tests/test_acceptance.py), but day-1 real
artifacts should not be the first time the full dispatcher actually
EXECUTES evals and diffs. This tool stages the reference-as-oracle
fixture (tools/ref_oracle.py's cached root: reference-code-produced
checkpoints and eval_data JSONs on synthetic COCO) into the exact
acceptance layout — the oracle's ``.pth.tar`` checkpoints playing the
five pinned families (reference: eval_data/{baseline_3,...}.json,
checkpoint.py:51-60) and the oracle's reference-produced
``ref_oracle_*.json`` playing the published eval_data — then invokes
the unmodified acceptance dispatcher on it.

Usage:
  python tools/acceptance_oracle_drive.py [--stage DIR] [--out FILE]

Requires the oracle cache (running tests/test_oracle.py once builds
it, or: python tools/ref_oracle.py full --train 48 --val 24).
Forces JAX_PLATFORMS=cpu: the oracle weld's bit-identity claim is
same-host CPU arithmetic (NOTES.md round 3), which is what this
rehearsal re-checks.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Pinned-family stem -> (oracle checkpoint stem, oracle ref-JSON name).
STEM_MAP = {
    "baseline_3": ("oracle_baseline_0", "ref_oracle_baseline_0.json"),
    "glove_baseline_3": ("oracle_glove_baseline_0",
                         "ref_oracle_glove_baseline_0.json"),
    "basic_att_3": ("oracle_attention_0", "ref_oracle_attention_0.json"),
    "glove_att_3": ("oracle_glove_attention_0",
                    "ref_oracle_glove_attention_0.json"),
    "bert_attention_3": ("oracle_bert_attention_0",
                         "ref_oracle_bert_attention_0.json"),
}


def stage(oracle_root, stage_root):
    """Symlink the oracle fixture into the acceptance layout: a data
    root with pinned-named checkpoints, and a faux reference tree
    whose eval_data/ holds the reference-produced JSONs."""
    root = os.path.join(stage_root, "root")
    ref = os.path.join(stage_root, "reference")
    if os.path.exists(stage_root):
        shutil.rmtree(stage_root)
    os.makedirs(os.path.join(root, "checkpoints"))
    os.makedirs(os.path.join(root, "eval_data"))
    os.makedirs(os.path.join(ref, "eval_data"))
    for name in ("cocoapi", "pkldata", "glove.6B", "models"):
        src = os.path.join(oracle_root, name)
        if os.path.exists(src):
            os.symlink(src, os.path.join(root, name))
    for stem, (ckpt_stem, ref_json) in STEM_MAP.items():
        os.symlink(
            os.path.join(oracle_root, "checkpoints",
                         ckpt_stem + ".pth.tar"),
            os.path.join(root, "checkpoints", stem + ".pth.tar"))
        os.symlink(
            os.path.join(oracle_root, "eval_data", ref_json),
            os.path.join(ref, "eval_data", stem + ".json"))
    return root, ref


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--stage", default="/tmp/acceptance_oracle_stage")
    p.add_argument("--out", default=None,
                   help="write the acceptance verdict JSON here too")
    args = p.parse_args(argv)

    from tools.ref_oracle import cached_root

    oracle_root = cached_root()
    missing = [s for s, (c, r) in STEM_MAP.items()
               if not os.path.exists(os.path.join(
                   oracle_root, "checkpoints", c + ".pth.tar"))
               or not os.path.exists(os.path.join(
                   oracle_root, "eval_data", r))]
    if missing:
        raise SystemExit(
            "oracle cache incomplete (run tests/test_oracle.py once); "
            "missing artifacts for: " + ", ".join(missing))

    root, ref = stage(oracle_root, args.stage)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               BERT_MODEL_DIR=os.path.join(oracle_root, "bertbase"))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "acceptance.py"),
         "--root", root, "--reference", ref],
        env=env, capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout, end="")
    if args.out and proc.stdout.strip():
        verdict = json.loads(proc.stdout.strip().splitlines()[-1])
        verdict["staged_from"] = oracle_root
        with open(args.out, "w") as f:
            json.dump(verdict, f, indent=1)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
