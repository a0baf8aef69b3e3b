"""Acceptance-protocol dress rehearsal at real corpus scale.

Runs the exact BASELINE.json acceptance workflow (reference:
Makefile:6-34, training_output/baseline_0.out) end to end on an
acceptance-scale synthetic COCO (tools/make_synthetic_coco.py
--acceptance_scale: 82,783/40,504 images, 414,113/202,654 captions) and
measures wall-clock per phase, so the only major claim never exercised
at scale — "the host side keeps up with the device at 414k captions" —
is measured instead of asserted:

  vocab   init.py --vocab True          (414k-caption Treebank build)
  train   train.py 'basic_baseline' --model baseline --batch_size 32
          --epochs 1 --max_caption_length -1 --workers 32
          (the verbatim `make baseline` config; reference epoch:
          874 s on its CPU cluster, training_output/baseline_0.out)
  eval    eval.py <ckpt> --model_type baseline
          (202,654-caption teacher-forced eval + corpus scoring — the
          reference's slowest workload, models/baseline.py:267-374)

Usage:
  python tools/acceptance_rehearsal.py --root /tmp/acceptance_coco \
      [--phases vocab,train,eval] [--model baseline] [--out FILE]
      [--print_freq N] [--image_cache_gb G] [--native_loader]

Emits one JSON line per phase and a final summary JSON (also written to
--out). Phase stdout is streamed to <out>.<phase>.log so a stalled run
is diagnosable mid-flight.
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    # Verbatim `make baseline` / `make attention` flag sets
    # (reference: Makefile:6-14) minus the slurm wrapper.
    "baseline": ["basic_baseline", "--model", "baseline",
                 "--batch_size", "32", "--epochs", "1",
                 "--max_caption_length", "-1", "--workers", "32"],
    "attention": ["basic_att", "--model", "attention",
                  "--batch_size", "16", "--epochs", "1",
                  "--max_caption_length", "-1", "--workers", "80"],
}
CKPT = {"baseline": "basic_baseline_0.ckpt",
        "attention": "basic_att_0.ckpt"}


def run_phase(name, cmd, env, log_path, cwd):
    print(json.dumps({"phase": name, "event": "start",
                      "cmd": cmd}), flush=True)
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, env=env, cwd=cwd,
                              stdout=log, stderr=subprocess.STDOUT)
    wall = time.time() - t0
    tail = ""
    try:
        with open(log_path) as f:
            tail = "".join(f.readlines()[-8:])
    except OSError:
        pass
    rec = {"phase": name, "event": "done", "wall_s": round(wall, 1),
           "rc": proc.returncode, "log": log_path, "tail": tail[-800:]}
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root", required=True,
                   help="acceptance-scale synthetic COCO root")
    p.add_argument("--phases", default="vocab,train,eval")
    p.add_argument("--model", default="baseline",
                   choices=sorted(CONFIGS))
    p.add_argument("--out", default=None,
                   help="summary JSON path (default <root>/rehearsal_"
                        "<model>.json)")
    p.add_argument("--print_freq", type=int, default=1,
                   help="train/eval --print_freq (1 = reference parity)")
    p.add_argument("--image_cache_gb", type=float, default=16.0,
                   help="ICD_TPU_IMAGE_CACHE for the phases (decoded-"
                        "image host cache; 82,783 images x 224x224x3 "
                        "= 12.5 GB)")
    p.add_argument("--native_loader", action="store_true",
                   help="ICD_TPU_NATIVE_LOADER=1 (libjpeg decode, "
                        "~1.7x PIL, <1 LSB pixel delta)")
    p.add_argument("--device_image_cache_gb", type=float, default=0.0,
                   help="ICD_TPU_DEVICE_IMAGE_CACHE (GB): device-side "
                        "unique-image cache — each distinct image "
                        "crosses the host->HBM link once per run "
                        "instead of once per caption sample "
                        "(bit-identical losses; "
                        "data.pipeline.DeviceImageCache). 82,783 train "
                        "images x 224x224x3 = 11.6 GiB; val needs 5.7")
    p.add_argument("--amp", action="store_true",
                   help="add --amp True to the train phase (TPU "
                        "extension row; default is the reference's "
                        "f32 numerics)")
    p.add_argument("--epochs", type=int, default=1,
                   help="train-phase epoch count. The reference's own "
                        "published multi-epoch run is 4 epochs in "
                        "5350.7 s (training_output/baseline_3.out); "
                        "--epochs 4 reproduces that workload so the "
                        "warm-cache epochs 2+ are measured, not "
                        "extrapolated")
    args = p.parse_args(argv)

    root = os.path.abspath(args.root)
    out = args.out or os.path.join(
        root, "rehearsal_{}.json".format(args.model))
    env = dict(os.environ, ICD_TPU_ROOT=root,
               ICD_TPU_IMAGE_CACHE=str(args.image_cache_gb))
    # Scoring backend for the eval phase: same pecking order as
    # tools/acceptance.py — the real jar+java pair when both exist,
    # else the pure-Python METEOR 1.5.
    jar = env.get("METEOR_JAR") or os.path.join(
        REPO_ROOT, "..", "reference", "eval_func", "meteor",
        "meteor-1.5.jar")
    if os.path.exists(jar) and shutil.which("java"):
        env["METEOR_JAR"] = jar
    else:
        env.setdefault("ICD_TPU_METEOR_PY", "1")
    if args.native_loader:
        env["ICD_TPU_NATIVE_LOADER"] = "1"
    if args.device_image_cache_gb > 0:
        env["ICD_TPU_DEVICE_IMAGE_CACHE"] = str(
            args.device_image_cache_gb)

    phases = [s.strip() for s in args.phases.split(",") if s.strip()]
    records = []
    for phase in phases:
        if phase == "vocab":
            cmd = [sys.executable, os.path.join(REPO_ROOT, "init.py"),
                   "--vocab", "True"]
        elif phase == "train":
            cfg = list(CONFIGS[args.model])
            cfg[cfg.index("--epochs") + 1] = str(args.epochs)
            cmd = ([sys.executable, os.path.join(REPO_ROOT, "train.py")]
                   + cfg + ["--print_freq", str(args.print_freq)])
            if args.amp:
                cmd += ["--amp", "True"]
        elif phase == "eval":
            ckpt = CKPT[args.model].replace(
                "_0.ckpt", "_{}.ckpt".format(args.epochs - 1))
            cmd = [sys.executable, os.path.join(REPO_ROOT, "eval.py"),
                   ckpt, "--model_type", args.model,
                   "--print_freq", str(args.print_freq)]
        else:
            raise SystemExit("unknown phase: " + phase)
        rec = run_phase(phase, cmd, env,
                        "{}.{}.log".format(out, phase), root)
        records.append(rec)
        if rec["rc"] != 0:
            break

    # Pull the self-reported train/eval durations out of the logs so
    # the summary separates process overhead (imports, first compile)
    # from the measured loops.
    for rec in records:
        try:
            with open(rec["log"]) as f:
                text = f.read()
        except OSError:
            continue
        m = re.search(r"finished training for \d+ epochs in ([\d.]+)",
                      text)
        if m:
            rec["train_loop_s"] = float(m.group(1))
            # Per-epoch attribution: the per-batch Time column is
            # dispatch-to-dispatch host pacing, so its per-epoch sum
            # approximates each epoch's share of the loop — this is
            # what makes the cold (cache-populating) epoch 1 vs the
            # warm epochs 2+ split a recorded fact rather than an
            # extrapolation.
            sums = {}
            for ep, dt in re.findall(
                    r"Epoch (\d+)/\d+, Batch \d+/\d+, "
                    r"Loss [\d.]+, Time: ([\d.]+)", text):
                sums[int(ep)] = sums.get(int(ep), 0.0) + float(dt)
            if sums:
                rec["epoch_time_sums_s"] = [
                    round(sums[k], 1) for k in sorted(sums)]
        m = re.search(r"finished evaluation in ([\d.]+)", text)
        if m:
            rec["eval_loop_s"] = float(m.group(1))
        del rec["tail"]

    summary = {
        "root": root, "model": args.model,
        "print_freq": args.print_freq,
        "native_loader": bool(args.native_loader),
        "image_cache_gb": args.image_cache_gb,
        "device_image_cache_gb": args.device_image_cache_gb,
        "amp": bool(args.amp),
        "reference_epoch_s": 874.0,  # training_output/baseline_0.out
        "phases": records,
        "ok": all(r["rc"] == 0 for r in records),
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
