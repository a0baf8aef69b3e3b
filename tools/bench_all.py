"""One-session measurement battery for the README perf table.

Runs every bench the table cites, each in a FRESH process (the replay
cache can serve identical programs across processes — CLAUDE.md tunnel
recipe) and strictly sequentially (remote compiles serialize; host
contention corrupts timings). Captures all stdout into one
timestamped JSON session file so "rows within a family come from one
measurement session" is a recorded fact, not a claim.

Run on the real chip (tunnel up, quiet host):

    python tools/bench_all.py [--out bench_session.json] [--skip beam]

Order: headline first (the driver metric), then training, then the
slow-compiling side benches.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BATTERY = [
    # (name, argv, timeout_s)
    ("serving_int8", [sys.executable, "bench.py"], 1800),
    ("serving_bf16", [sys.executable, "bench.py"], 1800),
    ("train_baseline", [sys.executable, "tools/bench_train.py"], 1800),
    ("train_attention",
     [sys.executable, "tools/bench_train.py", "--attention"], 1800),
    ("attention_floor",
     [sys.executable, "tools/bench_attention_floor.py"], 1800),
    ("serving_attention", [sys.executable, "tools/bench_attention.py"],
     1800),
    ("int8_decoder", [sys.executable, "tools/bench_int8.py"], 1800),
    ("beam", [sys.executable, "tools/bench_beam.py"], 3600),
    # bert family rows (device-only; the host-torch rows are ~10 min
    # and stable session to session — tools/bench_bert.py --skip-host).
    ("train_bert",
     [sys.executable, "tools/bench_bert.py", "--skip-host",
      "--imgcache"], 3600),
    # Per-component decomposition of the overlapped bert step (the
    # VERDICT r4 #2 floor accounting) — same session as the row it
    # explains.
    ("bert_decompose",
     [sys.executable, "tools/bench_bert.py", "--decompose"], 3600),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="bench_session.json")
    parser.add_argument("--skip", default="",
                        help="comma-separated battery names to skip")
    args = parser.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    session = {"started": time.strftime("%Y-%m-%d %H:%M:%S"),
               "results": []}
    for name, argv, timeout_s in BATTERY:
        if name in skip:
            session["results"].append({"name": name, "skipped": True})
            continue
        env = dict(os.environ)
        env.pop("ICD_TPU_BENCH_BF16", None)  # only serving_bf16 sets it
        if name == "serving_bf16":
            env["ICD_TPU_BENCH_BF16"] = "1"
        print("=== {} ===".format(name), flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(argv, cwd=REPO, env=env,
                                  capture_output=True, text=True,
                                  timeout=timeout_s)
            rec = {"name": name, "rc": proc.returncode,
                   "seconds": round(time.time() - t0, 1),
                   "stdout": proc.stdout[-8000:],
                   "stderr": proc.stderr[-2000:]}
        except subprocess.TimeoutExpired as exc:
            def _tail(raw, n):
                if isinstance(raw, bytes):
                    return raw[-n:].decode("utf-8", "replace")
                return (raw or "")[-n:]
            rec = {"name": name, "rc": "timeout",
                   "seconds": round(time.time() - t0, 1),
                   "stdout": _tail(exc.stdout, 8000),
                   # bench.py heartbeats to stderr; keep it so a
                   # timed-out row still shows the attempt/deadline.
                   "stderr": _tail(exc.stderr, 2000)}
        print(rec["stdout"], flush=True)
        session["results"].append(rec)
        # Persist incrementally so a later hang doesn't lose rows.
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(session, f, indent=1)
    print("session written to {}".format(args.out), flush=True)


if __name__ == "__main__":
    main()
