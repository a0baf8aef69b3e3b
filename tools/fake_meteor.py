"""Deterministic stand-in for meteor-1.5.jar speaking its stdio protocol.

The real jar (and a Java runtime) is absent from this container — and
from the reference snapshot itself (reference: .MISSING_LARGE_BLOBS) —
so the oracle harness (tools/ref_oracle.py) gives BOTH sides the same
fake scorer: the reference's Meteor wrapper launches ``java -jar ...
-stdio`` (reference: eval_func/meteor/meteor.py:18-24), which resolves
to this script via a PATH shim; icd_tpu's wrapper reaches it through
``METEOR_CMD``. Identical SCORE lines then yield identical numbers on
both sides, making the METEOR column comparable in oracle parity runs.

Protocol (reference: eval_func/meteor/meteor.py:33-58):
  ``SCORE ||| ref_1 ||| ... ||| ref_n ||| hypothesis`` -> one stats line
  ``EVAL ||| stats_1 ||| ... ||| stats_m``             -> m per-segment
  scores, one per line, followed by the aggregate score.

The fake "stats" IS the segment score: METEOR-flavoured unigram
F-mean, max over references, of 10PR / (R + 9P). The aggregate is the
mean over segments (order-invariant, as required by the reference
eval's shuffled val loader).
"""

import sys


def _segment_score(refs, hyp):
    hyp_tokens = hyp.split()
    if not hyp_tokens:
        return 0.0
    best = 0.0
    for ref in refs:
        ref_tokens = ref.split()
        if not ref_tokens:
            continue
        # Clipped unigram matches (multiset intersection).
        counts = {}
        for t in ref_tokens:
            counts[t] = counts.get(t, 0) + 1
        matches = 0
        for t in hyp_tokens:
            if counts.get(t, 0) > 0:
                counts[t] -= 1
                matches += 1
        if matches == 0:
            continue
        p = matches / len(hyp_tokens)
        r = matches / len(ref_tokens)
        best = max(best, 10.0 * p * r / (r + 9.0 * p))
    return best


def main():
    out = sys.stdout
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line.startswith("SCORE"):
            parts = line.split(" ||| ")
            refs, hyp = parts[1:-1], parts[-1]
            out.write("{:.8f}\n".format(_segment_score(refs, hyp)))
            out.flush()
        elif line.startswith("EVAL"):
            stats = [float(s) for s in line.split(" ||| ")[1:]]
            for s in stats:
                out.write("{:.8f}\n".format(s))
            mean = sum(stats) / len(stats) if stats else 0.0
            out.write("{:.8f}\n".format(mean))
            out.flush()


if __name__ == "__main__":
    main()
