"""meteor-1.5.jar stdio-protocol server backed by the pure-Python
METEOR (icd_tpu/eval_func/meteor_py.py).

Speaks exactly the protocol the reference's Meteor wrapper drives
(reference: eval_func/meteor/meteor.py:33-58):

  ``SCORE ||| ref_1 ||| ... ||| ref_n ||| hypothesis``
      -> one sufficient-statistics line (best-scoring reference's
         stats, SegmentStats.to_line)
  ``EVAL ||| stats_1 ||| ... ||| stats_m``
      -> m per-segment scores, one per line, then the aggregate score
         computed from the SUMMED stats (the jar's aggregation — not a
         mean of segment scores).

Jar-style flags (``- - -stdio -l en -norm`` ...) are accepted and
ignored except ``-m exact`` / ICD_TPU_METEOR_EXACT=1, which disable the
stem module. On the reference eval protocol's id-string captions the
two configurations are provably identical (meteor_py docstring), so
this server is a faithful jar replacement there; on surface words the
stem module approximates the jar (no synonym/paraphrase stages).

Use as ``METEOR_CMD="python tools/meteor_stdio.py"`` for icd_tpu, or
behind a PATH ``java`` shim for the unmodified reference
(tools/ref_oracle.py does both).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from icd_tpu.eval_func.meteor_py import (  # noqa: E402
    SegmentStats, best_reference_stats)


def main(argv):
    use_stem = not (os.environ.get("ICD_TPU_METEOR_EXACT")
                    or ("-m" in argv
                        and argv[argv.index("-m") + 1:][:1] == ["exact"]))
    out = sys.stdout
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line.startswith("SCORE"):
            parts = line.split(" ||| ")
            refs, hyp = parts[1:-1], parts[-1]
            stats = best_reference_stats(hyp, refs, use_stem=use_stem)
            out.write(stats.to_line() + "\n")
            out.flush()
        elif line.startswith("EVAL"):
            blobs = line.split(" ||| ")[1:]
            total = SegmentStats()
            for blob in blobs:
                s = SegmentStats.from_line(blob)
                out.write("{:.8f}\n".format(s.score()))
                total += s
            out.write("{:.8f}\n".format(total.score()))
            out.flush()


if __name__ == "__main__":
    main(sys.argv[1:])
