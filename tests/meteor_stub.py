"""Stand-in for meteor-1.5.jar's -stdio protocol (test double).

Protocol (reference: eval_func/meteor/meteor.py:33-58):
  in:  SCORE ||| ref 1 ||| ... ||| ref n ||| hypothesis
  out: one stats line
  in:  EVAL ||| stats_1 ||| ... ||| stats_m
  out: m per-segment score lines, then one final aggregate line

The stub's 'stats' is the hypothesis word count; scores are
deterministic functions of the stats so the wrapper's line accounting
can be asserted exactly.
"""

import sys


def main():
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line.startswith("SCORE"):
            parts = line.split(" ||| ")
            hyp = parts[-1]
            print(len(hyp.split()))
            sys.stdout.flush()
        elif line.startswith("EVAL"):
            stats = line.split(" ||| ")[1:]
            vals = [float(s) for s in stats]
            for v in vals:
                print(v / 100.0)
            print(sum(vals) / 100.0)
            sys.stdout.flush()


if __name__ == "__main__":
    main()
