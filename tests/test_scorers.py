"""Scorer parity tests.

Differential tests import the reference's vendored scorers directly from
/root/reference (read-only) and check our independent implementations
produce identical numbers on randomized corpora — the strongest
available stand-in for the eval_data golden files, whose pinned
checkpoints are not shipped in this snapshot.
"""

import random
import sys

import numpy as np
import pytest

from icd_tpu.eval_func.bleu import Bleu
from icd_tpu.eval_func.cider import Cider
from icd_tpu.eval_func.rouge import Rouge, lcs_length
from icd_tpu.metric import AccumulatingMetric, get_eval_score

REFERENCE_ROOT = "/root/reference"


def _reference_scorers():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from eval_func.bleu.bleu import Bleu as RefBleu
    from eval_func.cider.cider import Cider as RefCider
    from eval_func.rouge.rouge import Rouge as RefRouge

    return RefBleu, RefCider, RefRouge


def _random_corpus(n_images, vocab=30, seed=0):
    rng = random.Random(seed)

    def sentence():
        return " ".join(str(rng.randrange(vocab))
                        for _ in range(rng.randrange(3, 15)))

    gts = [[sentence() for _ in range(rng.randrange(1, 4))]
           for _ in range(n_images)]
    res = [[sentence()] for _ in range(n_images)]
    # Make some hypotheses overlap heavily with a reference.
    for i in range(0, n_images, 3):
        words = gts[i][0].split()
        if len(words) > 2:
            words[1] = str(rng.randrange(vocab))
        res[i] = [" ".join(words)]
    return gts, res


def _edge_corpus():
    """Degenerate shapes: single-word hyps (zero n-gram guesses for
    n>1), identical refs, repeated tokens, hyp longer than every ref."""
    gts = [
        ["5"],                      # one-word ref
        ["1 1 1 1", "1 1"],         # repeated tokens, identical-ish refs
        ["2 3", "2 3"],             # duplicated refs
        ["7 8 9"],
    ]
    res = [["5"], ["1 1 1"], ["2"], ["7 8 9 10 11 12 13"]]
    return gts, res


def test_bleu_edge_cases_match_reference():
    RefBleu, _, _ = _reference_scorers()
    gts, res = _edge_corpus()
    ours, _ = Bleu(4).compute_score(gts, res)
    theirs, _ = RefBleu(4).compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_cider_edge_cases_match_reference():
    _, RefCider, _ = _reference_scorers()
    gts, res = _edge_corpus()
    ours, ours_per = Cider().compute_score(gts, res)
    theirs, theirs_per = RefCider().compute_score(gts, res)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


def test_rouge_edge_cases_match_reference():
    _, _, RefRouge = _reference_scorers()
    gts, res = _edge_corpus()
    ours, ours_per = Rouge().compute_score(gts, res)
    theirs, theirs_per = RefRouge().compute_score(gts, res)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 2), (2, 7), (3, 40)])
def test_bleu_matches_reference(seed, n):
    RefBleu, _, _ = _reference_scorers()
    gts, res = _random_corpus(n, seed=seed)
    ours, ours_per = Bleu(4).compute_score(gts, res)
    theirs, theirs_per = RefBleu(4).compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 2), (2, 7), (3, 40)])
def test_cider_matches_reference(seed, n):
    _, RefCider, _ = _reference_scorers()
    gts, res = _random_corpus(n, seed=seed)
    ours, ours_per = Cider().compute_score(gts, res)
    theirs, theirs_per = RefCider().compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


@pytest.mark.parametrize("seed,n", [(0, 1), (2, 7), (3, 40)])
def test_rouge_matches_reference(seed, n):
    _, _, RefRouge = _reference_scorers()
    gts, res = _random_corpus(n, seed=seed)
    ours, ours_per = Rouge().compute_score(gts, res)
    theirs, theirs_per = RefRouge().compute_score(gts, res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
    np.testing.assert_allclose(ours_per, theirs_per, rtol=1e-12)


def test_duplicated_reference_protocol_bitwise():
    """The eval drivers duplicate the ONE ground-truth caption once per
    token position (reference: models/baseline.py:345-350). Our scorers
    dedupe those duplicates at corpus scale (icd_tpu/eval_func/
    {cider,rouge,meteor_py}.py) — the dedup must be BITWISE invisible
    vs the reference's vendored scorers on exactly that corpus shape."""
    RefBleu, RefCider, RefRouge = _reference_scorers()
    rng = random.Random(11)
    gts, res = [], []
    for _ in range(30):
        n_tok = rng.randrange(4, 14)
        cap = " ".join(str(rng.randrange(2, 40)) for _ in range(n_tok))
        hyp = cap.split()
        for i in range(len(hyp)):
            if rng.random() < 0.3:
                hyp[i] = str(rng.randrange(2, 40))
        gts.append([cap] * n_tok)
        res.append([" ".join(hyp)])

    for Ours, Ref in ((Bleu, RefBleu), (Cider, RefCider),
                      (Rouge, RefRouge)):
        ours, ours_per = (Ours(4) if Ours is Bleu
                          else Ours()).compute_score(gts, res)
        theirs, theirs_per = (Ref(4) if Ref is RefBleu
                              else Ref()).compute_score(gts, res)
        np.testing.assert_array_equal(np.asarray(ours),
                                      np.asarray(theirs))
        np.testing.assert_array_equal(np.asarray(ours_per),
                                      np.asarray(theirs_per))


def test_meteor_py_duplicate_refs_identical_to_undeduped():
    """best_reference_stats skips duplicate reference strings; the
    result must equal scoring the duplicates literally."""
    from icd_tpu.eval_func import meteor_py

    rng = random.Random(13)
    for _ in range(20):
        n_tok = rng.randrange(3, 12)
        cap = " ".join(str(rng.randrange(2, 30)) for _ in range(n_tok))
        other = " ".join(str(rng.randrange(2, 30))
                         for _ in range(rng.randrange(3, 12)))
        hyp = " ".join(str(rng.randrange(2, 30)) for _ in range(n_tok))
        refs = [cap] * n_tok + [other, cap]
        fast = meteor_py.best_reference_stats(hyp, refs, use_stem=True)
        # Literal (undeduped) evaluation path:
        slow_best, slow_score = None, -1.0
        for r in refs:
            s = meteor_py.segment_stats(hyp.lower().split(),
                                        r.lower().split(), True)
            if s.score() > slow_score:
                slow_best, slow_score = s, s.score()
        assert fast.to_line() == slow_best.to_line()


def test_lcs_against_naive():
    rng = random.Random(7)
    for _ in range(50):
        a = [rng.randrange(5) for _ in range(rng.randrange(0, 12))]
        b = [rng.randrange(5) for _ in range(rng.randrange(1, 12))]
        # naive DP
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                            else max(dp[i - 1][j], dp[i][j - 1]))
        assert lcs_length(a, b) == dp[len(a)][len(b)]


def test_perfect_match_scores():
    gts = [["1 2 3 4 5"]]
    res = [["1 2 3 4 5"]]
    bleu, _ = Bleu(4).compute_score(gts, res)
    assert all(abs(b - 1.0) < 1e-6 for b in bleu)
    rouge, _ = Rouge().compute_score(gts, res)
    assert abs(rouge - 1.0) < 1e-12


def test_get_eval_score_protocol():
    """Id lists are joined into id-string 'words' (reference metric.py:15-17)."""
    references = [[[4, 8, 15, 16]], [[23, 42, 7]]]
    hypotheses = [[4, 8, 15, 16], [23, 42, 8]]
    scores = get_eval_score(references, hypotheses)
    for key in ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                "METEOR", "ROUGE_L", "CIDEr"]:
        assert key in scores
    assert scores["Bleu_1"] > 0.5
    assert scores["ROUGE_L"] > 0.5


def test_accumulating_metric():
    m = AccumulatingMetric()
    assert m.avg() == 0
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert abs(m.avg() - (2.0 + 12.0) / 4) < 1e-12
