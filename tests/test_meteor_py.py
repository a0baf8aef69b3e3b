"""Pure-Python METEOR 1.5 (icd_tpu/eval_func/meteor_py.py).

Covers: beam aligner vs exhaustive search (Meteor resolution order),
the scoring formula, id-string-protocol faithfulness (stem/function
machinery provably inert on digit words), corpus aggregation by summed
sufficient statistics, and the stdio/ICD_TPU_METEOR_PY wrappers.
Reference protocol: eval_func/meteor/meteor.py:33-58; eval input quirk:
metric.py:7-27 (token-id strings).
"""

import itertools
import os
import random
import sys

import pytest

from icd_tpu.eval_func.meteor_py import (
    ALPHA, BETA, GAMMA, MeteorPy, SegmentStats, align,
    best_reference_stats, segment_stats, _match_candidates)


def _chunks_and_dist(pairs):
    chunks = 0
    dist = 0
    last_i = last_j = -2
    for i, j, _w in sorted(pairs):
        if not (i == last_i + 1 and j == last_j + 1):
            chunks += 1
        dist += abs(i - j)
        last_i, last_j = i, j
    return chunks, dist


def _brute_force(hyp, ref, use_stem=False):
    """Exhaustive best alignment under (max matches, min chunks,
    min distance sum)."""
    cands = _match_candidates(hyp, ref, use_stem)
    best = (0, 0, 0)  # (-matches, chunks, dist)
    best_pairs = ()

    def rec(i, used, pairs):
        nonlocal best, best_pairs
        if i == len(hyp):
            chunks, dist = _chunks_and_dist(pairs)
            key = (-len(pairs), chunks, dist)
            if key < best:
                best, best_pairs = key, pairs
            return
        rec(i + 1, used, pairs)
        for j, w in cands[i]:
            if j not in used:
                rec(i + 1, used | {j}, pairs + ((i, j, w),))

    rec(0, frozenset(), ())
    return best_pairs, -best[0], best[1]


def test_aligner_matches_exhaustive_search():
    rng = random.Random(0)
    for trial in range(60):
        n = rng.randint(1, 6)
        m = rng.randint(1, 6)
        alpha_size = rng.choice([2, 3])
        hyp = [chr(97 + rng.randrange(alpha_size)) for _ in range(n)]
        ref = [chr(97 + rng.randrange(alpha_size)) for _ in range(m)]
        pairs, chunks = align(hyp, ref)
        _bf_pairs, bf_matches, bf_chunks = _brute_force(hyp, ref)
        assert len(pairs) == bf_matches, (hyp, ref)
        assert chunks == bf_chunks, (hyp, ref, pairs)


def test_aligner_prefers_contiguous_alignment():
    # 'b c' can match ref positions (1,2) contiguously or (1,4)
    # fragmented; Meteor's order requires the single-chunk choice.
    hyp = "b c".split()
    ref = "a b c d c".split()
    pairs, chunks = align(hyp, ref)
    assert chunks == 1
    assert [(i, j) for i, j, _ in pairs] == [(0, 1), (1, 2)]


def test_exact_match_count_is_clipped_multiset_intersection():
    hyp = "a a b c".split()
    ref = "a b b d".split()
    pairs, _ = align(hyp, ref)
    assert len(pairs) == 2  # min counts: a->1, b->1, c/d->0


def test_score_formula_hand_computed():
    # hyp = ref = 4 distinct words: P = R = 1, one chunk of 4 matches.
    s = segment_stats("a b c d".split(), "a b c d".split())
    expected = 1.0 * (1.0 - GAMMA * (1.0 / 4.0) ** BETA)
    assert s.score() == pytest.approx(expected)
    # Perfect-match score is deliberately < 1 under the 1.5 ranking
    # parameters (docstring note).
    assert 0.5 < s.score() < 1.0


def test_score_partial_overlap_hand_computed():
    # Content words only ('a'/'the' would trip the function-word
    # downweighting): matches cat,dog in one chunk.
    s = segment_stats("cat dog x".split(), "cat dog y z".split())
    p, r = 2.0 / 3.0, 2.0 / 4.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    pen = GAMMA * (1.0 / 2.0) ** BETA
    assert s.score() == pytest.approx(fmean * (1 - pen))


def test_disjoint_scores_zero():
    assert segment_stats("a b".split(), "c d".split()).score() == 0.0
    m = MeteorPy()
    score, per = m.compute_score([["c d"]], [["a b"]])
    assert score == 0.0 and per == [0.0]


def test_id_string_protocol_stem_and_delta_are_inert():
    # On digit 'words' (the reference eval quirk, metric.py:7-27) the
    # stem module and the function-word weighting can never change the
    # stats: exact-only == exact+stem, and every token is content.
    rng = random.Random(1)
    for _ in range(20):
        hyp = [str(rng.randrange(30)) for _ in range(rng.randint(1, 10))]
        ref = [str(rng.randrange(30)) for _ in range(rng.randint(1, 10))]
        s_exact = segment_stats(hyp, ref, use_stem=False)
        s_full = segment_stats(hyp, ref, use_stem=True)
        for f in SegmentStats.FIELDS:
            assert getattr(s_exact, f) == getattr(s_full, f)
        # delta cancels: P is plain matches/len on all-content tokens.
        if s_exact.wlen_hyp:
            assert (s_exact.wm_hyp / s_exact.wlen_hyp ==
                    pytest.approx(s_exact.matches_hyp / len(hyp)))


def test_stem_module_matches_inflections():
    s_exact = segment_stats(["running"], ["runs"], use_stem=False)
    s_stem = segment_stats(["running"], ["runs"], use_stem=True)
    assert s_exact.matches_hyp == 0
    assert s_stem.matches_hyp == 1
    assert s_stem.wm_hyp < s_stem.wlen_hyp  # weight 0.6 < exact 1.0


def test_function_words_downweighted_on_surface_text():
    # Matching only 'the' should contribute less than matching only
    # a content word of the same position profile.
    s_func = segment_stats("the x".split(), "the y".split())
    s_cont = segment_stats("cat x".split(), "cat y".split())
    assert s_func.score() < s_cont.score()


def test_corpus_score_aggregates_stats_not_means():
    m = MeteorPy(use_stem=False)
    gts = [["a b c d"], ["x y"]]
    res = [["a b c d"], ["p q"]]
    score, per = m.compute_score(gts, res)
    total = SegmentStats()
    for refs, hyp in zip(gts, res):
        total += best_reference_stats(hyp[0], refs, use_stem=False)
    assert score == pytest.approx(total.score())
    assert score != pytest.approx(sum(per) / len(per))


def test_multi_reference_keeps_best_scoring_stats():
    refs = ["p q r s", "a b c d"]
    s = best_reference_stats("a b c d", refs)
    assert s.matches_hyp == 4.0


def test_stats_line_round_trip():
    s = segment_stats("a b x".split(), "a b y z".split())
    s2 = SegmentStats.from_line(s.to_line())
    for f in SegmentStats.FIELDS:
        assert getattr(s, f) == getattr(s2, f)
    assert s2.score() == pytest.approx(s.score())


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stdio_server_equals_in_process(monkeypatch):
    from icd_tpu.eval_func.meteor import Meteor

    monkeypatch.setenv("METEOR_CMD", "{} {}".format(
        sys.executable,
        os.path.join(_repo_root(), "tools", "meteor_stdio.py")))
    gts = [["a b c d", "a b e"], ["running fast", "he runs"],
           ["7 8 9 9"]]
    res = [["a b c"], ["running quickly"], ["7 9 9"]]
    wrapper = Meteor()
    try:
        got_score, got_per = wrapper.compute_score(gts, res)
    finally:
        del wrapper  # terminate the subprocess
    want_score, want_per = MeteorPy().compute_score(gts, res)
    assert got_score == pytest.approx(want_score)
    assert got_per == pytest.approx(want_per)


def test_meteor_py_env_fallback(monkeypatch):
    from icd_tpu.eval_func.meteor import Meteor

    monkeypatch.delenv("METEOR_CMD", raising=False)
    monkeypatch.delenv("ICD_TPU_ALLOW_NO_METEOR", raising=False)
    monkeypatch.setenv("ICD_TPU_METEOR_PY", "1")
    monkeypatch.setenv("METEOR_JAR", "/nonexistent/meteor-1.5.jar")
    wrapper = Meteor()
    score, per = wrapper.compute_score([["1 2 3"]], [["1 2 3"]])
    assert score > 0.0 and per[0] == pytest.approx(score)


def test_long_caption_alignment_is_fast_and_sane():
    # Eval-shaped input: 52-token id strings (SURVEY decode window).
    rng = random.Random(2)
    hyp = [str(rng.randrange(50)) for _ in range(52)]
    ref = hyp[:30] + [str(rng.randrange(50)) for _ in range(22)]
    pairs, chunks = align(hyp, ref)
    assert len(pairs) >= 30
    assert 1 <= chunks <= len(pairs)
