"""METEOR wrapper protocol test against a stdio stub (no jar needed)."""

import os
import sys

import pytest


def test_meteor_stdio_protocol(monkeypatch):
    stub = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "meteor_stub.py")
    monkeypatch.setenv("METEOR_CMD",
                       "{} {}".format(sys.executable, stub))
    from icd_tpu.eval_func.meteor import Meteor

    scorer = Meteor()
    assert scorer.meteor_p is not None
    gts = [["a b c", "a b"], ["x y"]]
    res = [["a b c d"], ["x"]]
    score, scores = scorer.compute_score(gts, res)
    # Stub: stats = hyp word count; per-segment = stats/100;
    # final = sum(stats)/100.
    assert scores == [0.04, 0.01]
    assert abs(score - 0.05) < 1e-12

    # The wrapper is reusable across calls (long-lived subprocess).
    score2, scores2 = scorer.compute_score([["q"]], [["q r s"]])
    assert scores2 == [0.03]
    assert abs(score2 - 0.03) < 1e-12


def test_meteor_strips_protocol_delimiters(monkeypatch):
    stub = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "meteor_stub.py")
    monkeypatch.setenv("METEOR_CMD",
                       "{} {}".format(sys.executable, stub))
    from icd_tpu.eval_func.meteor import Meteor

    scorer = Meteor()
    # '|||' inside a hypothesis must be sanitized (meteor.py:52).
    score, scores = scorer.compute_score(
        [["a b"]], [["a ||| b"]])
    assert scores == [0.02]  # 'a b' after stripping


def test_meteor_raises_without_jar_by_default(monkeypatch):
    """A jar-less environment must fail loudly unless explicitly allowed
    (the reference crashes too, eval_func/meteor/meteor.py:18-24) — a
    real eval must never silently write METEOR: 0.0."""
    monkeypatch.delenv("ICD_TPU_ALLOW_NO_METEOR", raising=False)
    monkeypatch.delenv("ICD_TPU_METEOR_PY", raising=False)
    monkeypatch.delenv("METEOR_CMD", raising=False)
    monkeypatch.setenv("METEOR_JAR", "/nonexistent/meteor-1.5.jar")
    from icd_tpu.eval_func.meteor import Meteor

    with pytest.raises(RuntimeError, match="ICD_TPU_ALLOW_NO_METEOR"):
        Meteor()


def test_meteor_degrades_to_zero_when_allowed(monkeypatch):
    monkeypatch.setenv("ICD_TPU_ALLOW_NO_METEOR", "1")
    monkeypatch.delenv("ICD_TPU_METEOR_PY", raising=False)
    monkeypatch.delenv("METEOR_CMD", raising=False)
    monkeypatch.setenv("METEOR_JAR", "/nonexistent/meteor-1.5.jar")
    from icd_tpu.eval_func.meteor import Meteor

    with pytest.warns(UserWarning, match="METEOR"):
        scorer = Meteor()
    score, scores = scorer.compute_score([["a b"]], [["a"]])
    assert score == 0.0 and scores == [0.0]
