"""Our eval_data JSON matches the reference's committed schema."""

import json
import os

import numpy as np
import pytest

import icd_tpu.training.baseline as tb
from helpers import make_train_args, small_init_encoder

REFERENCE_EVAL = "/root/reference/eval_data/baseline_3.json"


@pytest.mark.skipif(not os.path.exists(REFERENCE_EVAL),
                    reason="reference eval_data not present")
def test_schema_matches_reference(use_coco_root, monkeypatch):
    monkeypatch.setattr(tb, "init_encoder", small_init_encoder)
    with open(REFERENCE_EVAL) as f:
        ref = json.load(f)

    args = make_train_args(model_name="schema_t", batch_size=4, epochs=1,
                           embed_size=16, decoder_dim=12, workers=0,
                           print_freq=100)
    params = tb.train(args)
    ours = tb.evaluate(args, params["encoder"], params["decoder"],
                       batch_size=4)

    assert set(ref.keys()) == set(ours.keys())
    for key, val in ref.items():
        if key == "losses":
            assert isinstance(ours[key], list)
            assert all(isinstance(v, float) for v in ours[key])
        else:
            assert isinstance(val, float)
            assert isinstance(ours[key], float), (key, type(ours[key]))
    # json-serializable end to end (what eval.py dumps).
    json.dumps(ours)
