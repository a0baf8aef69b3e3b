"""Native JSON validator tests (gason-equivalent capability)."""

import json

import numpy as np
import pytest

from icd_tpu.native import jsonlib


def test_valid_document():
    doc = {"images": [{"id": 1, "file_name": "a.jpg"}],
           "annotations": [{"id": 2, "caption": "a man \"quoted\" here",
                            "score": -1.5e3}],
           "flags": [True, False, None]}
    ok, stats = jsonlib.validate(json.dumps(doc))
    assert ok
    assert stats["objects"] == 3
    assert stats["arrays"] == 3
    assert stats["literals"] == 3
    assert abs(stats["numeric_sum"] - (1 + 2 - 1500.0)) < 1e-9


@pytest.mark.parametrize("bad", [
    "{", "[1,]", '{"a":}', '{"a" 1}', "tru", '"unterminated',
    '{"a":1} extra', '{"\\x":1}',
])
def test_invalid_documents(bad):
    ok, _ = jsonlib.validate(bad)
    assert not ok


def test_random_roundtrip_against_python_json():
    rng = np.random.default_rng(0)

    def rand_value(depth=0):
        kind = rng.integers(0, 6 if depth < 3 else 4)
        if kind == 0:
            return float(np.round(rng.normal() * 100, 3))
        if kind == 1:
            return int(rng.integers(-1000, 1000))
        if kind == 2:
            return "".join(chr(int(c)) for c in
                           rng.integers(32, 127, rng.integers(0, 10))
                           ).replace("\\", "").replace('"', "")
        if kind == 3:
            return bool(rng.integers(0, 2))
        if kind == 4:
            return [rand_value(depth + 1)
                    for _ in range(rng.integers(0, 5))]
        return {f"k{i}": rand_value(depth + 1)
                for i in range(rng.integers(0, 5))}

    for _ in range(25):
        doc = rand_value()
        text = json.dumps(doc)
        ok, _ = jsonlib.validate(text)
        assert ok, text
