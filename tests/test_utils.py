"""Infra utils: config merging, ledger, fvecs round-trip."""

import json

import numpy as np
import pytest

from million_tpu.utils.config import load_config, Config
from million_tpu.utils.fvecs import read_fvecs, write_fvecs
from million_tpu.utils.ledger import append_result, read_results


def test_config_layering(tmp_path):
    (tmp_path / "a.json").write_text(json.dumps({"x": {"a": 1, "b": 2}, "y": 1}))
    (tmp_path / "b.json").write_text(json.dumps({"x": {"b": 3}}))
    cfg = load_config([str(tmp_path / "a.json"), str(tmp_path / "b.json")],
                      overrides=["x.c=[1,2]", "y=hello"])
    assert cfg.x.a == 1 and cfg.x.b == 3
    assert cfg.x.c == [1, 2]
    assert cfg.y == "hello"
    with pytest.raises(AttributeError):
        _ = cfg.missing  # no auto-vivification (unlike the reference UniConfig)
    with pytest.raises(TypeError):
        cfg.y = 2  # immutable


def test_config_roundtrip():
    cfg = load_config(base={"a": {"b": [1, 2]}})
    d = cfg.to_dict()
    assert d == {"a": {"b": [1, 2]}}


def test_ledger(tmp_path):
    p = tmp_path / "res.jsonl"
    append_result(p, {"stage": "s1", "v": 1})
    append_result(p, {"stage": "s2", "v": 2})
    rows = read_results(p)
    assert [r["stage"] for r in rows] == ["s1", "s2"]
    assert all("ts" in r for r in rows)


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.standard_normal((37, 16)).astype(np.float32)
    p = tmp_path / "x.fvecs"
    write_fvecs(p, x[:20], append=False)
    write_fvecs(p, x[20:])  # append
    got = read_fvecs(p)
    np.testing.assert_array_equal(got, x)
    got2 = read_fvecs(p, max_n=5)
    np.testing.assert_array_equal(got2, x[:5])
