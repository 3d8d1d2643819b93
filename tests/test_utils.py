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


class TestStreamingFvecs:
    def test_batched_reader_roundtrip(self, tmp_path, rng):
        from million_tpu.utils.fvecs import read_fvecs_batched, write_fvecs

        x = rng.standard_normal((1000, 8)).astype(np.float32)
        write_fvecs(tmp_path / "a.fvecs", x, append=False)
        got = np.concatenate(list(read_fvecs_batched(tmp_path / "a.fvecs", batch=128)))
        np.testing.assert_array_equal(got, x)

    def test_reservoir_sample_uniform(self, tmp_path, rng):
        from million_tpu.utils.fvecs import reservoir_sample_fvecs, write_fvecs

        n, d, k = 20000, 4, 500
        x = np.arange(n, dtype=np.float32)[:, None].repeat(d, 1)
        write_fvecs(tmp_path / "b.fvecs", x, append=False)
        s = reservoir_sample_fvecs(tmp_path / "b.fvecs", k, seed=1, batch=777)
        assert s.shape == (k, d)
        ids = s[:, 0]
        assert len(np.unique(ids)) == k  # sampling without replacement
        # uniformity: mean of sampled indices near n/2 (3-sigma bound for
        # a uniform sample: sigma = n/sqrt(12k))
        assert abs(ids.mean() - n / 2) < 3 * n / (12 * k) ** 0.5

    def test_reservoir_fewer_rows_than_k(self, tmp_path, rng):
        from million_tpu.utils.fvecs import reservoir_sample_fvecs, write_fvecs

        x = rng.standard_normal((37, 5)).astype(np.float32)
        write_fvecs(tmp_path / "c.fvecs", x, append=False)
        s = reservoir_sample_fvecs(tmp_path / "c.fvecs", 100, seed=0)
        np.testing.assert_array_equal(np.sort(s[:, 0]), np.sort(x[:, 0]))

    def test_partition_ranges(self):
        from million_tpu.utils.fvecs import partition_ranges

        rs = list(partition_ranges(10, 3))
        assert rs == [(0, 4), (4, 7), (7, 10)]
        assert list(partition_ranges(2, 4)) == [(0, 1), (1, 2), (2, 2), (2, 2)]
