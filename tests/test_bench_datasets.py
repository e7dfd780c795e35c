"""bench.py real-dataset auto-detect: a mounted SIFT1M-layout directory
(*_base.fvecs / *_query.fvecs / *_groundtruth.ivecs) must be found via
NDB_BENCH_FVECS_DIR and loaded through native.read_vecs, replacing the
synthetic corpus (VERDICT r2 item 7)."""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_fvecs(path, arr):
    with open(path, "wb") as f:
        for row in arr:
            f.write(struct.pack("<i", len(row)))
            f.write(np.asarray(row, np.float32).tobytes())


def _write_ivecs(path, arr):
    with open(path, "wb") as f:
        for row in arr:
            f.write(struct.pack("<i", len(row)))
            f.write(np.asarray(row, np.int32).tobytes())


def test_find_and_load_real_dataset(tmp_path, rng, monkeypatch):
    import bench
    base = rng.standard_normal((50, 8)).astype(np.float32)
    q = rng.standard_normal((6, 8)).astype(np.float32)
    gt = rng.integers(0, 50, (6, 10)).astype(np.int32)
    _write_fvecs(tmp_path / "tiny_base.fvecs", base)
    _write_fvecs(tmp_path / "tiny_query.fvecs", q)
    _write_ivecs(tmp_path / "tiny_groundtruth.ivecs", gt)
    monkeypatch.setenv("NDB_BENCH_FVECS_DIR", str(tmp_path))
    found = bench.find_real_dataset()
    assert found is not None
    assert found[0].endswith("tiny_base.fvecs")
    x, qq = bench._bench_inputs(50, 8, 6)
    np.testing.assert_allclose(x, base, rtol=1e-6)
    np.testing.assert_allclose(qq, q, rtol=1e-6)
    from neurondb_tpu import native
    np.testing.assert_array_equal(native.read_ground_truth(found[2]), gt)


def test_no_dataset_falls_back_synthetic(tmp_path, monkeypatch):
    import bench
    monkeypatch.setenv("NDB_BENCH_FVECS_DIR", str(tmp_path))  # empty dir
    # must not crash; fall back to the synthetic corpus generators
    x, q = bench._bench_inputs(1000, 16, 8)
    assert x.shape == (1000, 16) and q.shape == (8, 16)
    u = bench.make_corpus(1000, 16, corpus="uniform")
    c = bench.make_corpus(1000, 16, corpus="clustered")
    # uniform is isotropic; clustered has strong cluster structure
    assert abs(float(u.mean())) < 0.1
    assert float(np.linalg.norm(c.mean(0))) > float(
        np.linalg.norm(u.mean(0)))
