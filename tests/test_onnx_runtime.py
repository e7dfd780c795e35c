"""ONNX wrapper logic (EP selection, session options, LRU) tested via an
injected onnxruntime-compatible stub — ort is not in this image, and the
wrapper must be gated-not-faked (VERDICT r1), so the stub exercises the
real control flow without pretending inference happened."""

import numpy as np
import pytest

from neurondb_tpu.service import onnx_runtime as R


class _StubSession:
    def __init__(self, path, opts, providers):
        self.path = path
        self.opts = opts
        self.providers = providers

    def run(self, output_names, inputs):
        x = next(iter(inputs.values()))
        return [np.asarray(x, np.float32) * 2.0]


class _StubOpts:
    intra_op_num_threads = 0
    inter_op_num_threads = 0


class _StubORT:
    SessionOptions = _StubOpts
    InferenceSession = _StubSession

    @staticmethod
    def get_available_providers():
        return ["CUDAExecutionProvider", "CPUExecutionProvider"]


@pytest.fixture()
def stub_ort():
    R.set_runtime(_StubORT())
    yield
    R.set_runtime(None)
    R._cache.evict("m.onnx")      # no stale stub sessions cross tests


def test_select_providers_priority():
    got = R.select_providers(
        available=["CPUExecutionProvider", "CUDAExecutionProvider"])
    assert got[0] == "CUDAExecutionProvider"
    assert got[-1] == "CPUExecutionProvider"
    # requested order respected, CPU fallback appended
    got = R.select_providers(["CoreMLExecutionProvider"],
                             available=["CPUExecutionProvider"])
    assert got == ["CPUExecutionProvider"]
    got = R.select_providers(
        ["TensorrtExecutionProvider", "CUDAExecutionProvider"],
        available=["TensorrtExecutionProvider", "CUDAExecutionProvider",
                   "CPUExecutionProvider"])
    assert got == ["TensorrtExecutionProvider", "CUDAExecutionProvider",
                   "CPUExecutionProvider"]


def test_session_lru_and_threads(stub_ort):
    cache = R.ONNXSessionCache(max_sessions=2, intra_op_threads=3)
    s1 = cache.get("a.onnx")
    assert cache.get("a.onnx") is s1          # hit
    assert s1.opts.intra_op_num_threads == 3
    assert s1.providers[0] == "CUDAExecutionProvider"
    cache.get("b.onnx")
    cache.get("c.onnx")                       # evicts a.onnx
    assert cache.stats()["sessions"] == 2
    assert cache.get("a.onnx") is not s1      # rebuilt after eviction
    assert cache.stats()["hits"] == 1


def test_onnx_predict_through_stub(stub_ort):
    R._cache.evict("m.onnx")
    out = R.onnx_predict("m.onnx", {"x": np.ones((2, 2), np.float32)})
    np.testing.assert_allclose(out[0], 2.0 * np.ones((2, 2)))


def test_without_runtime_raises():
    assert not R.HAVE_ORT
    cache = R.ONNXSessionCache()
    with pytest.raises(RuntimeError, match="onnxruntime"):
        cache.get("missing.onnx")
