"""Quantization round-trips and error analysis (src/types/quantization.c parity)."""

import numpy as np
import pytest

from neurondb_tpu.types import quantized as Q


@pytest.fixture(scope="module")
def x(rng_mod):
    rng = rng_mod
    return (rng.standard_normal((16, 64)) * 3).astype(np.float32)


@pytest.mark.parametrize("fmt,tol", [
    ("f16", 1e-2), ("bf16", 5e-2), ("int8", 5e-2), ("uint8", 5e-2),
    ("int4", 0.5), ("fp8_e4m3", 0.3), ("fp8_e5m2", 0.6),
])
def test_roundtrip_error(x, fmt, tol):
    q = Q.quantize(x, fmt)
    rec = np.asarray(Q.dequantize(q))
    assert rec.shape == x.shape
    scale = np.abs(x).max()
    assert np.abs(rec - x).max() / scale < tol


def test_binary_sign(x):
    q = Q.quantize(x, "binary")
    rec = np.asarray(Q.dequantize(q))
    np.testing.assert_array_equal(rec > 0, x > 0)
    # 32x compression of the payload
    assert q.codes.size == x.shape[0] * x.shape[1] // 8


def test_ternary(x):
    q = Q.quantize(x, "ternary")
    rec = np.asarray(Q.dequantize(q))
    assert set(np.unique(np.sign(rec))) <= {-1.0, 0.0, 1.0}
    # large values keep their sign
    big = np.abs(x) > 0.75 * np.abs(x).max(axis=1, keepdims=True)
    np.testing.assert_array_equal(np.sign(rec)[big], np.sign(x)[big])


def test_int4_packing(x):
    q = Q.quantize(x, "int4")
    assert q.codes.shape == (x.shape[0], x.shape[1] // 2)
    assert q.codes.dtype == np.uint8


def test_odd_dims(rng):
    x = rng.standard_normal((3, 13)).astype(np.float32)
    for fmt in ("binary", "ternary", "int4"):
        rec = np.asarray(Q.dequantize(Q.quantize(x, fmt)))
        assert rec.shape == x.shape


def test_analyze(x):
    rep = Q.quantize_analyze(x, "int8")
    assert rep["compression_ratio"] == 4.0
    assert rep["mse"] < 1e-3 * float(np.mean(x * x))
    rep_b = Q.quantize_analyze(x, "binary")
    assert rep_b["sign_agreement"] == 1.0


def test_zero_vectors():
    x = np.zeros((2, 8), np.float32)
    for fmt in Q.FORMATS:
        rec = np.asarray(Q.dequantize(Q.quantize(x, fmt)))
        assert np.isfinite(rec).all()
