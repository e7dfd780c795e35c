"""Quantized vector formats and the quantization runtime.

Parity targets (reference):
- quantized type structs VectorF16/I8/Binary/U8/Ternary/I4 with
  2x/8x/32x/8x/16x/16x compression (NeuronDB/include/neurondb.h:44-89),
- to/from conversions + per-format error analysis `quantize_analyze_*`
  (src/types/quantization.c:91-2221),
- fp8 e4m3/e5m2 quantization (src/ml/ml_quantization_fp8.c,
  src/gpu/cuda/gpu_kernels.cu:318-370),
- GPU quantize kernels (gpu_kernels.cu:179-370) — here plain XLA ops that
  fuse on the VPU; a Pallas stochastic-rounding variant lives in
  ops/pallas/quantize.py.

Layout choices are TPU-first: codes are [N, D] (or [N, D/pack] for packed
formats) int/float arrays; scales are per-vector f32 [N] kept separate so
asymmetric distance kernels can rescale GEMM outputs in the epilogue.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# format -> (bits per component, compression ratio vs f32)
FORMATS: Dict[str, float] = {
    "f32": 1.0,
    "f16": 2.0,       # VectorF16 (neurondb.h:44)
    "bf16": 2.0,      # TPU-native half: bfloat16 (MXU-native)
    "int8": 4.0,      # VectorI8 — reference counts 8x vs its varlena; 4x raw
    "uint8": 4.0,
    "int4": 8.0,      # packed 2 per byte
    "ternary": 16.0,  # 2-bit {-1, 0, +1}, packed 4 per byte
    "binary": 32.0,   # 1-bit sign, packed 8 per byte
    "fp8_e4m3": 4.0,
    "fp8_e5m2": 4.0,
}


@jax.tree_util.register_pytree_node_class
@dataclass
class Quantized:
    """A quantized batch of vectors.

    codes: format-dependent array —
        f16/bf16/fp8: [N, D] in that dtype
        int8/uint8:   [N, D] int8/uint8
        int4:         [N, ceil(D/2)] uint8 (two nibbles per byte, low first)
        ternary:      [N, ceil(D/4)] uint8 (2 bits per component)
        binary:       [N, ceil(D/8)] uint8 (bit i of byte j = component 8j+i)
    scale: [N] f32 per-vector scale (1.0 where unused)
    offset: [N] f32 per-vector zero point (0.0 where unused)
    dim: original D (packed formats lose it)
    """

    codes: jax.Array
    scale: jax.Array
    offset: jax.Array
    fmt: str
    dim: int

    def tree_flatten(self):
        return (self.codes, self.scale, self.offset), (self.fmt, self.dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, scale, offset = children
        return cls(codes, scale, offset, aux[0], aux[1])

    @property
    def nbytes(self) -> int:
        return self.codes.size * self.codes.dtype.itemsize + self.scale.nbytes \
            + self.offset.nbytes

    def dequantize(self) -> jax.Array:
        return dequantize(self)


def _pack_bits(bits: jax.Array) -> jax.Array:
    """[N, D] {0,1} -> [N, ceil(D/8)] uint8, little-endian within byte."""
    n, d = bits.shape
    pad = (-d) % 8
    b = jnp.pad(bits.astype(jnp.uint8), ((0, 0), (0, pad)))
    b = b.reshape(n, -1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(b * weights[None, None, :], axis=-1).astype(jnp.uint8)


def _unpack_bits(packed: jax.Array, dim: int) -> jax.Array:
    n = packed.shape[0]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(n, -1)[:, :dim]


def _pack_crumbs(vals: jax.Array, dim: int) -> jax.Array:
    """[N, D] values in 0..3 -> [N, ceil(D/4)] uint8 (2 bits each)."""
    n = vals.shape[0]
    pad = (-dim) % 4
    v = jnp.pad(vals.astype(jnp.uint8), ((0, 0), (0, pad))).reshape(n, -1, 4)
    shifts = jnp.uint8(2) * jnp.arange(4, dtype=jnp.uint8)
    return jnp.sum(v << shifts[None, None, :], axis=-1).astype(jnp.uint8)


def _unpack_crumbs(packed: jax.Array, dim: int) -> jax.Array:
    shifts = jnp.uint8(2) * jnp.arange(4, dtype=jnp.uint8)
    v = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    return v.reshape(packed.shape[0], -1)[:, :dim]


def _pack_nibbles(vals: jax.Array, dim: int) -> jax.Array:
    """[N, D] values in 0..15 -> [N, ceil(D/2)] uint8 (low nibble first)."""
    n = vals.shape[0]
    pad = (-dim) % 2
    v = jnp.pad(vals.astype(jnp.uint8), ((0, 0), (0, pad))).reshape(n, -1, 2)
    return (v[:, :, 0] | (v[:, :, 1] << jnp.uint8(4))).astype(jnp.uint8)


def _unpack_nibbles(packed: jax.Array, dim: int) -> jax.Array:
    lo = packed & jnp.uint8(0xF)
    hi = (packed >> jnp.uint8(4)) & jnp.uint8(0xF)
    v = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    return v[:, :dim]


def quantize(x: jax.Array, fmt: str = "int8") -> Quantized:
    """Quantize [N, D] f32 vectors to ``fmt``.

    Scaling follows the reference's per-vector symmetric scheme
    (src/types/quantization.c: int8 scale = absmax/127; uint8 min-max
    affine; ternary absmax-threshold; int4 absmax/7; binary sign).
    """
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    n, d = x.shape
    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    if fmt == "f32":
        return Quantized(x, ones, zeros, fmt, d)
    if fmt in ("f16", "bf16"):
        dt = jnp.float16 if fmt == "f16" else jnp.bfloat16
        return Quantized(x.astype(dt), ones, zeros, fmt, d)
    if fmt in ("fp8_e4m3", "fp8_e5m2"):
        dt = jnp.float8_e4m3fn if fmt == "fp8_e4m3" else jnp.float8_e5m2
        fmax = float(jnp.finfo(dt).max)
        absmax = jnp.max(jnp.abs(x), axis=1)
        scale = jnp.where(absmax > 0, absmax / fmax, 1.0)
        return Quantized((x / scale[:, None]).astype(dt), scale, zeros, fmt, d)
    if fmt == "int8":
        absmax = jnp.max(jnp.abs(x), axis=1)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        codes = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
        return Quantized(codes, scale, zeros, fmt, d)
    if fmt == "uint8":
        lo = jnp.min(x, axis=1)
        hi = jnp.max(x, axis=1)
        scale = jnp.where(hi > lo, (hi - lo) / 255.0, 1.0)
        codes = jnp.clip(jnp.round((x - lo[:, None]) / scale[:, None]),
                         0, 255).astype(jnp.uint8)
        return Quantized(codes, scale, lo, fmt, d)
    if fmt == "int4":
        absmax = jnp.max(jnp.abs(x), axis=1)
        scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
        q = jnp.clip(jnp.round(x / scale[:, None]), -7, 7) + 8.0  # 1..15
        return Quantized(_pack_nibbles(q, d), scale, zeros, fmt, d)
    if fmt == "ternary":
        absmax = jnp.max(jnp.abs(x), axis=1)
        scale = jnp.where(absmax > 0, absmax, 1.0)
        thresh = 0.5 * scale[:, None]
        t = jnp.where(x > thresh, 2, jnp.where(x < -thresh, 0, 1))  # {0,1,2}
        return Quantized(_pack_crumbs(t, d), scale, zeros, fmt, d)
    if fmt == "binary":
        bits = (x > 0).astype(jnp.uint8)
        return Quantized(_pack_bits(bits), ones, zeros, fmt, d)
    raise ValueError(f"unknown quantization format {fmt!r}")


def dequantize(q: Quantized) -> jax.Array:
    fmt, d = q.fmt, q.dim
    if fmt == "f32":
        return q.codes
    if fmt in ("f16", "bf16", "fp8_e4m3", "fp8_e5m2"):
        x = q.codes.astype(jnp.float32)
        return x * q.scale[:, None] + q.offset[:, None] \
            if fmt.startswith("fp8") else x
    if fmt == "int8":
        return q.codes.astype(jnp.float32) * q.scale[:, None]
    if fmt == "uint8":
        return q.codes.astype(jnp.float32) * q.scale[:, None] + q.offset[:, None]
    if fmt == "int4":
        v = _unpack_nibbles(q.codes, d).astype(jnp.float32) - 8.0
        return v * q.scale[:, None]
    if fmt == "ternary":
        v = _unpack_crumbs(q.codes, d).astype(jnp.float32) - 1.0
        return v * q.scale[:, None]
    if fmt == "binary":
        bits = _unpack_bits(q.codes, d).astype(jnp.float32)
        return bits * 2.0 - 1.0
    raise ValueError(fmt)


def quantize_analyze(x: jax.Array, fmt: str) -> Dict[str, float]:
    """Per-format quantization error report, the analog of the reference's
    quantize_analyze_{int8,fp16,binary,...} (src/types/quantization.c)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    q = quantize(x, fmt)
    rec = dequantize(q)
    if fmt == "binary":
        # binary reconstruction is sign-only; report sign agreement instead
        agree = jnp.mean((rec > 0) == (x > 0))
        return {"format": fmt, "compression_ratio": FORMATS[fmt],
                "sign_agreement": float(agree),
                "mse": float(jnp.mean((rec - x) ** 2)),
                "max_error": float(jnp.max(jnp.abs(rec - x)))}
    err = rec - x
    denom = jnp.maximum(jnp.mean(x * x), 1e-30)
    return {
        "format": fmt,
        "compression_ratio": FORMATS[fmt],
        "mse": float(jnp.mean(err * err)),
        "max_error": float(jnp.max(jnp.abs(err))),
        "relative_rmse": float(jnp.sqrt(jnp.mean(err * err) / denom)),
    }


# Convenience SQL-name aliases (vector_to_int8 etc., src/types/quantization.c)
def vector_to_int8(x): return quantize(x, "int8")
def vector_to_fp16(x): return quantize(x, "f16")
def vector_to_binary(x): return quantize(x, "binary")
def vector_to_uint8(x): return quantize(x, "uint8")
def vector_to_ternary(x): return quantize(x, "ternary")
def vector_to_int4(x): return quantize(x, "int4")
def vector_to_fp8_e4m3(x): return quantize(x, "fp8_e4m3")
def vector_to_fp8_e5m2(x): return quantize(x, "fp8_e5m2")
