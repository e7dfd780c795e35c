"""Flash attention (tiled online-softmax) — the long-context rerank kernel.

Reference: NeuronDB/src/gpu/cuda/gpu_flash_attention.cu:34-51 — Flash
Attention 2 for cross-encoder reranking of 8K+ token pairs, O(N) memory via
tiled softmax(QK^T/sqrt(d))V. This is the TPU equivalent: one Pallas kernel
per (batch*head, q-tile), looping KV tiles with running max/denominator in
VMEM scratch so the [S, S] score matrix never materializes.

jnp reference (`attention_reference`) is the oracle; `flash_attention`
dispatches to the kernel on TPU and the oracle elsewhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 128
KV_TILE = 128
NEG_INF = -1e30


def _pick_tiles(s_round: int, dh: int):
    """Tile sizes for the (q, kv) grid, measured on TPU v5e (round 2):
    per-grid-cell work must be large enough to amortize Mosaic cell
    overhead and fill the MXU. 8K context, Dh=64: 128/128 tiles -> 7.3
    TFLOP/s, 512/2048 -> 24.9; Dh=128: 128/128 -> 16.4, 1024/1024 ->
    97.2 (2.83 ms — ~25% of v5e bf16 peak). The f32 [qt, kt] score
    intermediate is the VMEM limiter: qt*kt*4 <= 8 MB (2048x2048 fails
    to compile). Tiles clamp to the rounded sequence length so short
    sequences are not padded up to the large-tile sizes.

    Both tiles are powers-of-two multiples of 128, so one always
    divides the other and padding S to max(qt, kt) makes it divisible
    by BOTH. A raw min() clamp (e.g. kt = s_round = 640 with qt = 512)
    would leave q_tiles = Sp // qt flooring away the last partial q
    tile — the kernel would silently never write those output rows."""
    if dh >= 128:
        qt_target, kt_target = 1024, 1024
    else:
        qt_target, kt_target = 512, 2048

    def pow2_clamp(target: int) -> int:
        t = 128
        while t * 2 <= min(target, s_round):
            t *= 2
        return t

    return pow2_clamp(qt_target), pow2_clamp(kt_target)


def attention_reference(q, k, v, mask=None, scale: Optional[float] = None):
    """[B, H, S, Dh] full attention oracle."""
    d = q.shape[-1]
    s = scale if scale is not None else 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * s
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, kv_tiles: int, scale: float):
    """Online softmax runs in the exp2 domain: log2(e) is folded into
    the one multiply the kernel already pays (``scale``), so the
    per-element transcendental is the VPU's native exp2 with no extra
    ln2 fixup ops. The [qt, kt] elementwise stream (select + exp +
    running-max) is what bounds this kernel at Dh=128 — the MXU does
    2*2*Dh flops per score element vs ~6-10 VPU ops, and the v5e
    MXU:VPU throughput ratio (~50:1) makes those streams comparable —
    so every saved VPU op per element is visible end-to-end."""
    qi = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                        # [Q_TILE, Dh]
    kt = k_ref[0]                                       # [KV_TILE, Dh]
    vt = v_ref[0]
    # bf16 x bf16 -> f32 hits the MXU's native path (f32 x f32 matmuls
    # run as multi-pass emulation); inputs arrive pre-cast (see wrapper)
    s = jnp.dot(q, kt.T, preferred_element_type=jnp.float32) * scale
    if mask_ref is not None:
        msk = mask_ref[0]                               # [1, KV_TILE]
        s = jnp.where(msk > 0, s, NEG_INF)              # [Q_TILE, KV_TILE]

    m_prev = m_scr[:]                                   # [Q_TILE, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(vt.dtype), vt, preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(pl.program_id(2) == kv_tiles - 1)
    def _():
        o_ref[0] = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)


LOG2E = 1.4426950408889634


@functools.partial(jax.jit, static_argnames=("interpret", "bf16",
                                             "tiles"))
def flash_attention(q, k, v, mask=None, *, interpret: bool = False,
                    bf16: bool = True,
                    tiles: Optional[tuple] = None):
    """q,k,v [B, H, S, Dh]; mask [B, S] bool/int (True = attend). S padded
    to tile multiples by the caller or here. ``bf16=True`` (default)
    computes QK^T and PV as bf16 x bf16 -> f32 MXU matmuls (the round-2
    perf pass: f32 matmuls run as multi-pass MXU emulation); the
    online-softmax state stays f32 (exp2 domain — see _flash_kernel).

    When ``mask is None`` and S needs no padding, the kernel is
    specialized WITHOUT a mask operand: the [qt, kt] compare+select per
    KV tile is pure VPU cost on this kernel's critical elementwise
    stream (r5 utilization pass). ``tiles=(q_tile, kv_tile)`` overrides
    the measured defaults (sweep hook; both multiples of 128)."""
    B, H, S, Dh = q.shape
    # exp2-domain softmax: fold log2(e) into the scale multiply the
    # kernel already performs
    scale = LOG2E / (Dh ** 0.5)
    s_round = S + ((-S) % 128)
    if tiles is not None:
        q_tile, kv_tile = tiles
    else:
        q_tile, kv_tile = _pick_tiles(s_round, Dh)
    pad_s = (-S) % max(q_tile, kv_tile)
    no_mask = mask is None and pad_s == 0
    if mask is None:
        mask = jnp.ones((B, S), jnp.int32)
    mask = mask.astype(jnp.int32)
    if pad_s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_s)))
    Sp = S + pad_s
    bh = B * H
    dt = jnp.bfloat16 if bf16 else q.dtype
    qf = q.reshape(bh, Sp, Dh).astype(dt)
    kf = k.reshape(bh, Sp, Dh).astype(dt)
    vf = v.reshape(bh, Sp, Dh).astype(dt)
    q_tiles = Sp // q_tile
    kv_tiles = Sp // kv_tile

    in_specs = [
        pl.BlockSpec((1, q_tile, Dh), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_tile, Dh), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_tile, Dh), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if no_mask:
        def kern(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            return _flash_kernel(q_ref, k_ref, v_ref, None, o_ref,
                                 m_scr, l_scr, acc_scr,
                                 kv_tiles=kv_tiles, scale=scale)
    else:
        maskf = jnp.repeat(mask[:, None, :], H, axis=1).reshape(bh, 1, Sp)
        in_specs.append(
            pl.BlockSpec((1, 1, kv_tile), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM))
        operands.append(maskf)
        kern = functools.partial(_flash_kernel, kv_tiles=kv_tiles,
                                 scale=scale)

    out = pl.pallas_call(
        kern,
        grid=(bh, q_tiles, kv_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_tile, Dh), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, Sp, Dh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    out = out.reshape(B, H, Sp, Dh)
    return out[:, :, :S, :]
