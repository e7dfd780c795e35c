"""List-grouped fused IVF-PQ probe scan: ADC-LUT scoring on the MXU.

Extends the grouped IVF scan (ivf_scan_grouped.py) to PQ-compressed
posting lists. Per (list, query-tile) grid cell:

  XLA prep   same tuple grouping as the flat kernel (group_probes), but
             instead of scattering raw queries, every tuple's ADC lookup
             table is scattered into the padded tile buffer:
               L[slot, j*KS + k] = ||cb[j,k]||^2 - 2 (q - c_list)_j · cb[j,k]
             plus a per-slot constant ||q - c_list||^2, so
               d(q, row) = const[slot] + sum_j L[slot, j*KS + code[row, j]].
  kernel     DMAs the list's CODES (subspace-major [n_sub, SEG] uint8 —
             16 B/row instead of 256-512 B/row, a 16-32x traffic cut),
             builds the code one-hot [n_sub*KS, SUB] with a VPU iota
             compare, and evaluates all QT queries' table sums as ONE
             f32 dot_general [QT, n_sub*KS] x [n_sub*KS, SUB] — the
             TPU-idiomatic table lookup: XLA's scalar gather measured
             ~240M lookups/s while the MXU evaluates the same lookups
             as matmul lanes.
  XLA post   merge_partials across probe ranks (shared with the flat
             kernel).

Replaces pq_asymmetric_distance's per-vector table walk
(NeuronDB/src/ml/ml_product_quantization.c:1003) wholesale.

CALLER CONTRACT: codes_t [n_sub, Npad] uint8 with every list offset a
multiple of 128 (lane alignment for uint8 slices) and >= SEG columns of
tail padding; ksub == 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurondb_tpu.ops.pallas.ivf_scan_grouped import (  # noqa: F401
    INT_FILL,
    NEG_FILL,
    QT,
    group_probes,
    merge_partials,
    tiles_for,
)

SEG = 1024        # code columns per DMA segment
SUB = 256         # columns scored per inner one-hot dot (ns <= 16)
LIST_ALIGN = 128  # uint8 lane alignment for code-column slices


def _sub_for(ns: int) -> int:
    """Columns per inner one-hot dot: the [ns*KS, SUB] f32 one-hot is
    the VMEM limiter (4 MB at ns=16/SUB=256), so halve SUB at ns=32."""
    return SUB if ns <= 16 else SUB // 2


def _pq_scan_kernel(off_ref, cnt_ref, lut_ref, codes_hbm,
                    out_d_ref, out_i_ref, vmem_buf, sem, par_ref,
                    *, kp: int, sub: int = SUB, pos_bits: int = 0):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        par_ref[0] = 0

    off = off_ref[t]
    cnt = cnt_ref[t]
    n_segs = (cnt + SEG - 1) // SEG
    p0 = par_ref[0]
    ns, ncols = codes_hbm.shape

    def get_dma(slot, toff, s):
        start = pl.multiple_of(
            jnp.minimum(toff + s * SEG, ncols - SEG), LIST_ALIGN)
        return pltpu.make_async_copy(
            codes_hbm.at[:, pl.ds(start, SEG)],
            vmem_buf.at[slot],
            sem.at[slot],
        )

    @pl.when((t == 0) & (cnt > 0))
    def _():
        get_dma(0, off, 0).start()

    lut = lut_ref[:]                                  # [qt, ns*KS] f32
    qt = lut.shape[0]
    KS = lut.shape[1] // ns
    dn = (((1,), (0,)), ((), ()))
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (ns, KS, sub), 1)
    col_sub = jax.lax.broadcasted_iota(jnp.int32, (qt, sub), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (qt, kp + sub), 1)
    iota_kp = jax.lax.broadcasted_iota(jnp.int32, (qt, kp), 1)

    def seg_body(s, carry):
        slot = (p0 + s) % 2
        nxt = (p0 + s + 1) % 2

        @pl.when(s + 1 < n_segs)
        def _():
            get_dma(nxt, off, s + 1).start()

        @pl.when((s + 1 == n_segs) & (t + 1 < T))
        def _():
            @pl.when(cnt_ref[t + 1] > 0)
            def _():
                get_dma(nxt, off_ref[t + 1], 0).start()

        get_dma(slot, off, s).wait()

        def sub_body(u, carry):
            run_d, run_i = carry
            # ref-level dynamic slice (lax.dynamic_slice on a loaded
            # value has no Mosaic lowering); sub-aligned start
            c_sub = vmem_buf[slot, :, pl.ds(u * sub, sub)].astype(
                jnp.int32)
            # one-hot [ns, KS, sub] -> [ns*KS, sub]; f32 keeps the LUT
            # sums exact (the dot is tiny: QT x ns*KS x sub)
            oh = (c_sub[:, None, :] == iota_k).astype(jnp.float32)
            oh = oh.reshape(ns * KS, sub)
            d = jax.lax.dot_general(lut, oh, dn,
                                    preferred_element_type=jnp.float32)
            base = s * SEG + u * sub
            valid = (base + col_sub) < cnt

            if pos_bits:
                # packed-key selection (see ivf_scan_grouped.py): the
                # argmin+onehot rounds below are ~5 VPU passes per
                # extracted element; the packed path is min + equality
                # mask. ADC distances are already PQ-approximate and
                # the top candidates are re-ranked on originals, so the
                # <= 2**(pos_bits-24) relative key rounding is far
                # below the quantization error it rides on.
                bts = jax.lax.bitcast_convert_type(d, jnp.int32)
                key = bts ^ ((bts >> 31) & jnp.int32(0x7FFFFFFF))
                half = jnp.int32(1 << (pos_bits - 1))
                mask_hi = jnp.int32(-(1 << pos_bits))
                key = ((key + half) & mask_hi) | (base + col_sub)
                key = jnp.where(valid, key, INT_FILL)

                # aligned [qt, sub] buffer and tiny [qt, kp] running
                # keys extracted separately (no unaligned concat; see
                # ivf_scan_grouped.py)
                def pick(j, st):
                    ck, rk, nk = st
                    v = jnp.minimum(jnp.min(ck, axis=1, keepdims=True),
                                    jnp.min(rk, axis=1, keepdims=True))
                    nk = jnp.where(iota_kp == j, v, nk)
                    ck = jnp.where(ck == v, INT_FILL, ck)
                    rk = jnp.where(rk == v, INT_FILL, rk)
                    return ck, rk, nk

                _, _, new_k = jax.lax.fori_loop(
                    0, kp, pick, (key, run_d,
                                  jnp.full((qt, kp), INT_FILL,
                                           jnp.int32)))
                return new_k, run_i

            d = jnp.where(valid, d, NEG_FILL)
            ids = jnp.where(valid, off + base + col_sub, -1)

            cat_d = jnp.concatenate([run_d, d], axis=1)
            cat_i = jnp.concatenate([run_i, ids], axis=1)

            def pick(j, st):
                cd, ndv, niv = st
                val = jnp.min(cd, axis=1, keepdims=True)
                ppos = jnp.argmin(cd, axis=1)[:, None]
                onehot = iota_w == ppos
                sel_id = jnp.sum(jnp.where(onehot, cat_i, 0), axis=1,
                                 keepdims=True)
                write = iota_kp == j
                ndv = jnp.where(write, val, ndv)
                niv = jnp.where(write, sel_id, niv)
                cd = jnp.where(onehot, NEG_FILL, cd)
                return cd, ndv, niv

            _, new_d, new_i = jax.lax.fori_loop(
                0, kp, pick,
                (cat_d, jnp.full((qt, kp), NEG_FILL, jnp.float32),
                 jnp.full((qt, kp), -1, jnp.int32)))
            return new_d, new_i

        return jax.lax.fori_loop(0, SEG // sub, sub_body, carry)

    if pos_bits:
        init = (jnp.full((qt, kp), INT_FILL, jnp.int32),
                jnp.full((qt, kp), -1, jnp.int32))
        run_k, _ = jax.lax.fori_loop(0, n_segs, seg_body, init)
        invalid = run_k == INT_FILL
        posk = run_k & jnp.int32((1 << pos_bits) - 1)
        kb = run_k & jnp.int32(-(1 << pos_bits))
        db = kb ^ ((kb >> 31) & jnp.int32(0x7FFFFFFF))
        dist = jax.lax.bitcast_convert_type(db, jnp.float32)
        out_d_ref[0] = jnp.where(invalid, NEG_FILL, dist)
        out_i_ref[0] = jnp.where(invalid, -1, off + posk)
    else:
        init = (jnp.full((qt, kp), NEG_FILL, jnp.float32),
                jnp.full((qt, kp), -1, jnp.int32))
        run_d, run_i = jax.lax.fori_loop(0, n_segs, seg_body, init)
        out_d_ref[0] = run_d
        out_i_ref[0] = run_i

    @pl.when((cnt == 0) & (t + 1 < T))
    def _():
        @pl.when(cnt_ref[t + 1] > 0)
        def _():
            get_dma(p0, off_ref[t + 1], 0).start()

    par_ref[0] = (p0 + n_segs) % 2


@functools.partial(jax.jit, static_argnames=("kp", "qt", "interpret",
                                             "pos_bits"))
def grouped_pq_scan(lutpad, codes_t, tile_off, tile_cnt, *,
                    kp: int, qt: int = QT, interpret: bool = False,
                    pos_bits: int = 0):
    """lutpad [T*qt, n_sub*KS] f32 (per-slot constant pre-folded: every
    entry carries const/n_sub); codes_t [n_sub, Npad] uint8
    subspace-major; tile_off / tile_cnt [T]. Returns
    (dists [T, qt, kp], csr_rows [T, qt, kp])."""
    T = tile_off.shape[0]
    L = lutpad.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((qt, L), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # codes stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, qt, kp), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, kp), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, codes_t.shape[0], SEG), codes_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kern = functools.partial(_pq_scan_kernel, kp=kp,
                             sub=_sub_for(codes_t.shape[0]),
                             pos_bits=pos_bits)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, qt, kp), jnp.float32),
            jax.ShapeDtypeStruct((T, qt, kp), jnp.int32),
        ),
        interpret=interpret,
    )(tile_off, tile_cnt, lutpad, codes_t)


@functools.partial(jax.jit, static_argnames=("npad", "qt", "t_max",
                                             "metric"))
def build_luts(q, probes, centroids, codebooks, pos, R=None, *,
               npad: int, qt: int, t_max: int, metric: str):
    """Per-TUPLE ADC tables scattered into padded tile slots.

    L[slot, j*KS+k] = ||cb[j,k]||^2 - 2 (q - c)_j · cb[j,k]   (sq-L2)
                      -(q_j · cb[j,k])                         (ip)
    const[slot]     = ||q - c||^2                              (sq-L2)
                      -(q · c)                                 (ip)
    """
    B, D = q.shape
    ns, KS, ds = codebooks.shape
    G = B * npad
    tuple_q = jnp.arange(G, dtype=jnp.int32) // npad
    nlists = centroids.shape[0]
    lid = jnp.minimum(probes.reshape(G), nlists - 1)
    c = centroids[lid]                                 # [G, D]
    qg = q[tuple_q]                                    # [G, D]
    if metric == "ip":
        qc = qg
        const = -jnp.einsum("gd,gd->g", qg, c)
        sq_term = 0.0
        scale = -1.0
    else:
        qc = qg - c
        if R is not None:
            qc = qc @ R          # OPQ rotation (orthogonal: norm kept)
        const = jnp.sum(qc * qc, axis=1)
        sq_term = jnp.sum(codebooks * codebooks, -1)   # [ns, KS]
        scale = -2.0
    qs = qc.reshape(G, ns, ds)
    lut = scale * jnp.einsum("gjd,jkd->gjk", qs, codebooks,
                             preferred_element_type=jnp.float32)
    # fold the per-tuple constant in: every code row selects exactly one
    # entry per subspace, so adding const/ns to all entries adds const
    lut = (lut + sq_term + (const / ns)[:, None, None]).reshape(G, ns * KS)
    return jnp.zeros((t_max * qt, ns * KS), jnp.float32).at[pos].set(lut)


def ivfpq_grouped_search(q, probes, centroids, codebooks, codes_t,
                         offsets, counts, *, k: int,
                         metric: str = "sqeuclidean", qt: int = 0,
                         interpret: bool = False, R=None,
                         pos_bits: int = 0):
    """Full grouped IVF-PQ pipeline. probes [B, npad] list ids (sentinel
    = nlists in padding slots). Returns (dists [B, k], csr_rows [B, k])."""
    from neurondb_tpu.ops.pallas.ivf_scan_grouped import auto_qt
    B, npad = probes.shape
    nlists = counts.shape[0]
    qt = qt or auto_qt(B, npad, nlists)
    t_max = tiles_for(B, npad, nlists, qt)
    kp = max(8, min(k, SUB))
    tile_off, tile_cnt, pos = group_probes(
        probes, offsets, counts, qt=qt, t_max=t_max)
    lutpad = build_luts(
        q, probes, centroids, codebooks, pos, R, npad=npad, qt=qt,
        t_max=t_max, metric=metric)
    out_d, out_i = grouped_pq_scan(lutpad, codes_t, tile_off,
                                   tile_cnt, kp=kp, qt=qt,
                                   interpret=interpret,
                                   pos_bits=pos_bits)
    return merge_partials(out_d, out_i, pos.reshape(B, npad), k=k)
