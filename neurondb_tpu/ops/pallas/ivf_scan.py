"""Fused IVF probe scan: per-(query-block, probe) contiguous DMA +
distance + in-kernel top-k.

Why this kernel exists: the XLA formulation of the probe scan gathers
posting-list rows with a row-gather ([B, SEG, D] dynamic gather), which
lowers to scalar-indexed loads on TPU and runs far below HBM bandwidth.
IVF posting lists are CONTIGUOUS in the cluster-sorted layout
(index/ivf.py CSR), so the natural TPU access is a strided DMA.

Kernel shape: grid (B/QB, nprobe). Each cell serves QB queries at one
probe rank — it launches QB list-slice DMAs at once (latency amortized),
scores [QB, SEG] with dot_generals on the MXU, and maintains a running
top-K per row with K rounds of row-wise argmin + one-hot select (Mosaic
has no dynamic indexing). Output is per-cell partial top-K; the
cross-probe merge is one small XLA top_k.

Replaces the reference's GPU list scan (NeuronDB/src/gpu/common/gpu_sql.c
ivf_knn_search_gpu + gpu_kernels.cu distance kernels) in one fused pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 512          # rows per DMA segment
QB = 16            # queries per grid cell (amortizes DMA latency)
NEG_FILL = float(jnp.finfo(jnp.float32).max)


def _probe_scan_kernel(off_ref, cnt_ref, q_ref, vecs_hbm,
                       out_d_ref, out_i_ref, vmem_buf, sem,
                       *, max_segs: int, kp: int, metric: str):
    g = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)

    q = q_ref[:]                                       # [QB, D]
    D = q.shape[1]
    # per-row offsets/counts from the prefetched scalar arrays
    offs = [off_ref[(g * QB + t) * np_ + p] for t in range(QB)]
    cnts = [cnt_ref[(g * QB + t) * np_ + p] for t in range(QB)]
    off_col = jnp.concatenate(
        [jnp.full((1, 1), o, jnp.int32) for o in offs], axis=0)   # [QB, 1]
    cnt_col = jnp.concatenate(
        [jnp.full((1, 1), c, jnp.int32) for c in cnts], axis=0)
    max_cnt = jnp.max(cnt_col)
    n_segs = jnp.minimum((max_cnt + SEG - 1) // SEG, max_segs)

    n_rows_total = vecs_hbm.shape[0]

    def get_dma(slot, t, s):
        # n_segs is the max over the query block, so a short list can be
        # asked for segments past its extent; clamp the start so the DMA
        # never leaves the buffer (a segment whose start gets clamped has
        # no valid rows — the cnt mask discards everything it loads).
        # List offsets are 32-row aligned (ivf.py LIST_ALIGN) so the slice
        # start provably satisfies Mosaic's sublane tiling.
        start = pl.multiple_of(
            jnp.minimum(offs[t] + s * SEG, n_rows_total - SEG), 32)
        return pltpu.make_async_copy(
            vecs_hbm.at[pl.ds(start, SEG), :],
            vmem_buf.at[slot, t],
            sem.at[slot, t],
        )

    @pl.when(n_segs > 0)
    def _():
        for t in range(QB):
            get_dma(0, t, 0).start()

    ones_d = jnp.ones((1, D), jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    qsq_col = jnp.sum(q * q, axis=1, keepdims=True)    # [QB, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (QB, SEG), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (QB, kp + SEG), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (QB, kp), 1)

    def seg_body(s, carry):
        run_d, run_i = carry                           # [QB, kp] each

        @pl.when(s + 1 < n_segs)
        def _():
            for t in range(QB):
                get_dma((s + 1) % 2, t, s + 1).start()

        rows_d = []
        rows_sq = []
        for t in range(QB):
            get_dma(s % 2, t, s).wait()
            # posting lists may be stored bf16 (half the DMA traffic);
            # compute in f32 for accurate distances
            x = vmem_buf[s % 2, t].astype(jnp.float32)   # [SEG, D]
            rows_d.append(jax.lax.dot_general(
                q[t:t + 1], x, dn, preferred_element_type=jnp.float32))
            if metric != "ip":
                rows_sq.append(jax.lax.dot_general(
                    ones_d, x * x, dn, preferred_element_type=jnp.float32))
        dots = jnp.concatenate(rows_d, axis=0)         # [QB, SEG]
        if metric == "ip":
            d = -dots
        else:
            xsq = jnp.concatenate(rows_sq, axis=0)
            d = jnp.maximum(qsq_col + xsq - 2.0 * dots, 0.0)
        valid = (s * SEG + col) < cnt_col
        d = jnp.where(valid, d, NEG_FILL)
        ids = jnp.where(valid, off_col + s * SEG + col, -1)

        cat_d = jnp.concatenate([run_d, d], axis=1)    # [QB, kp+SEG]
        cat_i = jnp.concatenate([run_i, ids], axis=1)

        def pick(j, st):
            cd, nd, ni = st
            val = jnp.min(cd, axis=1, keepdims=True)           # [QB, 1]
            pos = jnp.argmin(cd, axis=1)[:, None]              # [QB, 1]
            onehot = iota_w == pos
            sel_id = jnp.sum(jnp.where(onehot, cat_i, 0), axis=1,
                             keepdims=True)
            write = iota_k == j
            nd = jnp.where(write, val, nd)
            ni = jnp.where(write, sel_id, ni)
            cd = jnp.where(onehot, NEG_FILL, cd)
            return cd, nd, ni

        _, new_d, new_i = jax.lax.fori_loop(
            0, kp, pick,
            (cat_d, jnp.full((QB, kp), NEG_FILL, jnp.float32),
             jnp.full((QB, kp), -1, jnp.int32)))
        return new_d, new_i

    init = (jnp.full((QB, kp), NEG_FILL, jnp.float32),
            jnp.full((QB, kp), -1, jnp.int32))
    run_d, run_i = jax.lax.fori_loop(0, n_segs, seg_body, init)
    out_d_ref[0] = run_d
    out_i_ref[0] = run_i


@functools.partial(jax.jit,
                   static_argnames=("k", "max_segs", "metric", "interpret"))
def ivf_probe_scan(q, qsq, vecs, probes_off, probes_cnt, *,
                   k: int, max_segs: int, metric: str = "sqeuclidean",
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """q [B, D]; vecs [Npad, D] cluster-contiguous; probes_off/cnt
    [B, nprobe] row offsets/lengths. Returns (dists [B, k], row_ids [B, k])
    ascending; pads id -1. ``qsq`` is accepted for API parity and ignored
    (computed in-kernel).

    CALLER CONTRACT: (1) vecs padded so every segment DMA stays in bounds
    — pad the block by at least SEG extra rows past the last list; (2)
    every list offset is a multiple of 32 rows (Mosaic sublane tiling for
    any supported dtype). index/ivf.py's aligned CSR layout provides both.
    """
    B, D = q.shape
    nprobe = probes_off.shape[1]
    kp = max(8, min(k, SEG))

    # pad the batch to a QB multiple (empty probes for pad rows)
    pad_b = (-B) % QB
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
        probes_off = jnp.pad(probes_off, ((0, pad_b), (0, 0)))
        probes_cnt = jnp.pad(probes_cnt, ((0, pad_b), (0, 0)))
    Bp = B + pad_b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // QB, nprobe),
        in_specs=[
            pl.BlockSpec((QB, D), lambda g, p, *_: (g, 0),
                         memory_space=pltpu.VMEM),     # q block
            pl.BlockSpec(memory_space=pl.ANY),      # vecs stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, QB, kp), lambda g, p, *_: (p, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QB, kp), lambda g, p, *_: (p, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, QB, SEG, D), vecs.dtype),
            pltpu.SemaphoreType.DMA((2, QB)),
        ],
    )
    kern = functools.partial(_probe_scan_kernel, max_segs=max_segs, kp=kp,
                             metric=metric)
    out_d, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nprobe, Bp, kp), jnp.float32),
            jax.ShapeDtypeStruct((nprobe, Bp, kp), jnp.int32),
        ),
        interpret=interpret,
    )(probes_off.reshape(-1), probes_cnt.reshape(-1), q, vecs)

    # cross-probe merge (small): [B, nprobe*kp] -> top-k
    cd = out_d.transpose(1, 0, 2).reshape(Bp, nprobe * kp)[:B]
    ci = out_i.transpose(1, 0, 2).reshape(Bp, nprobe * kp)[:B]
    negv, pos = jax.lax.top_k(-cd, k)
    ids = jnp.take_along_axis(ci, pos, axis=1)
    vals = -negv
    # exhausted selection rounds re-surface stale ids at NEG_FILL distance
    ids = jnp.where(vals < NEG_FILL * 0.5, ids, -1)
    return vals, ids


def prewarm(n_rows: int, d: int, *, nlists: int = 1024, k: int = 10,
            batch: int = 1024, nprobe_pad: int = 16,
            max_segs_buckets=(8, 16), metric: str = "sqeuclidean") -> None:
    """Compile the probe-scan kernel shapes for a corpus of ``n_rows``
    BEFORE any other device work. The Mosaic remote compile on this
    backend is only reliable early in a clean process; compiled programs
    persist in the on-disk cache, so one successful prewarm per shape is
    enough forever. All operand shapes derive from (n_rows, d, batch):
    the index padding rule must match index/ivf.py (_build_lists).
    """
    import jax.numpy as jnp
    from neurondb_tpu.config import get_config
    seg = SEG
    npad = max(1, -(-n_rows // seg) * seg) + seg
    store_dt = (jnp.bfloat16
                if get_config().store_dtype in ("auto", "bfloat16")
                else jnp.float32)
    q = jnp.zeros((batch, d), jnp.float32)
    vecs = jnp.zeros((npad, d), store_dt)
    poff = jnp.zeros((batch, nprobe_pad), jnp.int32)
    pcnt = jnp.zeros((batch, nprobe_pad), jnp.int32)
    for ms in max_segs_buckets:
        out = ivf_probe_scan(q, None, vecs, poff, pcnt, k=k,
                             max_segs=ms, metric=metric)
        out[0].block_until_ready()


def ivf_probe_scan_reference(q, qsq, vecs, probes_off, probes_cnt, *,
                             k: int, metric: str = "sqeuclidean"):
    """Pure-numpy oracle with identical semantics (tests)."""
    import numpy as np
    B = q.shape[0]
    out_d = np.full((B, k), NEG_FILL, np.float32)
    out_i = np.full((B, k), -1, np.int32)
    qn = np.asarray(q)
    vn = np.asarray(vecs)
    for b in range(B):
        ds, ids = [], []
        for p in range(probes_off.shape[1]):
            o, c = int(probes_off[b, p]), int(probes_cnt[b, p])
            block = vn[o:o + c]
            if metric == "ip":
                d = -(block @ qn[b])
            else:
                d = ((block - qn[b]) ** 2).sum(1)
            ds.append(d)
            ids.append(np.arange(o, o + c))
        if ds:
            d = np.concatenate(ds)
            i = np.concatenate(ids)
            ordr = np.argsort(d, kind="stable")[:k]
            out_d[b, :len(ordr)] = d[ordr]
            out_i[b, :len(ordr)] = i[ordr]
    return out_d, out_i
