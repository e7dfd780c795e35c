"""List-grouped fused IVF probe scan: one posting-list DMA serves a tile
of queries.

Round 1's kernel (ivf_scan.py) gave each query its own DMA chain for its
probed list — at B=4096, nprobe=4, nlists=1024 every list is probed ~16
times per batch, so ~94% of HBM traffic was duplicate reads and the scan
ran ~20x below the bandwidth roofline (IMPLEMENTATION_NOTES.md round-1
measurement: ~25 GB/s effective).

This kernel inverts the (query, probe-rank) tuples into per-list groups:

  XLA prep   sort tuples by probed list id; pack each list's queries
             into QT-row tiles (a tile never spans two lists); scatter
             the gathered queries into a padded [T, QT, D] buffer and
             record per-tile (list offset, list count) scalars.
  kernel     grid (T,). Each cell DMAs its list ONCE (SEG-row segments,
             double-buffered, cross-tile prefetch of the next live
             tile's first segment), scores [QT, SEG] per segment with a
             bf16 x bf16 -> f32 MXU dot_general, and keeps a running
             per-row top-kp via kp rounds of argmin+select.
  XLA post   gather each tuple's partial top-kp back via its padded slot
             and merge across probe ranks with one top_k.

Traffic per batch = sum over probed lists of ceil(m_l/QT) segment scans
instead of sum over tuples — a ~QT-fold cut when m_l >= QT.

Replaces the reference's GPU list scan (NeuronDB/src/gpu/common/
gpu_sql.c:929 ivf_knn_search_gpu + gpu_kernels.cu distance kernels).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 1024        # rows per DMA segment (256 KB bf16 at D=128)
QT = 16           # queries per tile (shared-list DMA amortization)
NEG_FILL = float(jnp.finfo(jnp.float32).max)
INT_FILL = 0x7FFFFFFF  # packed-key sentinel (int32 max)


def tiles_for(b: int, npad: int, nlists: int, qt: int = QT) -> int:
    """Static worst-case tile count: every tuple tiled at qt per tile,
    plus one ragged tile per list, plus the sentinel group."""
    return (b * npad) // qt + nlists + 2


def auto_qt(b: int, npad: int, nlists: int) -> int:
    """Queries-per-tile by expected tile density (b*npad/nlists queries
    share each probed list). Bigger tiles cut both the DMA traffic and
    the sequential grid-cell count ~qt-fold, but a sparsely probed list
    still pays a full-list scan per (mostly padded) tile — so scale qt
    with density. Power-of-two buckets keep the compile cache small."""
    density = (b * npad) / max(nlists, 1)
    for qt in (64, 32):
        if density >= qt:
            return qt
    return QT


@functools.partial(jax.jit, static_argnames=("qt", "t_max"))
def group_probes(probes, offsets, counts, *, qt: int, t_max: int):
    """probes [B, npad] int32 list ids (sentinel = nlists for padding).

    Returns (tile_off [T], tile_cnt [T], pos [B*npad] padded slot per
    tuple in original tuple order, sq [B*npad] query index per SORTED
    tuple). All device-side: sort + cummax + scatter.
    """
    B, npad = probes.shape
    G = B * npad
    flat = probes.reshape(G)
    order = jnp.argsort(flat, stable=True)          # sorted tuple order
    sl = flat[order]                                # list id per sorted tuple
    sq = order // npad                              # query per sorted tuple
    idx = jnp.arange(G, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), sl[1:] != sl[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start
    slot = rank % qt
    new_tile = is_start | (slot == 0)
    tile_id = jnp.cumsum(new_tile.astype(jnp.int32)) - 1     # [G]
    pos_sorted = tile_id * qt + slot                         # [G]
    # back to original tuple order: pos[tuple] = its padded slot
    pos = jnp.zeros(G, jnp.int32).at[order].set(pos_sorted)
    nlists = counts.shape[0]
    off_ext = jnp.concatenate([offsets, jnp.zeros(1, offsets.dtype)])
    cnt_ext = jnp.concatenate([counts, jnp.zeros(1, counts.dtype)])
    tile_list = jnp.full(t_max, nlists, jnp.int32).at[tile_id].set(
        sl, mode="drop")
    tile_off = off_ext[tile_list]
    tile_cnt = jnp.where(tile_list < nlists, cnt_ext[tile_list], 0)
    return tile_off, tile_cnt, pos


def _grouped_scan_kernel(off_ref, cnt_ref, q_ref, vecs_hbm,
                         out_d_ref, out_i_ref, vmem_buf, sem, par_ref,
                         *, kp: int, metric: str, pos_bits: int = 0,
                         block_min: bool = False):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    qt = q_ref.shape[0]                              # queries per tile

    @pl.when(t == 0)
    def _():
        par_ref[0] = 0

    off = off_ref[t]
    cnt = cnt_ref[t]
    n_segs = (cnt + SEG - 1) // SEG
    p0 = par_ref[0]
    n_rows_total = vecs_hbm.shape[0]

    def get_dma(slot, toff, s):
        # clamp so a segment past a short list's extent never leaves the
        # buffer (cnt masking discards whatever it loads); list offsets
        # are 32-row aligned (ivf.py LIST_ALIGN)
        start = pl.multiple_of(
            jnp.minimum(toff + s * SEG, n_rows_total - SEG), 32)
        return pltpu.make_async_copy(
            vecs_hbm.at[pl.ds(start, SEG), :],
            vmem_buf.at[slot],
            sem.at[slot],
        )

    # own first segment: cell 0 starts it; later cells had it prefetched
    # by the previous live-or-dead cell (see the baton logic below)
    @pl.when((t == 0) & (cnt > 0))
    def _():
        get_dma(0, off, 0).start()

    q = q_ref[:]                                     # [qt, D] f32
    D = q.shape[1]
    qb = q.astype(vecs_hbm.dtype)                    # bf16 for MXU dots
    qsq_col = jnp.sum(q * q, axis=1, keepdims=True)  # [qt, 1] f32
    ones_d = jnp.ones((1, D), jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, SEG), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (qt, kp + SEG), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (qt, kp), 1)

    def seg_body(s, carry):
        run_d, run_i = carry
        slot = (p0 + s) % 2
        nxt = (p0 + s + 1) % 2

        @pl.when(s + 1 < n_segs)
        def _():
            get_dma(nxt, off, s + 1).start()

        @pl.when((s + 1 == n_segs) & (t + 1 < T))
        def _():
            # cross-tile prefetch: next live tile's first segment
            @pl.when(cnt_ref[t + 1] > 0)
            def _():
                get_dma(nxt, off_ref[t + 1], 0).start()

        get_dma(slot, off, s).wait()
        x = vmem_buf[slot]                           # [SEG, D] store dtype
        # bf16 x bf16 MXU dot, f32 accumulate: products of bf16 inputs
        # are exact in f32, so this matches round 1's cast-to-f32 dots
        dots = jax.lax.dot_general(qb, x, dn,
                                   preferred_element_type=jnp.float32)
        if metric == "ip":
            d = -dots
        else:
            x32 = x.astype(jnp.float32)
            xsq = jax.lax.dot_general(ones_d, x32 * x32, dn,
                                      preferred_element_type=jnp.float32)
            d = jnp.maximum(qsq_col + xsq - 2.0 * dots, 0.0)
        valid = (s * SEG + col) < cnt

        if pos_bits:
            # Packed-key selection (round 4): the kp rounds of
            # argmin+onehot+masked-sum below cost ~5 VPU passes over
            # [qt, kp+SEG] per extracted element and dominated the
            # kernel window (measured 6.3 us/tile where the DMA bound
            # is ~0.3 us — profile_ivf.py). Pack (distance, position)
            # into ONE int32: monotonic float->int key bits rounded to
            # a multiple of 2**pos_bits, position in the low bits.
            # Extraction becomes min + equality-mask (2 passes), ids
            # decode for free, and uniqueness of positions makes the
            # equality mask remove exactly one element. Costs
            # <= 2**(pos_bits-24) relative distance error — below the
            # bf16 storage rounding already in the dots.
            b = jax.lax.bitcast_convert_type(d, jnp.int32)
            key = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))   # monotonic
            half = jnp.int32(1 << (pos_bits - 1))
            mask_hi = jnp.int32(-(1 << pos_bits))
            pos32 = s * SEG + col                           # unique/tile
            key = ((key + half) & mask_hi) | pos32
            key = jnp.where(valid, key, INT_FILL)

            if block_min:
                # Lane-class tournament (round 5): the kp rounds below
                # still cost ~3 VPU passes over [qt, SEG] each — ~30
                # SEG-wide passes per segment, the measured kernel wall
                # (profile_ivf.py: scan 13.1 ms of a 28.9 ms fused
                # search at nprobe=8). Fold the keys into per-lane-class
                # minima first: class l = positions {l, l+128, ...}
                # (exactly the VREG columns, so the fold is SEG/128 - 1
                # elementwise mins), then run the kp rounds over the
                # [qt, 128] minima. LEGALLY APPROXIMATE: at most ONE
                # candidate per (query, segment, lane-class) — a loss
                # only when >=2 of a segment's true top-kp fall in the
                # same class AND the dropped one belongs in the final
                # merged top-k (classes are 128 rows apart, so members
                # are spatially uncorrelated; end-to-end recall
                # re-measured through this path by bench.py).
                bm = jnp.min(key.reshape(qt, SEG // 128, 128), axis=1)

                def pickb(j, st):
                    cb, rk, nk = st
                    v = jnp.minimum(jnp.min(cb, axis=1, keepdims=True),
                                    jnp.min(rk, axis=1, keepdims=True))
                    nk = jnp.where(iota_k == j, v, nk)
                    cb = jnp.where(cb == v, INT_FILL, cb)
                    rk = jnp.where(rk == v, INT_FILL, rk)
                    return cb, rk, nk

                _, _, new_k = jax.lax.fori_loop(
                    0, kp, pickb, (bm, run_d,
                                   jnp.full((qt, kp), INT_FILL,
                                            jnp.int32)))
                return new_k, run_i

            # extraction works the [qt, SEG] buffer (lane-aligned: SEG
            # is a multiple of 128) and the tiny [qt, kp] running keys
            # SEPARATELY — concatenating them made every pass 1034 wide
            # and unaligned
            def pick(j, st):
                ck, rk, nk = st
                v = jnp.minimum(jnp.min(ck, axis=1, keepdims=True),
                                jnp.min(rk, axis=1, keepdims=True))
                nk = jnp.where(iota_k == j, v, nk)
                ck = jnp.where(ck == v, INT_FILL, ck)
                rk = jnp.where(rk == v, INT_FILL, rk)
                return ck, rk, nk

            _, _, new_k = jax.lax.fori_loop(
                0, kp, pick, (key, run_d,
                              jnp.full((qt, kp), INT_FILL, jnp.int32)))
            return new_k, run_i

        d = jnp.where(valid, d, NEG_FILL)
        ids = jnp.where(valid, off + s * SEG + col, -1)

        cat_d = jnp.concatenate([run_d, d], axis=1)   # [qt, kp+SEG]
        cat_i = jnp.concatenate([run_i, ids], axis=1)

        def pick(j, st):
            cd, nd, ni = st
            val = jnp.min(cd, axis=1, keepdims=True)
            ppos = jnp.argmin(cd, axis=1)[:, None]
            onehot = iota_w == ppos
            sel_id = jnp.sum(jnp.where(onehot, cat_i, 0), axis=1,
                             keepdims=True)
            write = iota_k == j
            nd = jnp.where(write, val, nd)
            ni = jnp.where(write, sel_id, ni)
            cd = jnp.where(onehot, NEG_FILL, cd)
            return cd, nd, ni

        _, new_d, new_i = jax.lax.fori_loop(
            0, kp, pick,
            (cat_d, jnp.full((qt, kp), NEG_FILL, jnp.float32),
             jnp.full((qt, kp), -1, jnp.int32)))
        return new_d, new_i

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

    # dead cell: nothing in flight for us; pass the prefetch baton so the
    # next live tile's seg0 is started (parity unchanged)
    @pl.when((cnt == 0) & (t + 1 < T))
    def _():
        @pl.when(cnt_ref[t + 1] > 0)
        def _():
            get_dma(p0, off_ref[t + 1], 0).start()

    par_ref[0] = (p0 + n_segs) % 2


@functools.partial(jax.jit,
                   static_argnames=("kp", "metric", "qt", "interpret",
                                    "pos_bits", "block_min"))
def grouped_probe_scan(qpad, vecs, tile_off, tile_cnt, *,
                       kp: int, metric: str = "sqeuclidean",
                       qt: int = QT, interpret: bool = False,
                       pos_bits: int = 0, block_min: bool = False):
    """qpad [T*qt, D] f32 tile-packed queries; vecs [Npad, D]
    cluster-contiguous (f32 or bf16); tile_off/tile_cnt [T] int32.
    Returns (dists [T, qt, kp], csr_rows [T, qt, kp]).

    ``pos_bits > 0`` enables packed-key selection (~2.5x fewer VPU
    passes in the per-tile top-kp; see the kernel comment): it must
    satisfy ``2**pos_bits >= max list rows`` so every in-list position
    fits the low bits, and costs <= 2**(pos_bits-24) relative distance
    rounding. 0 keeps the exact argmin extraction.

    CALLER CONTRACT (same as ivf_scan.py): vecs padded >= SEG rows past
    the last list; list offsets 32-row aligned.
    """
    T = tile_off.shape[0]
    D = qpad.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((qt, D), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # vecs stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, qt, kp), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, kp), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SEG, D), vecs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kern = functools.partial(_grouped_scan_kernel, kp=kp, metric=metric,
                             pos_bits=pos_bits, block_min=block_min)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, qt, kp), jnp.float32),
            jax.ShapeDtypeStruct((T, qt, kp), jnp.int32),
        ),
        interpret=interpret,
    )(tile_off, tile_cnt, qpad, vecs)


@functools.partial(jax.jit, static_argnames=("k",))
def merge_partials(out_d, out_i, pos, *, k: int):
    """Gather each tuple's partial top-kp by padded slot, merge across
    probe ranks. pos [B, npad] (original tuple order)."""
    B, npad = pos.shape
    kp = out_d.shape[-1]
    pd = out_d.reshape(-1, kp)[pos.reshape(-1)].reshape(B, npad * kp)
    pi = out_i.reshape(-1, kp)[pos.reshape(-1)].reshape(B, npad * kp)
    negv, sel = jax.lax.top_k(-pd, k)
    rows = jnp.take_along_axis(pi, sel, axis=1)
    vals = -negv
    rows = jnp.where(vals < NEG_FILL * 0.5, rows, -1)
    return vals, rows


def ivf_grouped_search(q, probes, vecs, offsets, counts, *, k: int,
                       metric: str = "sqeuclidean", qt: int = QT,
                       interpret: bool = False, pos_bits: int = 0,
                       block_min: bool = False):
    """Full grouped pipeline: probes [B, npad] list ids (sentinel =
    nlists in padding slots). Returns (dists [B, k], csr_rows [B, k])."""
    B, npad = probes.shape
    nlists = counts.shape[0]
    t_max = tiles_for(B, npad, nlists, qt)
    kp = max(8, min(k, SEG))
    tile_off, tile_cnt, pos = group_probes(
        probes, offsets, counts, qt=qt, t_max=t_max)
    qpad = _scatter_tuples(q, pos, npad=npad, qt=qt, t_max=t_max)
    out_d, out_i = grouped_probe_scan(qpad, vecs, tile_off, tile_cnt,
                                      kp=kp, metric=metric, qt=qt,
                                      interpret=interpret,
                                      pos_bits=pos_bits,
                                      block_min=block_min)
    return merge_partials(out_d, out_i, pos.reshape(B, npad), k=k)


@functools.partial(jax.jit, static_argnames=("npad", "qt", "t_max"))
def _scatter_tuples(q, pos, *, npad: int, qt: int, t_max: int):
    """qpad[pos[i]] = q[i // npad] for every tuple i (original order)."""
    G = pos.shape[0]
    tuple_q = jnp.arange(G, dtype=jnp.int32) // npad
    qg = q[tuple_q]                                  # [G, D]
    return jnp.zeros((t_max * qt, q.shape[1]), q.dtype).at[pos].set(qg)


def prewarm(n_rows: int, d: int, *, nlists: int = 1024, k: int = 10,
            batch: int = 4096, npad_buckets=(4, 16, 64, 256),
            metric: str = "sqeuclidean") -> None:
    """Compile the grouped-scan shapes for a corpus of ``n_rows`` BEFORE
    any other device work (Mosaic remote compiles on this backend are
    only reliable early in a clean process; the persistent cache keeps
    them forever). Padding rule must match index/ivf.py _build_lists
    (PAD_SEG=1024 tail)."""
    from neurondb_tpu.config import get_config
    from neurondb_tpu.index.ivf import _ivf_search_grouped
    pad_seg = 1024
    npad_rows = max(1, -(-n_rows // pad_seg) * pad_seg) + pad_seg
    store_dt = (jnp.bfloat16
                if get_config().store_dtype in ("auto", "bfloat16")
                else jnp.float32)
    q = jnp.zeros((batch, d), jnp.float32)
    vecs = jnp.zeros((npad_rows, d), store_dt)
    centroids = jnp.zeros((nlists, d), jnp.float32)
    row_ids = jnp.zeros(npad_rows, jnp.int32)
    offsets = jnp.zeros(nlists, jnp.int32)
    counts = jnp.zeros(nlists, jnp.int32)
    lmetric = {"sqeuclidean": "l2"}.get(metric, metric)
    for npad in npad_buckets:
        if npad > nlists:
            break
        out = _ivf_search_grouped(q, centroids, vecs, row_ids, offsets,
                                  counts, jnp.int32(npad), k=k,
                                  metric=lmetric, nprobe_pad=npad)
        out[0].block_until_ready()


def ivf_grouped_search_reference(q, probes, vecs, offsets, counts, *,
                                 k: int, metric: str = "sqeuclidean"):
    """Numpy oracle with identical semantics (tests)."""
    import numpy as np
    B = q.shape[0]
    nlists = len(counts)
    out_d = np.full((B, k), NEG_FILL, np.float32)
    out_i = np.full((B, k), -1, np.int32)
    qn = np.asarray(q, np.float32)
    vn = np.asarray(vecs, np.float32)
    for b in range(B):
        ds, ids = [], []
        for p in range(probes.shape[1]):
            lid = int(probes[b, p])
            if lid >= nlists:
                continue
            o, c = int(offsets[lid]), int(counts[lid])
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
