"""IVFFlat — k-means-partitioned ANN index, fused probe scans on TPU.

Reference behavior being rebuilt (NeuronDB/src/index/ivf_am.c):
- build: sample <= min(10000, nlists*100) vectors (:580), Lloyd's k-means
  (<=50 iters @ 1e-3, :56-57), centroids stored once (:639-711), inverted
  lists populated by inserts (:728-731);
- scan: select nprobe nearest centroids (:1597-1717), walk the selected
  list chains computing distances (:1722+), sort and emit top-k (:1911);
- defaults nlists=100, nprobe=10 (:54-55).

TPU redesign (SURVEY.md §7 phase 1): after assignment the vectors are
physically reordered cluster-contiguous (CSR: offsets[nlist+1] + flat
[N, D] block). A batched query runs as
  (1) centroid GEMM + top-nprobe on the MXU,
  (2) a lax.scan over probe ranks; per rank every query DMA-gathers fixed
      SEGMENT-row windows of its probed cluster and scores them with a
      VPU multiply-reduce against precomputed squared norms,
  (3) a running top-k merge (ops.topk.merge_topk).
Everything is static-shape; short lists are masked, never branched on.

Divergences from the reference, intentional (SURVEY.md §7 hard part 5):
- cluster selection honors the index metric (cosine uses normalized
  vectors, ip uses dot) instead of the reference's L2-only selection
  (ivf_am.c:1676-1680), matching standard IVF quality;
- build populates lists immediately (the reference's lazy population just
  reflects PG insert flow); ``add`` appends to an exact-scanned spill
  buffer until ``rebuild_lists`` folds it in (neurandefrag role).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.config import get_config
from neurondb_tpu.index.base import BaseIndex, as_batch
from neurondb_tpu.ml.kmeans import kmeans_fit, kmeans_predict
from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK

SEGMENT = 512  # rows gathered per probe step; tuned for VMEM residency
# vector-block tail padding must satisfy the largest kernel segment (the
# grouped kernel DMAs 1024-row segments; ops/pallas/ivf_scan_grouped.SEG)
PAD_SEG = 1024


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "max_segs", "segment"))
def _ivf_search_device(
    q: jax.Array,           # [B, D] float32 (pre-normalized for cosine)
    centroids: jax.Array,   # [nlist, D]
    vecs: jax.Array,        # [Npad, D] cluster-contiguous
    sqnorms: jax.Array,     # [Npad]
    row_ids: jax.Array,     # [Npad] int32 -> original row (-1 pad)
    offsets: jax.Array,     # [nlist] int32 start of each list
    counts: jax.Array,      # [nlist] int32 list lengths
    *, k: int, nprobe: int, metric: str, max_segs: int, segment: int,
) -> Tuple[jax.Array, jax.Array]:
    B = q.shape[0]
    q_sq = jnp.sum(q * q, axis=1)

    # (1) coarse: centroid scores, top-nprobe
    cd = D.pairwise_distance(q, centroids, "sqeuclidean" if metric != "ip" else "ip")
    _, probes = TK.topk_smallest(cd, nprobe)                   # [B, nprobe]

    init = (jnp.full((B, k), TK.NEG_FILL, jnp.float32),
            jnp.full((B, k), -1, jnp.int32))

    def probe_step(carry, probe_col):                          # probe_col [B]
        bvals, bids = carry
        off = offsets[probe_col]                               # [B]
        cnt = counts[probe_col]                                # [B]

        def seg_step(carry, s):
            bvals, bids = carry
            start = off + s * segment                          # [B]
            rows = start[:, None] + jnp.arange(segment)[None, :]   # [B, S]
            in_list = rows < (off + cnt)[:, None]
            rows_safe = jnp.clip(rows, 0, vecs.shape[0] - 1)
            g = vecs[rows_safe]                                # [B, S, D] gather
            if metric == "ip":
                d = -jnp.einsum("bd,bsd->bs", q, g)
            else:
                dots = jnp.einsum("bd,bsd->bs", q, g)
                d = q_sq[:, None] + sqnorms[rows_safe] - 2.0 * dots
                d = jnp.maximum(d, 0.0)
            d = jnp.where(in_list, d, TK.NEG_FILL)
            cand_ids = jnp.where(in_list, row_ids[rows_safe], -1)
            cv, cpos = TK.topk_smallest(d, min(k, segment))
            cids = jnp.take_along_axis(cand_ids, cpos, axis=-1)
            return TK.merge_topk(bvals, bids, cv, cids, k), None

        (bvals, bids), _ = jax.lax.scan(
            seg_step, (bvals, bids), jnp.arange(max_segs))
        return (bvals, bids), None

    (vals, ids), _ = jax.lax.scan(probe_step, init, probes.T)
    if metric == "l2":
        vals = jnp.sqrt(jnp.maximum(vals, 0.0))
    elif metric == "cosine":
        vals = vals * 0.5       # unit vectors: 1 - cos = ||q-x||^2 / 2
    return vals, ids


@functools.partial(jax.jit,
                   static_argnames=("nprobe", "metric", "nprobe_pad"))
def _ivf_coarse(q, centroids, offsets, counts, *, nprobe: int, metric: str,
                nprobe_pad: int):
    """Coarse stage: centroid scores -> top-nprobe probe offsets/counts,
    padded to nprobe_pad (cnt=0 slots are skipped by the kernel)."""
    cd = D.pairwise_distance(
        q, centroids, "sqeuclidean" if metric != "ip" else "ip")
    _, probes = TK.topk_smallest(cd, nprobe)               # [B, nprobe]
    poff = offsets[probes]
    pcnt = counts[probes]
    if nprobe_pad > nprobe:
        pad = nprobe_pad - nprobe
        poff = jnp.pad(poff, ((0, 0), (0, pad)))
        pcnt = jnp.pad(pcnt, ((0, 0), (0, pad)))
    return poff, pcnt


@functools.partial(jax.jit, static_argnames=("metric",))
def _ivf_post(vals, rows, row_ids, *, metric: str):
    ids = jnp.where(rows >= 0, row_ids[jnp.maximum(rows, 0)], -1)
    if metric == "l2":
        vals = jnp.sqrt(jnp.maximum(vals, 0.0))
    elif metric == "cosine":
        vals = vals * 0.5
    vals = jnp.where(ids >= 0, vals, TK.NEG_FILL)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("bf16",))
def _csr_pack(xdev, gather_idx, live, *, bf16: bool):
    """Pack the corpus into the aligned-CSR layout on device: one row
    gather + zero-fill of alignment gaps, f32 sqnorms from the f32
    source, then the bf16 store cast. Replaces a host reorder copy + a
    second 512 MB f32 upload + a per-list Python copy loop."""
    xp = jnp.where(live[:, None], xdev[gather_idx], 0.0)
    sq = jnp.sum(xp * xp, axis=1)
    return (xp.astype(jnp.bfloat16) if bf16 else xp), sq


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk",
                                              "recall_target"))
def _ivf_search_exact(q, vecs, sqnorms, row_ids, offsets, counts, *,
                      k: int, metric: str, chunk: int = 131072,
                      recall_target: float = 1.0):
    """Probe-everything operating point (nprobe ~ nlists): a grouped list
    scan would cover the whole corpus anyway, and its two [T] int32
    scalar-prefetch operands exceed the chip's 1 MB SMEM once
    B*nprobe/qt tiles pass ~100k (measured: nprobe=1024 @ B=16384 fails
    AOT compile) — so run the exact chunked GEMM scan over the
    cluster-ordered store instead. Validity is derived from
    (offsets, counts): delete() shrinks list counts without rewriting
    every tail slot, so a raw row_ids>=0 mask would resurrect tombstoned
    rows."""
    npad_rows = vecs.shape[0]
    idx = jnp.arange(npad_rows, dtype=jnp.int32)
    nlists = offsets.shape[0]
    li = jnp.clip(jnp.searchsorted(offsets, idx, side="right") - 1,
                  0, nlists - 1)
    valid = ((idx >= offsets[li]) & (idx < offsets[li] + counts[li])
             & (row_ids >= 0))
    # bf16 store -> bf16 x bf16 -> f32 MXU dots (norms stay f32), the
    # same numeric contract as the grouped kernel's scoring
    dd = vecs.dtype if vecs.dtype != jnp.float32 else None
    # recall_target < 1.0 selects per chunk with the TPU-native
    # PartialReduce (lax.approx_min_k, 5.3x faster than XLA TopK at
    # [16384, 16384] measured) — an opt-in approximate operating point;
    # the default stays exact (probing all lists = brute force).
    return TK.chunked_knn(q, vecs, k, metric=metric, base_sqnorms=sqnorms,
                          ids=row_ids, valid=valid, chunk=chunk,
                          dot_dtype=dd, recall_target=recall_target)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "nprobe_pad", "qt",
                                    "pos_bits", "coarse_rt",
                                    "block_min"))
def _ivf_search_grouped(q, centroids, vecs, row_ids, offsets, counts,
                        nprobe, *, k: int, metric: str, nprobe_pad: int,
                        qt: int = 0, pos_bits: int = 0,
                        coarse_rt: float = 1.0, block_min: bool = False):
    """TPU fast path (round 2): coarse centroid stage -> list-grouped
    fused scan (ops/pallas/ivf_scan_grouped.py) -> merge + id map, all as
    ONE jit. One posting-list DMA serves a whole tile of queries (vs one
    DMA per query in round 1), and the single dispatch matters on this
    backend: each jit call costs ~29 ms of tunnel round-trip, so the
    round-1 chain of 5 dispatches was latency-bound.

    ``nprobe`` is a TRACED scalar: the coarse stage always takes
    top-``nprobe_pad`` centroids and masks columns >= nprobe to the
    sentinel list, so every nprobe in a pad bucket shares one
    compilation (fresh compiles cost 20-40 s through the tunnel)."""
    from neurondb_tpu.ops.pallas import ivf_scan_grouped as G
    npad = nprobe_pad
    nlists = counts.shape[0]
    cd = D.pairwise_distance(
        q, centroids, "sqeuclidean" if metric != "ip" else "ip")
    # coarse_rt < 1.0 routes probe selection through the TPU-native
    # PartialReduce (lax.approx_min_k) — probes are heuristic routing
    # and recall is re-measured end-to-end, while exact lax.top_k at
    # [B, nlists] was 1/3 of the whole search wall (profile_ivf.py)
    _, probes = TK.topk_smallest(cd, npad, recall_target=coarse_rt)
    probes = probes.astype(jnp.int32)
    col = jnp.arange(npad, dtype=jnp.int32)[None, :]
    probes = jnp.where(col < nprobe, probes, nlists)
    B = q.shape[0]
    qt = qt or G.auto_qt(B, npad, nlists)
    t_max = G.tiles_for(B, npad, nlists, qt)
    kp = max(8, min(k, G.SEG))
    tile_off, tile_cnt, pos = G.group_probes(
        probes, offsets, counts, qt=qt, t_max=t_max)
    qpad = G._scatter_tuples(q, pos, npad=npad, qt=qt, t_max=t_max)
    out_d, out_i = G.grouped_probe_scan(
        qpad, vecs, tile_off, tile_cnt, kp=kp, qt=qt,
        metric="ip" if metric == "ip" else "sqeuclidean",
        pos_bits=pos_bits, block_min=block_min)
    vals, rows = G.merge_partials(out_d, out_i, pos.reshape(B, npad), k=k)
    return _ivf_post(vals, rows, row_ids, metric=metric)


def _ivf_search_pallas(q, centroids, vecs, row_ids, offsets, counts, *,
                       k: int, nprobe: int, metric: str, max_segs: int,
                       nprobe_pad: int = 0):
    """TPU fast path: coarse centroid stage (XLA jit) -> fused Pallas probe
    scan (its OWN top-level jit so the prewarmed Mosaic executable is the
    one reused; see ops/pallas/ivf_scan.prewarm) -> post-processing jit.

    nprobe_pad > nprobe pads the probe list with empty (cnt=0) slots so
    different nprobe settings share ONE kernel compilation — fresh Mosaic
    compiles are expensive and, on this backend, flaky after the first few
    in a process; empty cells exit in microseconds.
    """
    from neurondb_tpu.ops.pallas.ivf_scan import ivf_probe_scan
    poff, pcnt = _ivf_coarse(q, centroids, offsets, counts, nprobe=nprobe,
                             metric=metric, nprobe_pad=max(nprobe_pad,
                                                           nprobe))
    vals, rows = ivf_probe_scan(
        q, None, vecs, poff, pcnt, k=k, max_segs=max_segs,
        metric="ip" if metric == "ip" else "sqeuclidean")
    return _ivf_post(vals, rows, row_ids, metric=metric)


class IVFFlatIndex(BaseIndex):
    kind = "ivfflat"

    def __init__(self, vectors, *, nlists: Optional[int] = None,
                 metric: str = "l2", ids=None, seed: int = 0,
                 kmeans_iters: Optional[int] = None,
                 sample_cap: Optional[int] = None,
                 spherical: Optional[bool] = None,
                 device_vectors: Optional[jax.Array] = None):
        """``device_vectors``: the same corpus already resident on device
        as f32 [n, d] (spherical-normalized if the metric requires it).
        The build then never re-uploads the corpus: the k-means sample
        is a device-side gather and list packing reuses the array. The
        HNSW bulk build passes this — its corpus is on device before the
        IVF bootstrap, and through the axon tunnel the two redundant
        uploads (67 MB sample + 512 MB corpus at 1M x 128) were 200+ s
        of the build on a degraded-h2d slot (r5 profile: ALL of the
        bootstrap's k-means compute is <1 s; the uploads were the rest)."""
        cfg = get_config()
        x = np.asarray(vectors, np.float32)
        n, d = x.shape
        self.metric = D.canonical_metric(metric)
        self.dim = d
        self.n = n
        self.nlists = int(nlists if nlists is not None else cfg.ivf_nlists)
        self.nlists = max(1, min(self.nlists, n))
        self._seed = seed
        self._ids = np.asarray(ids, np.int64) if ids is not None \
            else np.arange(n, dtype=np.int64)
        # cosine: work on the unit sphere so sq-L2 ranks identically
        self._spherical = (self.metric == "cosine") if spherical is None else spherical
        if self._spherical:
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.maximum(norms, 1e-30)
        self._x = x

        # ---- train: sampled Lloyd's (ivf_am.c:580 sampling rule) ----
        cap = int(sample_cap if sample_cap is not None
                  else max(cfg.ivf_sample_cap, self.nlists * 100))
        rng = np.random.default_rng(seed)
        xdev = device_vectors
        if xdev is not None:
            if n <= cap:
                sample_dev = xdev
            else:
                idx = rng.choice(n, cap, replace=False)
                sample_dev = jnp.take(xdev, jnp.asarray(idx), axis=0)
        else:
            sample = x if n <= cap else x[rng.choice(n, cap,
                                                     replace=False)]
            sample_dev = jnp.asarray(sample)
        state = kmeans_fit(sample_dev, self.nlists,
                           max_iter=int(kmeans_iters or cfg.ivf_kmeans_iters),
                           tol=cfg.ivf_kmeans_tol, seed=seed)
        self.centroids = state.centroids
        self.train_inertia = float(state.inertia)
        self._build_lists(x, xdev=xdev)
        self._spill: list = []        # unindexed inserts, exact-scanned

    # ---- list construction ----
    LIST_ALIGN = 32   # rows; Mosaic DMA starts must be sublane-aligned

    def _build_lists(self, x: np.ndarray,
                     xdev: Optional[jax.Array] = None) -> None:
        # ONE corpus upload (ZERO when the caller hands us its device
        # array): the tunnel moves ~50 MB/s, so the previous flow's two
        # f32 uploads (predict + reordered copy) were ~20 s of the 1M
        # build. Predict, CSR-pack, norms, and the bf16 cast all reuse
        # the same device array.
        if xdev is None:
            xdev = jnp.asarray(x)
        labels = np.asarray(kmeans_predict(self.centroids, xdev))
        order = np.argsort(labels, kind="stable")
        counts = np.bincount(labels, minlength=self.nlists).astype(np.int32)
        # Aligned CSR: every list start is a LIST_ALIGN multiple so the
        # fused kernel's DMA slices satisfy Mosaic's tiling-divisibility
        # requirement (bf16 packs 2 rows/sublane). Gap rows are dead: the
        # kernel masks by cnt and the XLA path by row bounds.
        A = self.LIST_ALIGN
        aligned = ((counts + A - 1) // A) * A
        self._region = aligned           # per-list row capacity (delete)
        offsets = np.zeros(self.nlists, np.int32)
        np.cumsum(aligned[:-1], out=offsets[1:])
        total = int(aligned.sum())
        n = x.shape[0]
        # +PAD_SEG: every per-list segment DMA stays in bounds
        # (ops/pallas/ivf_scan*.py caller contract)
        npad = max(1, -(-total // PAD_SEG) * PAD_SEG) + PAD_SEG
        src = np.zeros(self.nlists + 1, np.int64)
        np.cumsum(counts, out=src[1:])
        order_aligned = np.full(npad, -1, np.int64)
        if n:
            tgt = (np.repeat(offsets.astype(np.int64), counts)
                   + (np.arange(n) - np.repeat(src[:-1], counts)))
            order_aligned[tgt] = order
        order = order_aligned
        # store bf16 on TPU: halves posting-list DMA traffic; distances
        # accumulate in f32 on the MXU (ranking-equivalent; sqnorms from
        # the f32 source keep the L2 expansion accurate)
        self._store_bf16 = (jax.default_backend() == "tpu"
                            and get_config().store_dtype in ("auto",
                                                             "bfloat16"))
        live = order >= 0
        self._vecs, self._sqnorms = _csr_pack(
            xdev, jnp.asarray(np.where(live, order, 0).astype(np.int32)),
            jnp.asarray(live),
            bf16=self._store_bf16)
        self._row_ids = jnp.asarray(order.astype(np.int32))
        # device-resident external-id map (CSR row -> user id): the hot
        # search path must emit final ids without eager host-side mapping
        ext = np.full(npad, -1, np.int64)
        live = order >= 0
        ext[live] = self._ids[order[live]]
        if len(self._ids) == 0 or ext.max() <= np.iinfo(np.int32).max:
            self._ext_ids = jnp.asarray(ext.astype(np.int32))
            self._host_id_map = None
        else:       # >int32 external ids: emit rows, map on host
            self._ext_ids = self._row_ids
            self._host_id_map = True
        self._offsets = jnp.asarray(offsets)
        self._counts = jnp.asarray(counts)
        self._counts_np = counts.copy()
        self.max_list = int(counts.max()) if n else 1
        self._labels = labels
        self._dead = np.zeros(n, bool)   # tombstones over self._x rows

    # ---- mutation (lazy-list parity) ----
    def add(self, vectors, ids=None) -> np.ndarray:
        v = np.asarray(vectors, np.float32)
        if v.ndim == 1:
            v = v[None, :]
        if self._spherical:
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        new_ids = (np.asarray(ids, np.int64) if ids is not None else
                   np.arange(self._ids.max() + 1 if len(self._ids) else 0,
                             (self._ids.max() + 1 if len(self._ids) else 0) + len(v),
                             dtype=np.int64))
        self._spill.append((v, new_ids))
        return new_ids

    def delete(self, ids) -> int:
        """In-place delete: compact each affected posting list within its
        aligned region and shrink its count — no full rebuild. Mirrors the
        reference's ivf vacuum removing entries from list pages
        (NeuronDB/src/index/ivf_am.c bulkdelete path). Returns the number
        of vectors removed."""
        drop = np.unique(np.atleast_1d(np.asarray(ids, np.int64)))
        removed = 0
        # spill buffer (not yet in lists): plain host filter
        new_spill = []
        for v, sid in self._spill:
            keep = ~np.isin(sid, drop)
            removed += int((~keep).sum())
            if keep.any():
                new_spill.append((v[keep], sid[keep]))
        self._spill = new_spill
        mask = np.isin(self._ids, drop) & ~self._dead
        hit = int(mask.sum())
        removed += hit
        if hit == 0:
            self.n = int((~self._dead).sum()) + sum(
                len(i) for _, i in self._spill)
            return removed
        self._dead |= mask
        affected = np.unique(self._labels[mask])
        offsets = np.asarray(self._offsets)
        pos_upd: list = []
        row_upd: list = []
        for lid in affected:
            members = np.where((self._labels == lid) & ~self._dead)[0]
            o = int(offsets[lid])
            self._counts_np[lid] = len(members)
            pos_upd.append(o + np.arange(len(members), dtype=np.int32))
            row_upd.append(members)
        self._counts = jnp.asarray(self._counts_np)
        pos = np.concatenate(pos_upd) if pos_upd else np.zeros(0, np.int32)
        rowsrc = np.concatenate(row_upd) if row_upd else np.zeros(0, np.int64)
        if len(pos):
            # pad the scatter to a power of two (repeat-last; duplicate
            # rows write identical values) to bound compile shapes
            p2 = 1 << max(int(len(pos) - 1).bit_length(), 4)
            padn = p2 - len(pos)
            if padn:
                pos = np.concatenate([pos, np.full(padn, pos[-1], np.int32)])
                rowsrc = np.concatenate(
                    [rowsrc, np.full(padn, rowsrc[-1], rowsrc.dtype)])
            pj = jnp.asarray(pos)
            xv = jnp.asarray(self._x[rowsrc])
            self._vecs = self._vecs.at[pj].set(xv.astype(self._vecs.dtype))
            self._sqnorms = self._sqnorms.at[pj].set(jnp.sum(xv * xv, axis=1))
            self._row_ids = self._row_ids.at[pj].set(
                jnp.asarray(rowsrc.astype(np.int32)))
            if self._host_id_map is None:
                self._ext_ids = self._ext_ids.at[pj].set(
                    jnp.asarray(self._ids[rowsrc].astype(np.int32)))
            else:
                self._ext_ids = self._row_ids
        self.n = int((~self._dead).sum()) + sum(
            len(i) for _, i in self._spill)
        return removed

    @property
    def dead_ratio(self) -> float:
        total = len(self._x)
        return float(self._dead.sum()) / total if total else 0.0

    def rebuild_lists(self) -> None:
        """Fold spill buffer into the posting lists and drop tombstones
        (defrag/compaction)."""
        if not self._spill and not self._dead.any():
            return
        keep = ~self._dead
        vs = np.concatenate([self._x[keep]] + [v for v, _ in self._spill])
        ids = np.concatenate([self._ids[keep]] + [i for _, i in self._spill])
        self._x, self._ids = vs, ids
        self.n = len(vs)
        self._spill = []
        self._build_lists(vs)

    # ---- search ----
    def search(self, queries, k: int = 10, *, nprobe: Optional[int] = None,
               out: str = "numpy", recall_target: float = 1.0,
               coarse_rt: Optional[float] = None,
               select: Optional[str] = None,
               **kw) -> Tuple[np.ndarray, np.ndarray]:
        """``out="device"`` returns jax arrays without forcing a host
        sync, so a caller can pipeline many batches (each host sync on
        this backend costs ~29 ms of tunnel latency). Device mode
        requires no spill buffer and int32-safe external ids.

        Approximation knobs (all also settable via config / env):

        - ``recall_target`` — probe-everything (exact-scan) operating
          point only: <1.0 selects per chunk with lax.approx_min_k.
        - ``coarse_rt`` — probe SELECTION recall target (default
          ``config.ivf_coarse_rt`` = 0.99): probes are heuristic
          routing, and approx_min_k there measured 1/3 of the search
          wall cheaper. Pass 1.0 for bit-exact probe selection.
        - ``select`` — grouped-kernel top-k extraction, ``"packed"``
          (default, ~2.5x fewer VPU passes, rounds distances by
          <= 2**(pos_bits-24) relative and may swap near-ties at the
          k boundary) or ``"exact"``.
        """
        cfg = get_config()
        nprobe = int(nprobe if nprobe is not None else cfg.ivf_nprobe)
        nprobe = max(1, min(nprobe, self.nlists))
        q, single = as_batch(queries)
        if self._spherical:
            qn = jnp.linalg.norm(q, axis=1, keepdims=True)
            q = q / jnp.maximum(qn, 1e-30)
        max_segs = max(1, -(-self.max_list // SEGMENT))
        use_pallas = (cfg.use_pallas and cfg.compute_mode != "cpu"
                      and jax.default_backend() == "tpu"
                      and q.shape[1] % 128 == 0)
        if use_pallas:
            # bucket nprobe so sweeps reuse one kernel compilation
            npad = 1
            while npad < nprobe:
                npad *= 4
            npad = min(max(npad, 4), self.nlists)
            import os
            from neurondb_tpu.ops.pallas import ivf_scan_grouped as G
            qt_eff = cfg.ivf_qt or G.auto_qt(q.shape[0], npad, self.nlists)
            t_max = G.tiles_for(q.shape[0], npad, self.nlists, qt_eff)
            if npad >= self.nlists or 8 * t_max > (1 << 20):
                # probe-everything point, or the grouped kernel's [T]
                # scalar-prefetch tiles would blow the 1 MB SMEM budget
                # (2 operands x 4 bytes x T, headroom 2x): exact scan.
                # Chunk caps the [B, chunk] f32 distance block at ~1 GB
                # (power-of-two so compile shapes stay bucketed).
                chunk = max(4096, min(131072,
                                      1 << (28 - max(q.shape[0], 1)
                                            .bit_length() + 1)))
                vals, ids = _ivf_search_exact(
                    q, self._vecs, self._sqnorms, self._ext_ids,
                    self._offsets, self._counts,
                    k=min(k, max(self.n, 1)), metric=self.metric,
                    chunk=chunk, recall_target=recall_target)
            elif os.environ.get("NEURONDB_TPU_IVF_KERNEL", "grouped") == \
                    "grouped":
                # packed-key selection: pos_bits must cover the longest
                # list; past 14 bits the distance rounding (2**(pb-24)
                # relative) stops being negligible, so fall back to the
                # exact extraction. Floor of 11 buckets recompiles.
                pb = max(11, (max(self.max_list, 2) - 1).bit_length())
                sel = select if select is not None else cfg.ivf_select
                if pb > 14 or sel not in ("packed", "blockmin"):
                    pb = 0
                # "blockmin" adds the lane-class tournament inside the
                # kernel (at most one candidate per (query, segment,
                # lane-class); ~4x fewer selection passes — see
                # ivf_scan_grouped.py)
                bmin = pb > 0 and sel == "blockmin"
                # NEURONDB_TPU_COARSE_RT kept as a legacy env override;
                # the first-class knob is config.ivf_coarse_rt / the
                # coarse_rt search kwarg
                crt = float(
                    coarse_rt if coarse_rt is not None
                    else os.environ.get("NEURONDB_TPU_COARSE_RT",
                                        cfg.ivf_coarse_rt))
                vals, ids = _ivf_search_grouped(
                    q, self.centroids, self._vecs, self._ext_ids,
                    self._offsets, self._counts, jnp.int32(nprobe),
                    k=min(k, max(self.n, 1)),
                    metric=self.metric, nprobe_pad=max(npad, nprobe),
                    qt=cfg.ivf_qt, pos_bits=pb, coarse_rt=crt,
                    block_min=bmin)
            else:     # round-1 per-query-DMA kernel (fallback)
                segs_b = 1
                while segs_b < max_segs:
                    segs_b *= 2
                vals, ids = _ivf_search_pallas(
                    q, self.centroids, self._vecs, self._ext_ids,
                    self._offsets, self._counts,
                    k=min(k, max(self.n, 1)), nprobe=nprobe,
                    metric=self.metric, max_segs=segs_b,
                    nprobe_pad=max(npad, 16))
        else:
            vals, ids = _ivf_search_device(
                q, self.centroids, self._vecs, self._sqnorms, self._ext_ids,
                self._offsets, self._counts,
                k=min(k, max(self.n, 1)), nprobe=nprobe, metric=self.metric,
                max_segs=max_segs, segment=SEGMENT)
        if out == "device":
            if self._spill or self._host_id_map is not None or single:
                raise ValueError("device output requires a batch query, "
                                 "no spill buffer, and int32 ids")
            return vals, ids
        vals, ids = np.asarray(vals), np.asarray(ids)
        if self._host_id_map is not None:   # rows -> int64 external ids
            ids = np.where(ids >= 0, self._ids[np.maximum(ids, 0)], -1)
        if self._spill:
            vals, ids = self._merge_spill(np.asarray(q), k, vals, ids)
        return (vals[0], ids[0]) if single else (vals, ids)

    def _merge_spill(self, q: np.ndarray, k: int, vals, ids):
        sv = np.concatenate([v for v, _ in self._spill])
        sids = np.concatenate([i for _, i in self._spill])
        d = np.asarray(D.pairwise_distance(jnp.asarray(q), jnp.asarray(sv),
                                           self.metric))
        if self._spherical and self.metric == "cosine":
            pass  # pairwise cosine already metric-true
        both_v = np.concatenate([vals, d], axis=1)
        both_i = np.concatenate(
            [ids, np.broadcast_to(sids, (len(q), len(sids)))], axis=1)
        ordv = np.argsort(both_v, axis=1, kind="stable")[:, :k]
        return (np.take_along_axis(both_v, ordv, axis=1),
                np.take_along_axis(both_i, ordv, axis=1))

    # ---- persistence ----
    def _state(self):
        self.rebuild_lists()
        return ({"x": self._x, "ids": self._ids,
                 "centroids": self.centroids},
                {"nlists": self.nlists, "n": self.n, "seed": self._seed,
                 "spherical": self._spherical})

    def _load_state(self, arrays, meta):
        self.metric = meta["metric"]
        self.dim = meta["dim"]
        self.n = meta["n"]
        self.nlists = meta["nlists"]
        self._seed = meta.get("seed", 0)
        self._spherical = meta.get("spherical", self.metric == "cosine")
        self._x = np.asarray(arrays["x"], np.float32)
        self._ids = np.asarray(arrays["ids"], np.int64)
        self.centroids = jnp.asarray(arrays["centroids"])
        self.train_inertia = float("nan")
        self._build_lists(self._x)
        self._spill = []

    # ---- diagnostics (index_validator.c analog) ----
    def stats(self) -> Dict[str, Any]:
        c = np.asarray(self._counts)
        return {
            "kind": self.kind, "n": self.n, "nlists": self.nlists,
            "metric": self.metric,
            "list_len_min": int(c.min()), "list_len_max": int(c.max()),
            "list_len_mean": float(c.mean()),
            "empty_lists": int((c == 0).sum()),
            "imbalance": float(c.max() / max(c.mean(), 1e-9)),
            "train_inertia": self.train_inertia,
        }
