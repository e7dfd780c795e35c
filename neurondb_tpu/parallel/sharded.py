"""Sharded search + training steps (shard_map + XLA collectives).

Design (SURVEY.md §2.10 table, §7 phase 4 and BASELINE.json config #5):
- flat / IVF stores row-sharded over the mesh's ``shard`` axis (ICI);
- queries replicated; each chip runs the same fused distance+top-k over
  its local rows; per-chip (dists, global_ids) merge via all_gather +
  top-k — deterministic merge order (shard-major, then distance),
  mirroring merge_distributed_results (distributed.c:320);
- k-means training: data sharded, assignment local, centroid update via
  psum of (sums, counts) — the collective replaces the reference's
  in-process SQL merge.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK
from neurondb_tpu.parallel.mesh import make_mesh, replicate, shard_rows

shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
if shard_map is None:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore


def _pad_rows(x: np.ndarray, mult: int, fill=0):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, width, constant_values=fill)


def sharded_knn(mesh: Mesh, queries, base_sharded, ids_sharded,
                valid_sharded, k: int, *, metric: str = "l2",
                axis: str = "shard"):
    """Exact k-NN over a row-sharded base. Returns replicated
    (dists [B, k], ids [B, k]). All inputs must already be device-placed
    with shardings consistent with ``mesh``/``axis``."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def _search(q, xs, ids, valid):
        ld, lrows = TK.chunked_knn(q, xs, k, metric=metric,
                                   chunk=min(xs.shape[0], 65536), valid=valid)
        # a shard with fewer than k rows returns a narrower result; pad
        # so the cross-shard merge can always request top-k
        kk_local = ld.shape[1]
        if kk_local < k:
            ld = jnp.pad(ld, ((0, 0), (0, k - kk_local)),
                         constant_values=TK.NEG_FILL)
            lrows = jnp.pad(lrows, ((0, 0), (0, k - kk_local)),
                            constant_values=-1)
        lids = jnp.where(lrows >= 0, ids[jnp.maximum(lrows, 0)], -1)
        # gather partial top-k from every chip over ICI, merge locally
        gd = jax.lax.all_gather(ld, axis)          # [S, B, k]
        gi = jax.lax.all_gather(lids, axis)
        s, b, kk = gd.shape
        gd = jnp.moveaxis(gd, 0, 1).reshape(b, s * kk)
        gi = jnp.moveaxis(gi, 0, 1).reshape(b, s * kk)
        k_out = min(k, s * kk)
        negv, pos = jax.lax.top_k(-gd, k_out)
        return -negv, jnp.take_along_axis(gi, pos, axis=1)

    return _search(queries, base_sharded, ids_sharded, valid_sharded)


def sharded_kmeans_step(mesh: Mesh, x_sharded, centroids, *,
                        axis: str = "shard"):
    """One Lloyd's iteration over sharded data: local GEMM-argmin
    assignment, psum'd (sums, counts) centroid update. Returns
    (new_centroids replicated, inertia scalar)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def _step(xs, c):
        x_sq = jnp.sum(xs * xs, axis=1)
        c_sq = jnp.sum(c * c, axis=1)
        dots = jnp.dot(xs, c.T, preferred_element_type=jnp.float32)
        d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * dots
        labels = jnp.argmin(d2, axis=1)
        best = jnp.maximum(jnp.min(d2, axis=1), 0.0)
        onehot = jax.nn.one_hot(labels, c.shape[0], dtype=jnp.float32)
        sums = jax.lax.psum(
            jnp.dot(onehot.T, xs, preferred_element_type=jnp.float32), axis)
        counts = jax.lax.psum(jnp.sum(onehot, axis=0), axis)
        inertia = jax.lax.psum(jnp.sum(best), axis)
        newc = jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts[:, None], 1.0), c)
        return newc, inertia

    return _step(x_sharded, centroids)


class ShardedFlatIndex:
    """Exact k-NN with the base row-sharded across the mesh."""

    def __init__(self, vectors, *, mesh: Optional[Mesh] = None,
                 metric: str = "l2", ids=None, axis: str = "shard"):
        self.mesh = mesh or make_mesh()
        self.axis = axis
        self.metric = D.canonical_metric(metric)
        x = np.asarray(vectors, np.float32)
        self.n, self.dim = x.shape
        nshards = self.mesh.shape[axis]
        ids_np = np.asarray(ids if ids is not None else np.arange(self.n),
                            np.int32)
        valid = np.ones(self.n, bool)
        xp = _pad_rows(x, nshards)
        self._base = shard_rows(self.mesh, jnp.asarray(xp), axis)
        self._ids = shard_rows(
            self.mesh, jnp.asarray(_pad_rows(ids_np, nshards, -1)), axis)
        self._valid = shard_rows(
            self.mesh, jnp.asarray(_pad_rows(valid, nshards, False)), axis)

    def search(self, queries, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        q = replicate(self.mesh, q)
        d, ids = sharded_knn(self.mesh, q, self._base, self._ids, self._valid,
                             k, metric=self.metric, axis=self.axis)
        return np.asarray(d), np.asarray(ids)


class ShardedIVFIndex:
    """IVF with posting lists sharded round-robin across chips.

    Every chip holds a slice of each cluster's posting list (list-interleaved
    row sharding), so per-probe work is balanced; each chip scans its slice
    of the probed lists and the partial top-k merge rides all_gather
    (BASELINE.json config #5 topology).
    """

    def __init__(self, vectors, *, nlists: int = 100,
                 mesh: Optional[Mesh] = None, metric: str = "l2",
                 ids=None, seed: int = 0, axis: str = "shard"):
        from neurondb_tpu.ml.kmeans import kmeans_fit, kmeans_predict
        self.mesh = mesh or make_mesh()
        self.axis = axis
        self.metric = D.canonical_metric(metric)
        x = np.asarray(vectors, np.float32)
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        self.n, self.dim = x.shape
        self.nlists = min(nlists, self.n)
        ids_np = np.asarray(ids if ids is not None else np.arange(self.n),
                            np.int64)
        state = kmeans_fit(jnp.asarray(x), self.nlists, seed=seed)
        self.centroids = np.asarray(state.centroids)
        labels = np.asarray(kmeans_predict(state.centroids, jnp.asarray(x)))
        nshards = self.mesh.shape[axis]
        # Vectorized layout (round 2; the per-(list, shard) Python loops
        # were O(nlists*nshards) — VERDICT r1 weak #9): one stable sort
        # by list id gives within-list ranks; shard = rank % nshards
        # (round-robin balance); a second sort by (shard, list, rank)
        # produces each shard's CSR order directly.
        order = np.argsort(labels, kind="stable")
        lab_sorted = labels[order]
        starts = np.searchsorted(lab_sorted, np.arange(self.nlists))
        rank = np.arange(self.n) - starts[lab_sorted]      # rank in list
        shard_of = (rank % nshards).astype(np.int32)
        # per (shard, list) counts and offsets
        cnt = np.zeros((nshards, self.nlists), np.int32)
        np.add.at(cnt, (shard_of, lab_sorted), 1)
        off = np.zeros((nshards, self.nlists), np.int32)
        off[:, 1:] = np.cumsum(cnt[:, :-1], axis=1)
        cap = int(cnt.sum(axis=1).max()) if self.n else 1
        cap = max(cap, 1)
        # shard-local slot: offset of (shard, list) + rank within shard
        key = shard_of.astype(np.int64) * self.nlists + lab_sorted
        order2 = np.argsort(key, kind="stable")
        # within-(shard, list) rank via segment starts on the sorted keys
        ks = key[order2]
        seg_start = np.searchsorted(ks, ks)      # first idx of each key
        slot_in_pair = np.arange(self.n) - seg_start
        rows_src = order[order2]                 # original row per slot
        sh = shard_of[order2]
        li = lab_sorted[order2]
        pos = off[sh, li] + slot_in_pair
        xs = np.zeros((nshards, cap, self.dim), np.float32)
        ii = np.full((nshards, cap), -1, np.int32)
        xs[sh, pos] = x[rows_src]
        # device-side ids are int32 row positions (x64 is disabled under
        # jit); external ids — which may exceed int32 — are mapped back
        # host-side after the merge, mirroring IVFFlatIndex
        ii[sh, pos] = rows_src
        maxlen = int(cnt.max()) if self.n else 1
        self._ids_np = ids_np
        self.max_list = maxlen
        sh = lambda a: jax.device_put(
            jnp.asarray(a), NamedSharding(self.mesh, P(axis)))
        self._vecs = sh(xs)
        self._ids = sh(ii)
        self._off = sh(off)
        self._cnt = sh(cnt)
        self._cj = replicate(self.mesh, jnp.asarray(self.centroids))

    def search(self, queries, k: int = 10, *, nprobe: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        qj = replicate(self.mesh, jnp.asarray(q))
        nprobe = min(nprobe, self.nlists)
        seg = 128
        max_segs = max(1, -(-self.max_list // seg))
        d, ids = _sharded_ivf_search(
            self.mesh, self.axis, qj, self._cj, self._vecs, self._ids,
            self._off, self._cnt, k=min(k, self.n), nprobe=nprobe,
            metric="ip" if self.metric == "ip" else "sqeuclidean",
            max_segs=max_segs, segment=seg)
        d = np.asarray(d)
        if self.metric == "l2":
            d = np.sqrt(np.maximum(d, 0.0))
        elif self.metric == "cosine":
            d = d * 0.5
        rows = np.asarray(ids)
        out_ids = np.where(rows >= 0, self._ids_np[np.maximum(rows, 0)],
                           np.int64(-1))
        return d, out_ids


def _sharded_ivf_search(mesh, axis, q, centroids, vecs, ids, off, cnt, *,
                        k, nprobe, metric, max_segs, segment):

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def _run(q, c, xs, ii, off, cnt):
        xs, ii, off, cnt = xs[0], ii[0], off[0], cnt[0]   # drop shard dim
        B = q.shape[0]
        q_sq = jnp.sum(q * q, axis=1)
        cd = D.pairwise_distance(
            q, c, "sqeuclidean" if metric != "ip" else "ip")
        _, probes = TK.topk_smallest(cd, nprobe)          # [B, nprobe]
        x_sq = jnp.sum(xs * xs, axis=1)
        init = (jnp.full((B, k), TK.NEG_FILL, jnp.float32),
                jnp.full((B, k), -1, ii.dtype))

        def probe_step(carry, pcol):
            bv, bi = carry
            o = off[pcol]
            n_l = cnt[pcol]

            def seg_step(carry, s):
                bv, bi = carry
                start = o + s * segment
                rows = start[:, None] + jnp.arange(segment)[None, :]
                okr = rows < (o + n_l)[:, None]
                rs = jnp.clip(rows, 0, xs.shape[0] - 1)
                g = xs[rs]
                if metric == "ip":
                    dd = -jnp.einsum("bd,bsd->bs", q, g)
                else:
                    dd = jnp.maximum(
                        q_sq[:, None] + x_sq[rs]
                        - 2.0 * jnp.einsum("bd,bsd->bs", q, g), 0.0)
                dd = jnp.where(okr, dd, TK.NEG_FILL)
                cids = jnp.where(okr, ii[rs], -1)
                cv, cp = TK.topk_smallest(dd, min(k, segment))
                ci = jnp.take_along_axis(cids, cp, axis=1)
                return TK.merge_topk(bv, bi, cv, ci, k), None

            (bv, bi), _ = jax.lax.scan(seg_step, (bv, bi),
                                       jnp.arange(max_segs))
            return (bv, bi), None

        (lv, li), _ = jax.lax.scan(probe_step, init, probes.T)
        gd = jax.lax.all_gather(lv, axis)
        gi = jax.lax.all_gather(li, axis)
        s, b, kk = gd.shape
        gd = jnp.moveaxis(gd, 0, 1).reshape(b, s * kk)
        gi = jnp.moveaxis(gi, 0, 1).reshape(b, s * kk)
        negv, pos = jax.lax.top_k(-gd, k)
        return -negv, jnp.take_along_axis(gi, pos, axis=1)

    return _run(q, centroids, vecs, ids, off, cnt)
