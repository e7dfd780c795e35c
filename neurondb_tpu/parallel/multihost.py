"""Multi-host (DCN x ICI) sharding: the DEEP-100M topology.

SURVEY.md §5 "Distributed communication backend" and BASELINE.json
config #5: posting lists / flat stores sharded across chips with
shard_map, per-chip fused distance+top-k, partial-result merges over
the interconnect. This module adds the two-level topology the 1-D
layer (parallel/sharded.py) doesn't model:

- mesh axes ("dcn", "ici"): hosts x chips-per-host. Rows are sharded
  over BOTH axes (each chip holds N / (H*C) rows).
- **hierarchical merge**: per-chip top-k -> all_gather over "ici"
  (fast intra-pod interconnect) -> per-host top-k -> all_gather over
  "dcn" (slow cross-host network) -> final top-k. DCN carries only
  [B, k] floats+ids per host instead of per chip — C-fold less
  cross-host traffic than a flat merge.
- **streaming build**: DEEP-100M-class corpora don't fit one host's
  RAM; ``MultiHostIVFIndex.from_chunks`` trains the coarse quantizer
  on a bounded sample, then routes each ingest chunk to shards without
  ever materializing the full corpus.

Replaces the reference's SQL shard fan-out + in-process merge
(NeuronDB/src/util/distributed.c:53-180, merge_distributed_results
:320) with XLA collectives. Under a single controller (tests: 8
virtual CPU devices as 2x4) the mesh is built from jax.devices();
under real multi-host jax.distributed, the same code runs with
jax.make_array_from_process_local_data placing each host's shard.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK

shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
if shard_map is None:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

AXES = ("dcn", "ici")


def make_mesh_2d(n_hosts: Optional[int] = None,
                 chips_per_host: Optional[int] = None) -> Mesh:
    """(hosts, chips-per-host) mesh. Defaults: all devices as one host
    row unless ``n_hosts`` divides them."""
    devs = jax.devices()
    total = len(devs)
    if n_hosts is None:
        n_hosts = max(1, getattr(jax, "process_count", lambda: 1)())
    if chips_per_host is None:
        chips_per_host = total // n_hosts
    use = n_hosts * chips_per_host
    grid = np.asarray(devs[:use]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, AXES)


def _pad_rows(x: np.ndarray, mult: int, fill=0):
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, width, constant_values=fill)


def _merge_axis(ld, li, k: int, axis: str):
    """all_gather partial top-k over one mesh axis and re-select top-k.
    Deterministic: gather order is the fixed axis order; ties resolve to
    the lower gathered position (shard-major), mirroring
    merge_distributed_results' stable shard-major merge."""
    gd = jax.lax.all_gather(ld, axis)              # [S, B, kk]
    gi = jax.lax.all_gather(li, axis)
    s, b, kk = gd.shape
    gd = jnp.moveaxis(gd, 0, 1).reshape(b, s * kk)
    gi = jnp.moveaxis(gi, 0, 1).reshape(b, s * kk)
    k_out = min(k, s * kk)
    negv, pos = jax.lax.top_k(-gd, k_out)
    return -negv, jnp.take_along_axis(gi, pos, axis=1)


def knn_2d(mesh: Mesh, queries, base, ids, valid, k: int, *,
           metric: str = "l2"):
    """Exact k-NN over a base row-sharded across (dcn, ici); replicated
    (dists, ids) out. Hierarchical ICI-then-DCN merge."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(AXES), P(AXES), P(AXES)),
        out_specs=(P(), P()),
        check_vma=False)
    def _search(q, xs, ii, ok):
        ld, lrows = TK.chunked_knn(q, xs, k, metric=metric,
                                   chunk=min(xs.shape[0], 65536), valid=ok)
        kk = ld.shape[1]
        if kk < k:
            ld = jnp.pad(ld, ((0, 0), (0, k - kk)),
                         constant_values=TK.NEG_FILL)
            lrows = jnp.pad(lrows, ((0, 0), (0, k - kk)),
                            constant_values=-1)
        lids = jnp.where(lrows >= 0, ii[jnp.maximum(lrows, 0)], -1)
        hd, hi = _merge_axis(ld, lids, k, "ici")   # intra-host, fast
        return _merge_axis(hd, hi, k, "dcn")       # cross-host, [B,k] only

    return _search(queries, base, ids, valid)


class MultiHostFlatIndex:
    """Exact k-NN sharded over a (dcn, ici) mesh."""

    def __init__(self, vectors, *, mesh: Optional[Mesh] = None,
                 metric: str = "l2", ids=None):
        self.mesh = mesh or make_mesh_2d()
        self.metric = D.canonical_metric(metric)
        x = np.asarray(vectors, np.float32)
        self.n, self.dim = x.shape
        nsh = self.mesh.shape["dcn"] * self.mesh.shape["ici"]
        ids_np = np.asarray(ids if ids is not None else np.arange(self.n),
                            np.int64)
        put = lambda a, fill: jax.device_put(
            jnp.asarray(_pad_rows(a, nsh, fill)),
            NamedSharding(self.mesh, P(AXES)))
        self._base = put(x, 0)
        # device ids are int32 rows; int64 external ids map host-side
        self._rows = put(np.arange(self.n, dtype=np.int32), -1)
        self._valid = put(np.ones(self.n, bool), False)
        self._ids_np = ids_np

    def search(self, queries, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        d, rows = knn_2d(self.mesh, q, self._base, self._rows, self._valid,
                         min(k, self.n), metric=self.metric)
        d, rows = np.asarray(d), np.asarray(rows)
        ids = np.where(rows >= 0, self._ids_np[np.maximum(rows, 0)], -1)
        return d, ids


def kmeans_fit_2d(mesh: Mesh, x_sharded, nlists: int, *, iters: int = 25,
                  seed: int = 0, init=None):
    """Lloyd's over a (dcn, ici)-sharded sample: local GEMM-argmin,
    centroid update via psum over BOTH axes (sums/counts ride ICI within
    a host, then DCN once per iteration)."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(AXES), P()), out_specs=(P(), P()),
        check_vma=False)
    def _step(xs, c):
        x_sq = jnp.sum(xs * xs, axis=1)
        c_sq = jnp.sum(c * c, axis=1)
        dots = jnp.dot(xs, c.T, preferred_element_type=jnp.float32)
        d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * dots
        labels = jnp.argmin(d2, axis=1)
        best = jnp.maximum(jnp.min(d2, axis=1), 0.0)
        onehot = jax.nn.one_hot(labels, c.shape[0], dtype=jnp.float32)
        sums = jax.lax.psum(jax.lax.psum(
            jnp.dot(onehot.T, xs, preferred_element_type=jnp.float32),
            "ici"), "dcn")
        counts = jax.lax.psum(jax.lax.psum(jnp.sum(onehot, axis=0),
                                           "ici"), "dcn")
        inertia = jax.lax.psum(jax.lax.psum(jnp.sum(best), "ici"), "dcn")
        newc = jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts[:, None], 1.0), c)
        return newc, inertia

    n = int(x_sharded.shape[0])
    if init is None:
        # k-means++ seeding on a bounded host-side sample: random seeding
        # merges nearby true clusters and Lloyd's cannot split them
        rng = np.random.default_rng(seed)
        pick = rng.choice(n, size=min(n, max(nlists * 16, 4096)),
                          replace=False)
        smp = np.asarray(x_sharded[np.sort(pick)], np.float32)
        kc = min(nlists, len(smp))
        chosen = np.empty((kc, smp.shape[1]), np.float32)
        chosen[0] = smp[rng.integers(len(smp))]
        d2min = ((smp - chosen[0]) ** 2).sum(1)
        for i in range(1, kc):
            p = d2min / max(d2min.sum(), 1e-30)
            chosen[i] = smp[rng.choice(len(smp), p=p)]
            d2min = np.minimum(d2min, ((smp - chosen[i]) ** 2).sum(1))
        init = chosen
    c = jax.device_put(jnp.asarray(init, jnp.float32),
                       NamedSharding(mesh, P()))
    prev = np.inf
    for _ in range(iters):
        c, inertia = _step(x_sharded, c)
        cur = float(inertia)
        if prev - cur <= 1e-3 * max(prev, 1e-30):
            break
        prev = cur
    return c


class MultiHostIVFIndex:
    """IVF over a (dcn, ici) mesh with chunked ingest.

    Layout: every chip holds an interleaved slice of each posting list
    (round-robin by within-list rank over all H*C chips), so per-probe
    work is balanced; search merges ICI-then-DCN like knn_2d.

    Two build modes (``from_chunks``):
    - plain iterable: chunks are BUFFERED host-side for the layout pass
      (host peak ~= one corpus copy) — fine up to tens of millions;
    - zero-arg callable returning a fresh iterator per call (e.g.
      ``lambda: native.iter_vecs(path)``): TRUE streaming — the source
      is re-read once per shard and host peak is one shard's rows plus
      two [N] int32 arrays, which is what DEEP-100M-class corpora need.
    """

    def __init__(self, *, nlists: int, dim: int,
                 mesh: Optional[Mesh] = None, metric: str = "l2"):
        self.mesh = mesh or make_mesh_2d()
        self.metric = D.canonical_metric(metric)
        self.nlists = nlists
        self.dim = dim
        self.n = 0
        self.centroids = None
        self._pending = []            # host-side (vecs, labels, rows)
        self._ids_np = np.zeros((0,), np.int64)

    @classmethod
    def from_chunks(cls, chunks: Iterable[np.ndarray], *, nlists: int,
                    mesh: Optional[Mesh] = None, metric: str = "l2",
                    sample_cap: int = 200_000, seed: int = 0
                    ) -> "MultiHostIVFIndex":
        """Build from [n_i, D] chunks. Pass a zero-arg callable for the
        bounded-memory streaming path (see class docstring); a plain
        iterable is buffered host-side."""
        if callable(chunks):
            return cls._from_chunk_factory(
                chunks, nlists=nlists, mesh=mesh, metric=metric,
                sample_cap=sample_cap, seed=seed)
        chunks = iter(chunks)
        first = np.asarray(next(chunks), np.float32)
        self = cls(nlists=nlists, dim=first.shape[1], mesh=mesh,
                   metric=metric)
        rng = np.random.default_rng(seed)
        sample = [first[rng.choice(len(first),
                                   min(len(first), sample_cap // 2),
                                   replace=False)]] if len(first) else []
        buffered = [first]
        for ch in chunks:
            ch = np.asarray(ch, np.float32)
            buffered.append(ch)
            take = min(len(ch), max(1, sample_cap // 8))
            sample.append(ch[rng.choice(len(ch), take, replace=False)])
        smp = np.concatenate(sample)[:sample_cap]
        if self.metric == "cosine":
            smp = smp / np.maximum(
                np.linalg.norm(smp, axis=1, keepdims=True), 1e-30)
        nsh = self.mesh.shape["dcn"] * self.mesh.shape["ici"]
        smp_sh = jax.device_put(
            jnp.asarray(_pad_rows(smp, nsh)),
            NamedSharding(self.mesh, P(AXES)))
        self.centroids = np.asarray(
            kmeans_fit_2d(self.mesh, smp_sh, min(nlists, len(smp)),
                          seed=seed))
        for ch in buffered:
            self.add_chunk(ch)
        self.finalize()
        return self

    @classmethod
    def _from_chunk_factory(cls, factory, *, nlists: int, mesh, metric,
                            sample_cap: int, seed: int
                            ) -> "MultiHostIVFIndex":
        """Streaming build: pass 1 samples + trains the coarse
        quantizer; pass 2 assigns every chunk and records [N] labels +
        within-list ranks; pass 3 runs once per shard, filling only that
        shard's buffer and placing it on its device
        (jax.make_array_from_single_device_arrays) before moving on."""
        rng = np.random.default_rng(seed)
        # ---- pass 1: reservoir sample + train ----
        sample, dim = [], None
        for ch in factory():
            ch = np.asarray(ch, np.float32)
            dim = ch.shape[1]
            take = min(len(ch), max(1, sample_cap // 8))
            sample.append(ch[rng.choice(len(ch), take, replace=False)])
        self = cls(nlists=nlists, dim=dim, mesh=mesh, metric=metric)
        smp = np.concatenate(sample)[:sample_cap]
        if self.metric == "cosine":
            smp = smp / np.maximum(
                np.linalg.norm(smp, axis=1, keepdims=True), 1e-30)
        nsh = self.mesh.shape["dcn"] * self.mesh.shape["ici"]
        smp_sh = jax.device_put(
            jnp.asarray(_pad_rows(smp, nsh)),
            NamedSharding(self.mesh, P(AXES)))
        self.centroids = np.asarray(
            kmeans_fit_2d(self.mesh, smp_sh, min(nlists, len(smp)),
                          seed=seed))
        self.nlists = len(self.centroids)
        # ---- pass 2: labels + within-list ranks (O(N) int32 host) ----
        labels_parts, ranks_parts = [], []
        running = np.zeros(self.nlists, np.int64)
        n = 0
        for ch in factory():
            lab = self._assign_host(np.asarray(ch, np.float32))
            order = np.argsort(lab, kind="stable")
            ls = lab[order]
            starts = np.searchsorted(ls, np.arange(self.nlists))
            rank_sorted = np.arange(len(lab)) - starts[ls]
            rank = np.empty(len(lab), np.int64)
            rank[order] = rank_sorted + running[ls]
            running += np.bincount(lab, minlength=self.nlists)
            labels_parts.append(lab.astype(np.int32))
            ranks_parts.append(rank)
            n += len(lab)
        labels = np.concatenate(labels_parts)
        ranks = np.concatenate(ranks_parts)
        self.n = n
        self._ids_np = np.arange(n, dtype=np.int64)
        counts = running
        # per (shard, list) counts/offsets: shard s of list l holds the
        # ranks congruent to s mod nsh
        cnt = np.stack([(counts - s + nsh - 1) // nsh
                        for s in range(nsh)]).astype(np.int32)
        cnt = np.maximum(cnt, 0)
        off = np.zeros((nsh, self.nlists), np.int32)
        off[:, 1:] = np.cumsum(cnt[:, :-1], axis=1)
        cap = max(int(cnt.sum(axis=1).max()) if n else 1, 1)
        shard_of = (ranks % nsh).astype(np.int32)
        slot = off[shard_of, labels] + (ranks // nsh).astype(np.int32)
        # ---- pass 3: one shard at a time ----
        H, C = self.mesh.shape["dcn"], self.mesh.shape["ici"]
        devs = list(self.mesh.devices.flat)
        sh_vec = NamedSharding(self.mesh, P(AXES[0], AXES[1]))
        vec_arrs, id_arrs = [], []
        for s in range(nsh):
            xs = np.zeros((cap, self.dim), np.float32)
            ii = np.full(cap, -1, np.int32)
            row0 = 0
            for ch in factory():
                ch = np.asarray(ch, np.float32)
                if self.metric == "cosine":
                    ch = ch / np.maximum(
                        np.linalg.norm(ch, axis=1, keepdims=True), 1e-30)
                e = row0 + len(ch)
                mine = shard_of[row0:e] == s
                xs[slot[row0:e][mine]] = ch[mine]
                ii[slot[row0:e][mine]] = np.arange(row0, e)[mine]
                row0 = e
            vec_arrs.append(jax.device_put(
                xs.reshape(1, 1, cap, self.dim), devs[s]))
            id_arrs.append(jax.device_put(ii.reshape(1, 1, cap), devs[s]))
        self._vecs = jax.make_array_from_single_device_arrays(
            (H, C, cap, self.dim), sh_vec, vec_arrs)
        self._ids = jax.make_array_from_single_device_arrays(
            (H, C, cap), sh_vec, id_arrs)
        self._off = jax.device_put(
            jnp.asarray(off.reshape(H, C, self.nlists)), sh_vec)
        self._cnt = jax.device_put(
            jnp.asarray(cnt.reshape(H, C, self.nlists)), sh_vec)
        self._cj = jax.device_put(jnp.asarray(self.centroids),
                                  NamedSharding(self.mesh, P()))
        self.max_list = max(int(counts.max()) if n else 1, 1)
        return self

    def _assign_host(self, x: np.ndarray) -> np.ndarray:
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-30)
        cj = jnp.asarray(self.centroids)
        xj = jnp.asarray(x)
        d = (jnp.sum(xj * xj, 1)[:, None] + jnp.sum(cj * cj, 1)[None, :]
             - 2.0 * xj @ cj.T)
        return np.asarray(jnp.argmin(d, axis=1))

    def add_chunk(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float32)
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-30)
        cj = jnp.asarray(self.centroids)
        xj = jnp.asarray(x)
        d = (jnp.sum(xj * xj, 1)[:, None] + jnp.sum(cj * cj, 1)[None, :]
             - 2.0 * xj @ cj.T)
        labels = np.asarray(jnp.argmin(d, axis=1))
        rows = np.arange(self.n, self.n + len(x))
        self.n += len(x)
        self._pending.append((x, labels, rows))
        self._ids_np = np.concatenate(
            [self._ids_np, rows.astype(np.int64)])

    def finalize(self, ids=None) -> None:
        """Lay out all ingested chunks as per-chip interleaved CSR slices
        and place them on the mesh. Re-callable (e.g. to swap external
        ids) — the host copy of the layout inputs is kept."""
        if self._pending:
            x = np.concatenate([p[0] for p in self._pending])
            labels = np.concatenate([p[1] for p in self._pending])
            self._x_host, self._labels_host = x, labels
        else:
            x, labels = self._x_host, self._labels_host
        if ids is not None:
            self._ids_np = np.asarray(ids, np.int64)
        self._pending = []
        nsh = self.mesh.shape["dcn"] * self.mesh.shape["ici"]
        order = np.argsort(labels, kind="stable")
        lab_sorted = labels[order]
        starts = np.searchsorted(lab_sorted, np.arange(self.nlists))
        rank = np.arange(self.n) - starts[lab_sorted]
        shard_of = (rank % nsh).astype(np.int32)
        cnt = np.zeros((nsh, self.nlists), np.int32)
        np.add.at(cnt, (shard_of, lab_sorted), 1)
        off = np.zeros((nsh, self.nlists), np.int32)
        off[:, 1:] = np.cumsum(cnt[:, :-1], axis=1)
        cap = max(int(cnt.sum(axis=1).max()) if self.n else 1, 1)
        key = shard_of.astype(np.int64) * self.nlists + lab_sorted
        order2 = np.argsort(key, kind="stable")
        ks = key[order2]
        seg_start = np.searchsorted(ks, ks)
        slot = np.arange(self.n) - seg_start
        rows_src = order[order2]
        sh_i, li = shard_of[order2], lab_sorted[order2]
        pos = off[sh_i, li] + slot
        xs = np.zeros((nsh, cap, self.dim), np.float32)
        ii = np.full((nsh, cap), -1, np.int32)
        xs[sh_i, pos] = x[rows_src]
        ii[sh_i, pos] = rows_src
        self.max_list = max(int(cnt.max()) if self.n else 1, 1)
        H, C = self.mesh.shape["dcn"], self.mesh.shape["ici"]
        put = lambda a: jax.device_put(
            jnp.asarray(a.reshape((H, C) + a.shape[1:])),
            NamedSharding(self.mesh, P(AXES[0], AXES[1])))
        self._vecs = put(xs)
        self._ids = put(ii)
        self._off = put(off)
        self._cnt = put(cnt)
        self._cj = jax.device_put(jnp.asarray(self.centroids),
                                  NamedSharding(self.mesh, P()))

    def search(self, queries, k: int = 10, *, nprobe: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                               1e-30)
        qj = jax.device_put(jnp.asarray(q),
                            NamedSharding(self.mesh, P()))
        nprobe = min(nprobe, self.nlists)
        seg = 128
        max_segs = max(1, -(-self.max_list // seg))
        d, rows = _mh_ivf_search(
            self.mesh, qj, self._cj, self._vecs, self._ids, self._off,
            self._cnt, k=min(k, max(self.n, 1)), nprobe=nprobe,
            metric="ip" if self.metric == "ip" else "sqeuclidean",
            max_segs=max_segs, segment=seg)
        d, rows = np.asarray(d), np.asarray(rows)
        if self.metric == "l2":
            d = np.sqrt(np.maximum(d, 0.0))
        elif self.metric == "cosine":
            d = d * 0.5
        ids = np.where(rows >= 0, self._ids_np[np.maximum(rows, 0)],
                       np.int64(-1))
        return d, ids


def _mh_ivf_search(mesh, q, centroids, vecs, ids, off, cnt, *, k, nprobe,
                   metric, max_segs, segment):

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(*AXES), P(*AXES), P(*AXES), P(*AXES)),
        out_specs=(P(), P()),
        check_vma=False)
    def _run(q, c, xs, ii, off, cnt):
        xs, ii = xs[0, 0], ii[0, 0]
        off, cnt = off[0, 0], cnt[0, 0]
        B = q.shape[0]
        q_sq = jnp.sum(q * q, axis=1)
        cd = D.pairwise_distance(
            q, c, "sqeuclidean" if metric != "ip" else "ip")
        _, probes = TK.topk_smallest(cd, nprobe)
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
        hd, hi = _merge_axis(lv, li, k, "ici")
        return _merge_axis(hd, hi, k, "dcn")

    return _run(q, centroids, vecs, ids, off, cnt)
