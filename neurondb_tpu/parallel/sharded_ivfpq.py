"""Sharded IVF-PQ: PQ-coded posting lists sharded across a device mesh.

Completes the DEEP-100M composition (BASELINE.json config #5): one chip
fits ~40M x 128-d rows as IVF-PQ with int8 rerank originals (6.72 GB
HBM, BASELINE.md r4 row); sharding that layout over N chips carries
100M+ rows with the same per-chip recipe. The reference reaches the
same scale by templating ANY ``%s_ann_index`` shard into its
distributed fan-out (NeuronDB/src/util/distributed.c:151-154) and
merging deterministically (distributed.c:320); here the fan-out is one
SPMD ``shard_map`` program and the merge is the same shard-major
hierarchical ``_merge_axis`` the flat / IVF / HNSW sharded indexes use.

Layout (mirrors ShardedIVFIndex's list-interleaved row sharding):

- coarse centroids + PQ codebooks train ONCE on a host-side sample and
  REPLICATE — they are small (nlists x D + n_sub x ksub x dsub) and
  every shard needs them for probe selection / ADC decode;
- each cluster's posting list is split ROUND-ROBIN across shards, so
  per-probe work is balanced no matter which lists a query probes;
- each shard stores its slice as cluster-contiguous uint8 codes
  [cap, n_sub], global row ids [cap], per-(shard, list) offsets/counts,
  and (default) int8 rerank originals + per-row scales — the exact
  single-chip IVFPQIndex recipe, one copy per shard.

Search is ONE shard_map: replicated queries -> coarse top-nprobe over
the replicated centroids -> per-shard ADC scan of the probed local list
slices (one-hot decode GEMM on the MXU, same identity as
index/ivfpq.py) -> per-shard exact rerank on local originals -> ICI
then DCN hierarchical top-k merge. Every global row lives on exactly
one shard, so the merged top-k never carries duplicates.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurondb_tpu.index.pq import pq_encode, train_pq_codebook
from neurondb_tpu.ml.kmeans import kmeans_fit, kmeans_predict
from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK
from neurondb_tpu.parallel.mesh import make_mesh
from neurondb_tpu.parallel.multihost import _merge_axis

shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
if shard_map is None:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore


def _sharded_ivfpq_search(mesh, axes: Tuple[str, ...], q, cents, books,
                          codes, gids, off, cnt, orig, orig_scale, *,
                          k: int, coarse_k: int, nprobe: int, metric: str,
                          max_segs: int, segment: int, rerank: bool,
                          has_scale: bool):
    """Replicated q -> per-shard ADC scan (+ local rerank) -> merge.

    Per-shard arrays carry a leading shard dim sharded over ``axes``;
    inside the shard_map each chip sees its own [1, ...] block. The
    scan tracks LOCAL slot positions so the rerank can gather the
    shard's own originals; global ids resolve just before the merge.
    """
    spec = P(axes)
    n_in = (P(), P(), P(), spec, spec, spec, spec)
    if rerank:
        n_in = n_in + ((spec, spec) if has_scale else (spec,))

    def _body(qq, c, cb, cs, gi, of, ct, *rr):
        cs, gi, of, ct = cs[0], gi[0], of[0], ct[0]       # drop shard dim
        B = qq.shape[0]
        cap = cs.shape[0]
        kl = min(coarse_k if rerank else k, cap)
        cd = D.pairwise_distance(
            qq, c, "sqeuclidean" if metric != "ip" else "ip")
        _, probes = TK.topk_smallest(cd, nprobe)          # [B, nprobe]
        dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
              else jnp.float32)
        init = (jnp.full((B, kl), TK.NEG_FILL, jnp.float32),
                jnp.full((B, kl), -1, jnp.int32))

        def probe_step(carry, pcol):                      # pcol [B]
            bv, bi = carry
            o = of[pcol]
            n_l = ct[pcol]
            cc = c[pcol]                                  # [B, D]
            if metric == "ip":
                qc_dot = jnp.einsum("bd,bd->b", qq, cc)
            else:
                qc = qq - cc                              # residual query
                qc_sq = jnp.sum(qc * qc, axis=1)

            def seg_step(carry, s):
                bv, bi = carry
                start = o + s * segment
                rows = start[:, None] + jnp.arange(segment)[None, :]
                okr = rows < (o + n_l)[:, None]
                rs = jnp.clip(rows, 0, cap - 1)           # local slots
                cseg = cs[rs]                             # [B, S, n_sub]
                # decode as one-hot MXU matmuls (index/ivfpq.py: 3x
                # over XLA's scalar-gather throughput)
                oh = jax.nn.one_hot(cseg.reshape(-1, cseg.shape[-1]),
                                    cb.shape[1], dtype=dt)
                dec = jnp.einsum("xjk,jkd->xjd", oh, cb.astype(dt),
                                 preferred_element_type=jnp.float32)
                dec = dec.reshape(B, segment, -1)         # [B, S, D]
                if metric == "ip":
                    dd = -(qc_dot[:, None]
                           + jnp.einsum("bd,bsd->bs", qq, dec,
                                        preferred_element_type=jnp.float32))
                else:
                    dots = jnp.einsum("bd,bsd->bs", qc, dec,
                                      preferred_element_type=jnp.float32)
                    dd = jnp.maximum(
                        qc_sq[:, None] + jnp.sum(dec * dec, axis=-1)
                        - 2.0 * dots, 0.0)
                cids = jnp.where(okr & (gi[rs] >= 0),
                                 rs.astype(jnp.int32), -1)
                dd = jnp.where(cids >= 0, dd, TK.NEG_FILL)
                cv, cp = TK.topk_smallest(dd, min(kl, segment))
                ci = jnp.take_along_axis(cids, cp, axis=1)
                return TK.merge_topk(bv, bi, cv, ci, kl), None

            (bv, bi), _ = jax.lax.scan(seg_step, (bv, bi),
                                       jnp.arange(max_segs))
            return (bv, bi), None

        (lv, li), _ = jax.lax.scan(probe_step, init, probes.T)

        if rerank:
            ro = rr[0][0]
            slot = jnp.maximum(li, 0)
            cq = ro[slot].astype(dt)                      # [B, C, D]
            dots = jnp.einsum("bd,bcd->bc", qq.astype(dt), cq,
                              preferred_element_type=jnp.float32)
            if has_scale:                                 # int8 + scales
                sc = rr[1][0][slot]                       # [B, C]
                dots = dots * sc
            if metric == "ip":
                dd = -dots
            else:
                csq = jnp.einsum("bcd,bcd->bc", cq, cq,
                                 preferred_element_type=jnp.float32)
                if has_scale:
                    csq = csq * (sc * sc)
                qsq = jnp.sum(qq * qq, axis=1)
                dd = jnp.maximum(qsq[:, None] + csq - 2.0 * dots, 0.0)
            dd = jnp.where(li >= 0, dd, TK.NEG_FILL)
            lv, pos = TK.topk_smallest(dd, min(k, kl))
            li = jnp.take_along_axis(li, pos, axis=-1)

        lgids = jnp.where(li >= 0, gi[jnp.maximum(li, 0)], -1)
        lv = jnp.where(lgids >= 0, lv, TK.NEG_FILL)
        out_d, out_i = lv[:, :k], lgids[:, :k]
        for ax in reversed(axes):                         # ICI, then DCN
            out_d, out_i = _merge_axis(out_d, out_i, k, ax)
        return out_d, out_i

    run = functools.partial(
        shard_map, mesh=mesh, in_specs=n_in, out_specs=(P(), P()),
        check_vma=False)(_body)
    args = (q, cents, books, codes, gids, off, cnt)
    if rerank:
        args = args + ((orig, orig_scale) if has_scale else (orig,))
    return run(*args)


class ShardedIVFPQIndex:
    """IVF-PQ posting lists sharded round-robin over a device mesh
    (1-D ``shard`` axis or 2-D ``(dcn, ici)``), with per-shard exact
    rerank on int8 (default) or bf16 originals.

    The 100M+ story in concrete numbers (r4 BASELINE measurements):
    one v5e chip holds 40M x 128-d as IVF-PQ(n_sub=16) + int8 originals
    in 6.72 GB HBM; this class replicates only centroids + codebooks
    (~a few MB) and shards everything else, so an 8-chip ICI pod
    carries 8 x 40M = 320M rows with per-chip HBM unchanged and one
    all_gather of [B, k] partials as the only cross-chip traffic.
    """

    def __init__(self, vectors, *, nlists: int = 100, n_sub: int = 16,
                 ksub: int = 256, mesh: Optional[Mesh] = None,
                 axes: Optional[Sequence[str]] = None, metric: str = "l2",
                 ids=None, seed: int = 0, sample_cap: int = 131072,
                 rerank: bool = True, orig_dtype: str = "int8"):
        self.mesh = mesh or make_mesh()
        self.axes = tuple(axes) if axes is not None else tuple(
            self.mesh.axis_names)
        self.metric = D.canonical_metric(metric)
        x = np.asarray(vectors, np.float32)
        self.n, self.dim = x.shape
        if self.dim % n_sub:
            raise ValueError(f"dim {self.dim} not divisible by n_sub "
                             f"{n_sub}")
        self.n_sub = n_sub
        self.ksub = min(ksub, max(self.n, 2))
        self.nlists = max(1, min(nlists, self.n))
        self.rerank = rerank
        self.orig_dtype = orig_dtype if rerank else None
        self._spherical = self.metric == "cosine"
        if self._spherical:
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        nsh = 1
        for a in self.axes:
            nsh *= self.mesh.shape[a]
        self.n_shards = nsh
        ids_np = np.asarray(ids if ids is not None else np.arange(self.n),
                            np.int64)
        self._ids_np = ids_np
        rng = np.random.default_rng(seed)

        # ---- replicated training: coarse quantizer + PQ codebooks ----
        sample = x if self.n <= sample_cap else \
            x[rng.choice(self.n, sample_cap, replace=False)]
        state = kmeans_fit(jnp.asarray(sample), self.nlists, seed=seed)
        self.centroids = np.asarray(state.centroids)
        labels = np.empty(self.n, np.int32)
        chunk = 1 << 20
        for s in range(0, self.n, chunk):
            e = min(s + chunk, self.n)
            labels[s:e] = np.asarray(
                kmeans_predict(state.centroids, jnp.asarray(x[s:e])))
        rs_sample = (sample - self.centroids[
            np.asarray(kmeans_predict(state.centroids,
                                      jnp.asarray(sample)))])
        self.codebooks = np.asarray(train_pq_codebook(
            jnp.asarray(rs_sample), n_sub=n_sub, ksub=self.ksub,
            seed=seed))

        # ---- list-interleaved round-robin shard layout (one stable
        # sort; same vectorized construction as ShardedIVFIndex) ----
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
        slot_in_pair = np.arange(self.n) - seg_start
        rows_src = order[order2]
        sh_i = shard_of[order2]
        li = lab_sorted[order2]
        pos = off[sh_i, li] + slot_in_pair
        self.max_list = int(cnt.max()) if self.n else 1

        # ---- per-shard stores: codes + global row ids (+ originals) --
        resid = x[rows_src] - self.centroids[li]
        codes_flat = np.empty((self.n, n_sub), np.uint8)
        for s in range(0, self.n, chunk):
            e = min(s + chunk, self.n)
            codes_flat[s:e] = np.asarray(pq_encode(
                jnp.asarray(self.codebooks), jnp.asarray(resid[s:e])))
        del resid
        codes = np.zeros((nsh, cap, n_sub), np.uint8)
        gids = np.full((nsh, cap), -1, np.int32)
        codes[sh_i, pos] = codes_flat
        gids[sh_i, pos] = rows_src

        put = lambda a: jax.device_put(
            jnp.asarray(a), NamedSharding(self.mesh, P(self.axes)))
        rep = lambda a: jax.device_put(
            jnp.asarray(a), NamedSharding(self.mesh, P()))
        self._codes = put(codes)
        self._gids = put(gids)
        self._off = put(off)
        self._cnt = put(cnt)
        self._cents = rep(self.centroids)
        self._books = rep(self.codebooks)
        self._orig = self._orig_scale = None
        if rerank:
            xs = x[rows_src]
            if orig_dtype == "int8":
                sc_flat = np.maximum(
                    np.abs(xs).max(axis=1), 1e-30).astype(np.float32) \
                    / 127.0
                oq = np.clip(np.rint(xs / sc_flat[:, None]),
                             -127, 127).astype(np.int8)
                orig = np.zeros((nsh, cap, self.dim), np.int8)
                scales = np.ones((nsh, cap), np.float32)
                orig[sh_i, pos] = oq
                scales[sh_i, pos] = sc_flat
                self._orig = put(orig)
                self._orig_scale = put(scales)
            else:
                orig = np.zeros((nsh, cap, self.dim), np.float32)
                orig[sh_i, pos] = xs
                ostore = jnp.asarray(orig)
                if jax.default_backend() == "tpu":
                    ostore = ostore.astype(jnp.bfloat16)
                self._orig = jax.device_put(
                    ostore, NamedSharding(self.mesh, P(self.axes)))

    def search(self, queries, k: int = 10, *, nprobe: int = 10,
               rerank_k: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        nb = q.shape[0]
        if self._spherical:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                               1e-30)
        npad = 1 << max((nb - 1).bit_length(), 3)
        if npad > nb:
            q = np.concatenate([q, np.repeat(q[-1:], npad - nb, axis=0)])
        qj = jax.device_put(jnp.asarray(q),
                            NamedSharding(self.mesh, P()))
        nprobe = min(nprobe, self.nlists)
        seg = 128
        max_segs = max(1, -(-self.max_list // seg))
        use_rr = self.rerank and self._orig is not None
        coarse_k = int(rerank_k or max(4 * k, 32)) if use_rr else k
        d, rows = _sharded_ivfpq_search(
            self.mesh, self.axes, qj, self._cents, self._books,
            self._codes, self._gids, self._off, self._cnt,
            self._orig, self._orig_scale,
            k=min(k, self.n), coarse_k=coarse_k, nprobe=nprobe,
            metric="ip" if self.metric == "ip" else "sqeuclidean",
            max_segs=max_segs, segment=seg, rerank=use_rr,
            has_scale=self._orig_scale is not None)
        d = np.asarray(d)[:nb]
        rows = np.asarray(rows)[:nb]
        if self.metric == "l2":
            d = np.sqrt(np.maximum(d, 0.0))
        elif self.metric == "cosine":
            d = d * 0.5
        ids = np.where(rows >= 0, self._ids_np[np.maximum(rows, 0)],
                       np.int64(-1))
        return d, ids

    def stats(self):
        code_bytes = self.n * self.n_sub
        orig_bytes = (self.n * (self.dim + 4) if self.orig_dtype == "int8"
                      else (self.n * self.dim * 2 if self.rerank else 0))
        return {"kind": "sharded_ivfpq", "n": self.n, "dim": self.dim,
                "shards": self.n_shards, "axes": list(self.axes),
                "nlists": self.nlists, "n_sub": self.n_sub,
                "metric": self.metric, "max_list": self.max_list,
                "bytes_per_shard": (code_bytes + orig_bytes)
                // max(self.n_shards, 1)}
