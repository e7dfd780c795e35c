"""BM25 full-text scoring — the ts_rank/FTS half of hybrid search.

The reference leans on PostgreSQL's FTS (``ts_rank`` inside the SPI SQL
built by hybrid_search, NeuronDB/src/search/hybrid_search.c:200-220) and a
sparse inverted index AM for SPLADE/BM25 posting lists
(src/index/sparse_index.c:3-8). Standalone, we build our own inverted
index: a CSR postings table scored with Okapi BM25. Scoring is vectorized
numpy over postings (host) — term-at-a-time accumulation; the fused-with-
ANN path converts scores to device arrays for rank fusion.
"""

from __future__ import annotations

import functools
import math
import re
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_TOKEN = re.compile(r"[a-z0-9]+")

# Minimal English stopword set (parity with to_tsvector's simple config).
STOPWORDS = frozenset("""a an and are as at be by for from has he in is it its
of on that the to was were will with this these those i you your we they them
or not no but if then so do does did been being have had""".split())


def tokenize(text: str, *, stem: bool = True,
             stopwords: bool = True) -> List[str]:
    toks = _TOKEN.findall(text.lower())
    if stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    if stem:
        toks = [_light_stem(t) for t in toks]
    return toks


def _light_stem(t: str) -> str:
    """Cheap suffix stripper (stand-in for the snowball stemmer PG uses)."""
    for suf in ("ingly", "edly", "ing", "ies", "ied", "ers", "est",
                "ed", "es", "ly", "s"):
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            if suf == "ies" or suf == "ied":
                return t[: -3] + "y"
            return t[: -len(suf)]
    return t


def _get_bm25_device_fn():
    """Lazily-built jitted batch scorer, two-tier (round 3):

    - HEAVY terms (long posting lists, top-H by df) are densified at
      build time into ``W_dense [H, n_docs]`` and scored as a one-hot
      MXU GEMM ``counts[B, H] @ W_dense`` — TPU scatter measured ~18M
      updates/s on the scalar core, so a df~3k term cost ~85 ms per
      512-query batch under scatter but ~nothing as a GEMM row. Same
      reformulate-sparse-as-dense lesson as the PQ ADC one-hot decode.
    - LIGHT terms (short tails) keep the round-2 term-at-a-time
      scatter-add over CSR postings with build-time-precomputed
      per-posting weights (w = idf * tf * (k1+1) / (tf + k1 * len_norm)
      depends only on the (term, doc) pair).

    The host loop in ``scores`` stays as the exact oracle; heavy terms
    are exact here too (full posting list densified — the impact cap
    only ever truncates light terms)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit,
                       static_argnames=("n_docs", "seg", "max_segs",
                                        "seg_tiny"))
    def scores_device(heavy_idx, term_off, term_cnt, tiny_off, tiny_cnt,
                      post_doc, post_w, w_dense, *, n_docs: int, seg: int,
                      max_segs: int, seg_tiny: int):
        B, T = term_off.shape
        H = w_dense.shape[0]
        nnz = post_doc.shape[0]
        # heavy tier: occurrence counts -> one GEMM. f32 weights score
        # with HIGHEST precision (keeps the device path within the 1e-5
        # parity bar vs the host oracle); bf16 weights (the at-scale
        # tier — 2x H under the same byte budget) ride the MXU's native
        # bf16 path with an f32 accumulator. Counts are small integers,
        # exact in bf16, so the only error is the ~2^-8 relative weight
        # rounding — noise next to BM25 scores of 1-10.
        hcols = jnp.arange(H, dtype=jnp.int32)
        counts = (heavy_idx[:, :, None] == hcols[None, None, :]
                  ).astype(jnp.float32).sum(axis=1)          # [B, H]
        if w_dense.dtype == jnp.bfloat16:
            scores = jax.lax.dot_general(
                counts.astype(jnp.bfloat16), w_dense,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            scores = jax.lax.dot_general(
                counts, w_dense, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        rowb = jnp.arange(B, dtype=jnp.int32)[:, None]

        def make_term_step(width, msegs):
            col = jnp.arange(width, dtype=jnp.int32)[None, :]

            def term_step(sc, tcol):
                off, cnt = tcol                        # [B] each
                n_segs = jnp.minimum(
                    (jnp.max(cnt) + width - 1) // width, msegs)

                def seg_step(s, sc):
                    start = off + s * width
                    rows = start[:, None] + col        # [B, width]
                    ok = rows < (off + cnt)[:, None]
                    rs = jnp.clip(rows, 0, nnz - 1)
                    docs = jnp.where(ok, post_doc[rs], 0)
                    w = jnp.where(ok, post_w[rs], 0.0)
                    return sc.at[rowb, docs].add(w)

                return jax.lax.fori_loop(0, n_segs, seg_step, sc), None

            return term_step

        scores, _ = jax.lax.scan(make_term_step(seg, max_segs), scores,
                                 (term_off.T, term_cnt.T))
        # tiny tier: terms whose batch-max posting count fits one
        # seg_tiny-wide segment (rare/id-like tokens, df ~ 1-few). The
        # scatter's cost is B*width regardless of cnt, so a df=1 term in
        # the wide scan wastes 2047/2048 of its updates; the narrow scan
        # cuts that 8x (measured: the 1M-doc hybrid row's light tier is
        # mostly df=1 tokens once the heavy tier covers the high-df set)
        scores, _ = jax.lax.scan(make_term_step(seg_tiny, 1), scores,
                                 (tiny_off.T, tiny_cnt.T))
        return scores

    return scores_device


def _get_bm25_tiled_fn():
    """Tiled one-hot-GEMM posting scorer (round 5 — replaces the
    scalar-core scatter tier for mid/low-df terms; VERDICT r4 item 7).

    The mid-df wall: TPU scatter-add runs ~18M updates/s on the scalar
    core, so a term with df~3k cost ~60 ms per 512-query batch, and the
    only escape hatches were densifying into a 512 MB [H, n_docs] tier
    (stops scaling past ~1M docs) or truncating posting lists (seg_cap).
    This path reformulates the whole light tier as MXU work:

    - postings of all non-heavy scoreable terms are doc-sorted at build
      time and laid out [nsteps, G, Ppad] — G doc-tiles of T docs per
      scan step, each tile's postings padded to Ppad;
    - per batch, the union of the queries' light terms maps to S slots;
    - per tile: ``M = onehot(term==union)·w  @  onehot(dloc)`` builds
      the [S, T] posting-weight block ON THE MXU (segment-summed
      one-hot GEMM — same reformulate-sparse-as-dense identity as the
      PQ ADC decode), then ``tile_scores = qinc @ M`` scores every
      query against the tile. FLOPs = 2·S·T·nnz — independent of B —
      plus 2·B·S·n_docs for the second GEMM.

    EXACT for every covered term (no seg_cap truncation, no heavy_mb
    budget); f32 GEMMs below the bf16 threshold keep the 1e-5 host-
    oracle parity bar. Reference semantics: the ts_rank accumulation of
    NeuronDB/src/search/hybrid_search.c:200-220."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit,
                       static_argnames=("n_docs", "tile", "f32",
                                        "seg_tiny"))
    def scores_tiled(heavy_idx, qslots, union_terms, s_term, s_dloc,
                     s_w, tiny_off, tiny_cnt, tiny_doc, tiny_w, w_dense,
                     *, n_docs: int, tile: int, f32: bool,
                     seg_tiny: int):
        B = heavy_idx.shape[0]
        H = w_dense.shape[0]
        S = union_terms.shape[0]
        nsteps, G, P = s_term.shape
        dt = jnp.float32 if f32 else jnp.bfloat16
        prec = jax.lax.Precision.HIGHEST if f32 else None
        # at scale the [B, n_docs] score matrix ITSELF is the traffic
        # wall (2 GB f32 at B=512, 1M docs — the heavy GEMM's output
        # write alone measured 31.6 ms): below the bf16 threshold keep
        # f32 (host-oracle parity), above it accumulate bf16 (scores
        # are O(1-10); ~2^-8 relative rounding, same class as the bf16
        # heavy rows)
        hcols = jnp.arange(H, dtype=jnp.int32)
        counts = (heavy_idx[:, :, None] == hcols[None, None, :]
                  ).astype(jnp.float32).sum(axis=1)
        if w_dense.dtype == jnp.bfloat16:
            scores = jax.lax.dot_general(
                counts.astype(jnp.bfloat16), w_dense,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
        else:
            scores = jax.lax.dot_general(
                counts, w_dense, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        # per-query slot lists -> union-slot counts [B, S]
        scols = jnp.arange(S, dtype=jnp.int32)
        qinc = (qslots[:, :, None] == scols[None, None, :]
                ).astype(dt).sum(axis=1)
        tcol = jnp.arange(tile, dtype=jnp.int32)

        def step(_, inp):
            terms_g, dloc_g, w_g = inp             # [G, P] x3
            # [G, P, S] term one-hot with the posting weight folded in;
            # -1 padding never matches (union pads with -2)
            oh = (terms_g[:, :, None] == union_terms[None, None, :]
                  ).astype(dt) * w_g[:, :, None].astype(dt)
            ohd = (dloc_g[:, :, None] == tcol[None, None, :]).astype(dt)
            M = jnp.einsum("gps,gpt->gst", oh, ohd, precision=prec,
                           preferred_element_type=jnp.float32)
            ts = jnp.einsum("bs,gst->bgt", qinc, M.astype(dt),
                            precision=prec,
                            preferred_element_type=jnp.float32)
            # emitted as scan OUTPUT, not carried: a dynamic_update_slice
            # into a [B, n_docs] carry copied the WHOLE 2 GB carry every
            # step on TPU (measured 3.7 ms/step of pure copy at 1M docs)
            return None, ts.reshape(B, G * tile).astype(
                jnp.float32 if f32 else jnp.bfloat16)

        if nsteps:          # build ships (0, ...) when no mid postings
            _, ys = jax.lax.scan(step, None, (s_term, s_dloc, s_w))
            # [nsteps, B, G*tile] -> [B, nsteps*G*tile]: one transpose
            scores = (scores + jnp.moveaxis(ys, 0, 1).reshape(
                B, nsteps * G * tile).astype(scores.dtype))
        # tiny tier (df <= seg_tiny): per-query narrow scatter — these
        # terms are EXACT in one seg_tiny-wide segment, and keeping
        # them out of the union keeps S (hence the M-build FLOPs, which
        # scale as stream_nnz*S*tile) down to the mid-df terms only.
        # ALL tiny columns go through ONE batched scatter-add: every
        # separate scatter op on a [B, n_docs] operand rewrites the
        # whole 2 GB buffer on TPU (measured ~17 ms/op at 1M docs), so
        # a per-column loop — scan, fori, or unrolled — pays that per
        # column; one [B, TT*seg_tiny] scatter pays it once
        nnz_t = tiny_doc.shape[0]
        TT = tiny_off.shape[1]
        rowb = jnp.arange(B, dtype=jnp.int32)[:, None]
        col = jnp.arange(seg_tiny, dtype=jnp.int32)[None, None, :]
        rows = tiny_off[:, :, None] + col              # [B, TT, st]
        ok = rows < (tiny_off + tiny_cnt)[:, :, None]
        rs = jnp.clip(rows, 0, max(nnz_t - 1, 0)).reshape(
            B, TT * seg_tiny)
        okf = ok.reshape(B, TT * seg_tiny)
        docs = jnp.where(okf, tiny_doc[rs], 0)
        ww = jnp.where(okf, tiny_w[rs], 0.0)
        scores = scores.at[rowb, docs].add(ww.astype(scores.dtype))
        # w_dense columns are build-time padded to nsteps*G*tile
        return scores[:, :n_docs]

    return scores_tiled


class BM25Index:
    """Okapi BM25 inverted index over a document corpus.

    Large corpora build through the native C++ tokenizer + vectorized
    postings construction (neurondb_tpu.native); small corpora keep the
    richer Python tokenizer (stopwords + stemming).
    """

    NATIVE_THRESHOLD = 5000  # docs

    def __init__(self, docs: Sequence[str], *, k1: float = 1.2,
                 b: float = 0.75, ids: Optional[Sequence[int]] = None,
                 use_native: Optional[bool] = None,
                 prune_idf_below: float = 0.01):
        self.k1 = k1
        self.b = b
        # Terms in nearly every document have Robertson idf ~= 0 (df=N
        # gives log(0.5/(N+0.5)+1) ~ 1/(2N)) yet dominate posting-scan
        # cost: at 200k docs a df=N term alone is 391 device segments
        # per query (measured: 5.6 s of a 6.3 s hybrid batch). Skipping
        # terms with idf < prune_idf_below (df > ~98% of docs at the
        # default) bounds each posting's lost contribution by
        # idf*(k1+1) < 0.025 — noise next to typical scores of 1-10.
        # Applied identically in the host oracle and the device path.
        self.prune_idf_below = prune_idf_below
        self.term_cap = 64        # device-path scoring terms per query
        self.n_docs = len(docs)
        self.ids = np.asarray(ids if ids is not None else range(len(docs)),
                              np.int64)
        self._vocab: Dict[str, int] = {}
        self._hash_vocab: Optional[Dict[int, int]] = None
        if use_native is None:
            use_native = len(docs) >= self.NATIVE_THRESHOLD
        if use_native:
            from neurondb_tpu import native
            if native.available():
                self._build_native(docs)
                return
        self._build_python(docs)

    def _build_python(self, docs: Sequence[str]) -> None:
        doc_terms: List[Counter] = []
        lengths = np.zeros(len(docs), np.float32)
        for i, doc in enumerate(docs):
            toks = tokenize(doc)
            lengths[i] = len(toks)
            c = Counter(toks)
            doc_terms.append(c)
            for t in c:
                if t not in self._vocab:
                    self._vocab[t] = len(self._vocab)
        self.doc_len = lengths
        self.avg_len = float(lengths.mean()) if len(docs) else 0.0
        nv = len(self._vocab)
        # CSR postings: for each term, (doc_row, tf)
        counts = np.zeros(nv, np.int64)
        for c in doc_terms:
            for t in c:
                counts[self._vocab[t]] += 1
        self.df = counts.astype(np.float32)
        offsets = np.zeros(nv + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._post_doc = np.zeros(offsets[-1], np.int32)
        self._post_tf = np.zeros(offsets[-1], np.float32)
        cursor = offsets[:-1].copy()
        for i, c in enumerate(doc_terms):
            for t, tf in c.items():
                ti = self._vocab[t]
                self._post_doc[cursor[ti]] = i
                self._post_tf[cursor[ti]] = tf
                cursor[ti] += 1
        self._offsets = offsets
        self._finish_idf()

    def _build_native(self, docs: Sequence[str]) -> None:
        """Vectorized postings from the native (doc_id, hash) stream."""
        from neurondb_tpu import native
        doc_ids, hashes = native.tokenize_corpus(list(docs))
        self.doc_len = np.bincount(doc_ids, minlength=self.n_docs
                                   ).astype(np.float32)
        self.avg_len = float(self.doc_len.mean()) if self.n_docs else 0.0
        # unique (hash, doc) pairs -> term frequencies
        uniq_h, term_of = np.unique(hashes, return_inverse=True)
        self._hash_vocab = {int(h): i for i, h in enumerate(uniq_h)}
        key = term_of.astype(np.int64) * self.n_docs + doc_ids
        uk, tf = np.unique(key, return_counts=True)
        post_term = (uk // self.n_docs).astype(np.int64)
        self._post_doc = (uk % self.n_docs).astype(np.int32)
        self._post_tf = tf.astype(np.float32)
        nv = len(uniq_h)
        counts = np.bincount(post_term, minlength=nv)
        self.df = counts.astype(np.float32)
        offsets = np.zeros(nv + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._offsets = offsets   # post arrays already term-sorted by key
        self._finish_idf()

    def _finish_idf(self) -> None:
        self.idf = np.maximum(
            np.log((self.n_docs - self.df + 0.5) / (self.df + 0.5) + 1.0),
            0.0)

    def _term_index(self, token: str) -> Optional[int]:
        if self._hash_vocab is not None:
            from neurondb_tpu.native import _fnv1a
            import re as _re
            toks = _re.findall(r"[a-z0-9]+", token.lower())
            if not toks:
                return None
            return self._hash_vocab.get(_fnv1a(toks[0].encode()[:48]))
        return self._vocab.get(token)

    def scores(self, query: str) -> np.ndarray:
        """Dense [n_docs] BM25 scores (term-at-a-time accumulation)."""
        out = np.zeros(self.n_docs, np.float32)
        norm = 1.0 - self.b + self.b * self.doc_len / max(self.avg_len, 1e-9)
        if self._hash_vocab is not None:
            q_terms = _TOKEN.findall(query.lower())
        else:
            q_terms = tokenize(query)
        for t in q_terms:
            ti = self._term_index(t)
            if ti is None or self.idf[ti] < self.prune_idf_below:
                continue
            s, e = self._offsets[ti], self._offsets[ti + 1]
            rows = self._post_doc[s:e]
            tf = self._post_tf[s:e]
            out[rows] += self.idf[ti] * tf * (self.k1 + 1.0) / (
                tf + self.k1 * norm[rows])
        return out

    # ---- device batch scoring (round 2; impact-ordered round 3) ----
    #: segment budget per term on the device path. Postings are stored
    #: impact-ordered (weight-descending within each term), so clamping
    #: a term's scan to seg_cap segments keeps its seg_cap*seg
    #: HIGHEST-weight postings and drops only the low-impact tail. The
    #: idf floor alone still let df~0.99N terms through at ~100 device
    #: segments each (idf=0.01 binds only above df~0.985N); the cap
    #: bounds every term's cost. Dropped-posting error is bounded by the
    #: term's weight at the cut — by construction <= its seg_cap*seg-th
    #: largest weight. Host ``scores()`` stays the exact oracle.
    seg_cap = 16
    #: device-memory budget for the heavy-term dense tier
    #: ([H, n_docs]); H = min(heavy_rows_cap, budget // row_bytes).
    #: Below ``heavy_bf16_from`` docs the tier is f32 (bit-parity with
    #: the host oracle within 1e-5); at/above it the rows are stored
    #: bf16 — 2 B/doc instead of 4, so the same budget holds 2x the
    #: heavy terms and the GEMM
    #: runs the MXU's native bf16 path. Weight rounding is ~2^-8
    #: relative — noise next to typical BM25 scores of 1-10, and the
    #: light tier's seg_cap truncation is already the larger
    #: at-scale approximation.
    #: (512 MB bf16 = 256 rows at 1M docs; the marginal GEMM cost of a
    #: heavy row is ~1 ms of extra weight reads per 512-query batch,
    #: while the same term in the scatter tier costs ~60 ms per
    #: 2048-posting segment — densify every df >= n_docs/256 term the
    #: budget allows)
    heavy_mb = 512
    heavy_rows_cap = 512
    heavy_bf16_from = 500_000
    #: per-[B, n_docs]-operand HBM budget for batch scoring; the batch
    #: is split so b * n_docs * dtype_bytes stays under it (~3 such
    #: operands are live at once in the tiled assembly)
    score_budget_bytes = 2 << 30
    #: posting-count cut below which a light term routes to the narrow
    #: (seg_tiny-wide) scatter scan instead of the seg-wide one
    seg_tiny = 256

    #: doc-tile width of the tiled one-hot-GEMM scorer
    tile = 512
    #: cap on the per-batch union of light query terms (S slots); a
    #: batch with more DISTINCT light terms keeps the highest-idf ones
    #: (same drop rule as term_cap — the host oracle stays exact)
    union_cap = 2048

    def _scorer_mode(self) -> str:
        from neurondb_tpu.config import get_config
        return get_config().bm25_scorer

    def _ensure_device_tiled(self):
        """Device state for the tiled scorer: heavy dense rows (columns
        padded to the tile grid) + doc-sorted [nsteps, G, Ppad] posting
        tiles of every non-heavy scoreable term."""
        if getattr(self, "_dev_tiled", None) is not None:
            return self._dev_tiled
        import jax.numpy as jnp
        w, term_of, heavy, heavy_row_of, w_dense, use_bf16 = \
            self._heavy_state()
        nv = len(self.df)
        scoreable = self.idf >= self.prune_idf_below
        light = scoreable.copy()
        light[heavy] = False
        # tiny terms (df <= seg_tiny) stay on the narrow scatter: ONE
        # segment scores them exactly, and excluding them from the
        # union keeps S — and the M-build FLOPs, stream_nnz*S*tile —
        # proportional to the mid-df terms actually queried
        tiny = light & (self.df <= self.seg_tiny)
        mid = light & ~tiny
        keep = mid[term_of]
        s_term = term_of[keep].astype(np.int32)
        s_doc = self._post_doc[keep]
        s_w = w[keep].astype(np.float32)
        order = np.argsort(s_doc, kind="stable")
        s_term, s_doc, s_w = s_term[order], s_doc[order], s_w[order]
        # compacted CSR for the tiny tier (term-major, same order as
        # the global CSR so per-term slices stay contiguous)
        tkeep = tiny[term_of]
        tiny_doc = self._post_doc[tkeep].astype(np.int32)
        tiny_w = w[tkeep].astype(np.float32)
        tiny_cnt_per = np.where(tiny, np.diff(self._offsets), 0)
        tiny_off_per = np.zeros(nv + 1, np.int64)
        np.cumsum(tiny_cnt_per, out=tiny_off_per[1:])
        self._tiny_off_of = tiny_off_per[:-1]      # term -> compact off
        pad_t = (-len(tiny_doc)) % self.seg_tiny + self.seg_tiny
        T = self.tile
        ntiles = max(1, -(-self.n_docs // T))
        # group G tiles per scan step so step count stays ~128 (each
        # step is two batched GEMMs; thousands of tiny steps would be
        # loop-overhead-bound at multi-M corpora)
        G = max(1, -(-ntiles // 128))
        nsteps = -(-ntiles // G)
        ntiles_p = nsteps * G
        tcnt = np.bincount(s_doc // T, minlength=ntiles_p)
        if len(s_doc):
            Ppad = max(8, int(-(-int(tcnt.max()) // 8) * 8))
            term_l = np.full((ntiles_p, Ppad), -1, np.int32)
            dloc_l = np.zeros((ntiles_p, Ppad), np.int32)
            w_l = np.zeros((ntiles_p, Ppad), np.float32)
            tile_of = s_doc // T
            starts = np.zeros(ntiles_p + 1, np.int64)
            np.cumsum(tcnt, out=starts[1:])
            pos = np.arange(len(s_doc)) - starts[tile_of]
            term_l[tile_of, pos] = s_term
            dloc_l[tile_of, pos] = s_doc - tile_of * T
            w_l[tile_of, pos] = s_w
        else:
            # empty mid stream: nsteps=0 skips the scan at trace time
            Ppad, nsteps, ntiles_p = 8, 0, 0
            term_l = np.full((0, Ppad), -1, np.int32)
            dloc_l = np.zeros((0, Ppad), np.int32)
            w_l = np.zeros((0, Ppad), np.float32)
        # pad heavy rows to the tile grid so the scan's tile updates
        # never run past the score matrix
        Np = ntiles_p * T
        if w_dense.shape[1] < Np:
            w_dense = np.pad(w_dense, ((0, 0), (0, Np - w_dense.shape[1])))
        self._dev_tiled = {
            "w_dense": jnp.asarray(w_dense),
            "heavy_row_of": heavy_row_of,
            "tiny": tiny,
            "s_term": jnp.asarray(term_l.reshape(nsteps, G, Ppad)),
            "s_dloc": jnp.asarray(dloc_l.reshape(nsteps, G, Ppad)),
            "s_w": jnp.asarray(w_l.reshape(nsteps, G, Ppad)),
            "tiny_doc": jnp.asarray(np.pad(tiny_doc, (0, pad_t))),
            "tiny_w": jnp.asarray(np.pad(tiny_w, (0, pad_t))),
            "fn": _get_bm25_tiled_fn(),
            "tile": T,
            "f32": not use_bf16,
            "pad_factor": round(float(term_l.size / max(len(s_doc), 1)),
                                2),
        }
        return self._dev_tiled

    def _heavy_state(self):
        """Shared build step: per-posting weights + heavy-tier dense
        rows (host arrays; each scorer mode device-stages its own)."""
        import jax.numpy as jnp
        norm = 1.0 - self.b + self.b * self.doc_len / max(self.avg_len,
                                                          1e-9)
        tf = self._post_tf
        # per-posting weight: contribution of term t to doc d, exactly
        # the host formula in scores()
        term_of = np.repeat(np.arange(len(self.df)),
                            np.diff(self._offsets))
        w = (self.idf[term_of] * tf * (self.k1 + 1.0) / (
            tf + self.k1 * norm[self._post_doc])).astype(np.float32)
        # heavy tier: densify the top-H terms by df (these are the ones
        # whose posting scans dominate the scatter path) within the
        # memory budget; scoring them is then one MXU GEMM
        nv = len(self.df)
        scoreable = self.idf >= self.prune_idf_below
        df_min = max(32.0, self.n_docs / 256.0)
        cand = np.where(scoreable & (self.df >= df_min))[0]
        use_bf16 = self.n_docs >= self.heavy_bf16_from
        row_bytes = 2 if use_bf16 else 4
        h_budget = int(self.heavy_mb * 1e6
                       // max(row_bytes * self.n_docs, 1))
        H = int(min(len(cand), self.heavy_rows_cap, max(h_budget, 0)))
        heavy = cand[np.argsort(-self.df[cand], kind="stable")[:H]] \
            if H else np.empty(0, np.int64)
        heavy_row_of = np.full(nv, -1, np.int32)
        heavy_row_of[heavy] = np.arange(H, dtype=np.int32)
        w_dense = np.zeros((max(H, 1), self.n_docs), np.float32)
        for h, ti in enumerate(heavy):
            s, e = self._offsets[ti], self._offsets[ti + 1]
            w_dense[h, self._post_doc[s:e]] = w[s:e]
        if use_bf16:
            # cast host-side: halves both the one-time h2d transfer
            # (the tunnel is ~50 MB/s) and the resident HBM footprint
            import ml_dtypes
            w_dense = w_dense.astype(ml_dtypes.bfloat16)
        return w, term_of, heavy, heavy_row_of, w_dense, use_bf16

    def _ensure_device(self):
        """Device state for the legacy scatter scorer (config
        bm25_scorer="scatter"): heavy dense rows + impact-ordered CSR
        postings for the wide/narrow scatter tiers."""
        if getattr(self, "_dev", None) is not None:
            return self._dev
        import jax.numpy as jnp
        w, term_of, heavy, heavy_row_of, w_dense, _ = self._heavy_state()
        scoreable = self.idf >= self.prune_idf_below
        # impact order: weight-descending within each term (same CSR
        # offsets — the permutation never crosses term boundaries)
        perm = np.lexsort((-w, term_of))
        post_doc, w = self._post_doc[perm], w[perm]
        nnz = len(post_doc)
        seg = 2048
        pad = (-nnz) % seg + seg
        light = scoreable.copy()
        light[heavy] = False
        max_segs = max(1, -(-int(self.df[light].max()) // seg)) \
            if bool(light.any()) else 1
        self._dev = {
            "post_doc": jnp.asarray(np.pad(post_doc, (0, pad))),
            "post_w": jnp.asarray(np.pad(w, (0, pad))),
            "w_dense": jnp.asarray(w_dense),
            "heavy_row_of": heavy_row_of,
            "fn": _get_bm25_device_fn(),
            "seg": seg,
            "max_segs": min(max_segs, self.seg_cap),
        }
        return self._dev

    def _query_term_slices(self, query: str):
        if self._hash_vocab is not None:
            q_terms = _TOKEN.findall(query.lower())
        else:
            q_terms = tokenize(query)
        tis, offs, cnts, idfs = [], [], [], []
        for t in q_terms:
            ti = self._term_index(t)
            if ti is None or self.idf[ti] < self.prune_idf_below:
                continue
            tis.append(int(ti))
            offs.append(int(self._offsets[ti]))
            cnts.append(int(self._offsets[ti + 1] - self._offsets[ti]))
            idfs.append(float(self.idf[ti]))
        return tis, offs, cnts, idfs

    def scores_batch(self, queries: Sequence[str],
                     device: Optional[bool] = None,
                     return_device: bool = False) -> np.ndarray:
        """[B, n_docs] BM25 scores for a batch of queries. Device path:
        one jitted gather + scatter-add program over the CSR postings
        (weights precomputed at build). Falls back to the host loop for
        tiny batches/corpora. ``return_device=True`` keeps the [B, N]
        matrix ON DEVICE (a 512 x 200k f32 fetch is 400 MB — the thing
        that capped hybrid fusion at 11 QPS before device fusion)."""
        if device is None:
            device = self.n_docs >= 2048 and len(queries) > 1
        if not device:
            out = np.stack([self.scores(q) for q in queries])
            if return_device:
                import jax.numpy as jnp
                return jnp.asarray(out)
            return out
        # Sub-batch so no single [b, n_docs] operand exceeds ~2 GB: the
        # tiled path holds ~3 such operands live at once (scan-output
        # assembly, its transpose, the heavy-GEMM sum), and at 4M docs a
        # 512-query batch (3 x 4.1 GB bf16) exhausted the 16 GB chip.
        # 2 GB keeps the measured 1M-doc B=512 configuration unchanged.
        row_bytes = self.n_docs * (2 if self.n_docs >=
                                   self.heavy_bf16_from else 4)
        b_cap = self.score_budget_bytes // max(row_bytes, 1)
        b_cap = max(4, 1 << max(b_cap.bit_length() - 1, 0))
        if len(queries) > b_cap:
            import jax.numpy as jnp
            parts = [self.scores_batch(queries[s: s + b_cap],
                                       device=True,
                                       return_device=return_device)
                     for s in range(0, len(queries), b_cap)]
            return (jnp.concatenate(parts) if return_device
                    else np.concatenate(parts))
        if self._scorer_mode() == "tiled":
            return self._scores_batch_tiled(queries, return_device)
        import jax.numpy as jnp
        dev = self._ensure_device()
        hrow = dev["heavy_row_of"]
        H = dev["w_dense"].shape[0]
        B = len(queries)
        split = []                 # (heavy_rows, light_offs, light_cnts)
        for q in queries:
            tis, offs, cnts, idfs = self._query_term_slices(q)
            if len(tis) > self.term_cap:
                # keep the most informative terms (highest idf): the
                # dropped tail contributes least to the ranking; the
                # host oracle still scores everything — document-length
                # queries should use device=False if exactness matters
                order = np.argsort(idfs)[::-1][: self.term_cap]
                tis = [tis[i] for i in order]
                offs = [offs[i] for i in order]
                cnts = [cnts[i] for i in order]
            hv = [int(hrow[t]) for t in tis if hrow[t] >= 0]
            lo = [(o, c) for t, o, c in zip(tis, offs, cnts)
                  if hrow[t] < 0 and c > self.seg_tiny]
            ty = [(o, c) for t, o, c in zip(tis, offs, cnts)
                  if hrow[t] < 0 and c <= self.seg_tiny]
            split.append((hv, lo, ty))
        # bucket slot counts to powers of two (compile-shape stability)
        def bucket(nmax):
            b = 4
            while b < max(nmax, 1):
                b *= 2
            return min(b, self.term_cap)
        HT = bucket(max((len(h) for h, _, _ in split), default=1))
        T = bucket(max((len(l) for _, l, _ in split), default=1))
        TT = bucket(max((len(t) for _, _, t in split), default=1))
        hidx = np.full((B, HT), H, np.int32)   # H = "no term" sentinel
        off = np.zeros((B, T), np.int32)
        cnt = np.zeros((B, T), np.int32)
        toff = np.zeros((B, TT), np.int32)
        tcnt = np.zeros((B, TT), np.int32)
        for b, (hv, lo, ty) in enumerate(split):
            hidx[b, : min(len(hv), HT)] = hv[:HT]
            # align long posting lists across the batch: each scan
            # column's fori bound is the BATCH max count in that column,
            # so sorting every query's light terms count-descending
            # concentrates them in the same few columns instead of
            # making every column pay the batch-max price
            lo = sorted(lo[:T], key=lambda oc: -oc[1])
            for j, (o, c) in enumerate(lo):
                off[b, j] = o
                cnt[b, j] = c
            for j, (o, c) in enumerate(ty[:TT]):
                toff[b, j] = o
                tcnt[b, j] = c
        # pad B to a power of two (compile-shape stability)
        bpad = 1 << max((B - 1).bit_length(), 3)
        if bpad > B:
            hidx = np.pad(hidx, ((0, bpad - B), (0, 0)),
                          constant_values=H)
            off = np.pad(off, ((0, bpad - B), (0, 0)))
            cnt = np.pad(cnt, ((0, bpad - B), (0, 0)))
            toff = np.pad(toff, ((0, bpad - B), (0, 0)))
            tcnt = np.pad(tcnt, ((0, bpad - B), (0, 0)))
        out = dev["fn"](jnp.asarray(hidx), jnp.asarray(off),
                        jnp.asarray(cnt), jnp.asarray(toff),
                        jnp.asarray(tcnt), dev["post_doc"], dev["post_w"],
                        dev["w_dense"], n_docs=self.n_docs,
                        seg=dev["seg"], max_segs=dev["max_segs"],
                        seg_tiny=self.seg_tiny)
        if return_device:
            return out[:B]
        return np.asarray(out)[:B]

    def _scores_batch_tiled(self, queries: Sequence[str],
                            return_device: bool):
        """Batch scoring through the tiled one-hot-GEMM scorer: heavy
        terms ride the dense GEMM; every other scoreable term maps to a
        slot in the batch-wide union and is scored EXACTLY from the
        doc-tiled posting stream (no seg_cap truncation). Union
        overflow beyond ``union_cap`` keeps the highest-idf terms —
        the same drop rule as ``term_cap``."""
        import jax.numpy as jnp
        dev = self._ensure_device_tiled()
        hrow = dev["heavy_row_of"]
        H = dev["w_dense"].shape[0]
        B = len(queries)
        tiny_mask = dev["tiny"]
        per_q = []                # (heavy_rows, mid_terms, tiny (o, c))
        cand_idf: Dict[int, float] = {}
        for q in queries:
            tis, offs, cnts, idfs = self._query_term_slices(q)
            if len(tis) > self.term_cap:
                order = np.argsort(idfs)[::-1][: self.term_cap]
                tis = [tis[i] for i in order]
            hv = [int(hrow[t]) for t in tis if hrow[t] >= 0]
            lt = [t for t in tis if hrow[t] < 0 and not tiny_mask[t]]
            ty = [(int(self._tiny_off_of[t]),
                   int(self._offsets[t + 1] - self._offsets[t]))
                  for t in tis if hrow[t] < 0 and tiny_mask[t]]
            for t in lt:
                cand_idf[t] = float(self.idf[t])
            per_q.append((hv, lt, ty))
        union = sorted(cand_idf, key=lambda t: -cand_idf[t])
        union = union[: self.union_cap]
        slot_of = {t: i for i, t in enumerate(union)}

        def bucket(nmax, cap):
            b = 4
            while b < max(nmax, 1):
                b *= 2
            return min(b, cap)

        HT = bucket(max((len(h) for h, _, _ in per_q), default=1),
                    self.term_cap)
        LT = bucket(max((len(l) for _, l, _ in per_q), default=1),
                    self.term_cap)
        TT = bucket(max((len(t) for _, _, t in per_q), default=1),
                    self.term_cap)
        S = bucket(len(union), self.union_cap)
        hidx = np.full((B, HT), H, np.int32)     # H = "no term" sentinel
        qslots = np.full((B, LT), -1, np.int32)
        toff = np.zeros((B, TT), np.int32)
        tcnt = np.zeros((B, TT), np.int32)
        for b, (hv, lt, ty) in enumerate(per_q):
            hidx[b, : min(len(hv), HT)] = hv[:HT]
            sl = [slot_of[t] for t in lt if t in slot_of][:LT]
            qslots[b, : len(sl)] = sl
            for j, (o, c) in enumerate(ty[:TT]):
                toff[b, j] = o
                tcnt[b, j] = c
        union_arr = np.full(S, -2, np.int32)     # -2: never matches a
        union_arr[: len(union)] = union          # -1 posting pad
        bpad = 1 << max((B - 1).bit_length(), 3)
        if bpad > B:
            hidx = np.pad(hidx, ((0, bpad - B), (0, 0)),
                          constant_values=H)
            qslots = np.pad(qslots, ((0, bpad - B), (0, 0)),
                            constant_values=-1)
            toff = np.pad(toff, ((0, bpad - B), (0, 0)))
            tcnt = np.pad(tcnt, ((0, bpad - B), (0, 0)))
        out = dev["fn"](jnp.asarray(hidx), jnp.asarray(qslots),
                        jnp.asarray(union_arr), dev["s_term"],
                        dev["s_dloc"], dev["s_w"], jnp.asarray(toff),
                        jnp.asarray(tcnt), dev["tiny_doc"],
                        dev["tiny_w"], dev["w_dense"],
                        n_docs=self.n_docs, tile=dev["tile"],
                        f32=dev["f32"], seg_tiny=self.seg_tiny)
        if return_device:
            return out[:B]
        return np.asarray(out[:B].astype(jnp.float32))

    def search(self, query: str, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        s = self.scores(query)
        k = min(k, self.n_docs)
        rows = np.argpartition(-s, k - 1)[:k] if k < self.n_docs \
            else np.arange(self.n_docs)
        rows = rows[np.argsort(-s[rows], kind="stable")]
        return s[rows], self.ids[rows]
