"""Transformer encoder — local embedding / cross-encoder inference runtime.

Reference: the GPU HF runtime (NeuronDB/src/gpu/cuda/gpu_hf_kernels.cu,
3189 LoC of embedding/attention/layernorm/gelu kernels behind the
hf_{embed,rerank,complete} vtable entries) and the ONNX session runtime
(src/onnx/neurondb_onnx.c). TPU equivalent: a compact BERT-style encoder
in jnp whose attention runs the Pallas flash kernel on TPU
(ops/pallas/flash_attention.py), with weight loading from .npz state
dicts (zero-egress environment: no hub downloads — load local exports).

Without pretrained weights the embedder falls back to a deterministic
hashed bag-of-words projection (`HashEmbedder`) so every pipeline
(embeddings, RAG, rerank) runs end-to-end offline.
"""

from __future__ import annotations

import functools
import math
import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.search.bm25 import tokenize


# --------------------------------------------------------------------------
# tokenizer (word-piece-free, hash-vocab)
# --------------------------------------------------------------------------

def _stable_token_hash(token: str) -> int:
    """FNV-1a over utf-8 — deterministic ACROSS PROCESSES. Python's
    builtin hash() is salted per process (PYTHONHASHSEED), which would
    make persisted embeddings irreproducible after a restart."""
    h = 1469598103934665603
    for b in token.encode("utf-8", "ignore"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


class HashTokenizer:
    """Deterministic token-id assignment by hashing (no vocab file).
    The reference's tokenizer loads HF vocab (neurondb_tokenizer.c);
    offline we hash tokens into a fixed id space, reserving 0=pad, 1=cls,
    2=sep."""

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size

    def _tid(self, token: str) -> int:
        return 3 + (_stable_token_hash(token) % (self.vocab_size - 3))

    def encode(self, text: str, max_len: int = 128) -> np.ndarray:
        toks = tokenize(text, stem=False, stopwords=False)[: max_len - 2]
        ids = [1] + [self._tid(t) for t in toks] + [2]
        out = np.zeros(max_len, np.int32)
        out[: len(ids)] = ids
        return out

    def encode_pair(self, a: str, b: str, max_len: int = 256) -> np.ndarray:
        ta = tokenize(a, stem=False, stopwords=False)
        tb = tokenize(b, stem=False, stopwords=False)
        ids = [1] + [self._tid(t) for t in ta] + [2]
        ids += [self._tid(t) for t in tb] + [2]
        ids = ids[:max_len]
        out = np.zeros(max_len, np.int32)
        out[: len(ids)] = ids
        return out


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def init_encoder_params(key, *, vocab_size=30522, hidden=256, layers=4,
                        heads=4, ff=1024, max_len=512) -> Dict:
    ks = jax.random.split(key, 4 + layers)
    std = 0.02
    p = {
        "tok_emb": jax.random.normal(ks[0], (vocab_size, hidden)) * std,
        "pos_emb": jax.random.normal(ks[1], (max_len, hidden)) * std,
        "ln_f": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
        "pooler": jax.random.normal(ks[2], (hidden, hidden)) * std,
        "cls_head": jax.random.normal(ks[3], (hidden, 1)) * std,
        "layers": [],
    }
    for i in range(layers):
        k = jax.random.split(ks[4 + i], 6)
        p["layers"].append({
            "wq": jax.random.normal(k[0], (hidden, hidden)) * std,
            "wk": jax.random.normal(k[1], (hidden, hidden)) * std,
            "wv": jax.random.normal(k[2], (hidden, hidden)) * std,
            "wo": jax.random.normal(k[3], (hidden, hidden)) * std,
            "w1": jax.random.normal(k[4], (hidden, ff)) * std,
            "w2": jax.random.normal(k[5], (ff, hidden)) * std,
            "ln1": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
            "ln2": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
        })
    return p


def _ln(x, g, b, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _attention(q, k, v, mask, *, heads: int, use_flash: bool):
    B, S, Hd = q.shape
    dh = Hd // heads
    qh = q.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
    if use_flash:
        from neurondb_tpu.ops.pallas.flash_attention import flash_attention
        o = flash_attention(qh, kh, vh, mask)
    else:
        from neurondb_tpu.ops.pallas.flash_attention import attention_reference
        o = attention_reference(qh, kh, vh, mask)
    return o.transpose(0, 2, 1, 3).reshape(B, S, Hd)


@functools.partial(jax.jit, static_argnames=("heads", "use_flash"))
def encode(params: Dict, ids: jax.Array, *, heads: int = 4,
           use_flash: bool = False) -> Dict:
    """ids [B, S] -> {'hidden' [B,S,H], 'pooled' [B,H], 'score' [B]}."""
    B, S = ids.shape
    mask = ids > 0
    x = params["tok_emb"][ids] + params["pos_emb"][None, :S, :]
    for lyr in params["layers"]:
        h = _ln(x, lyr["ln1"]["g"], lyr["ln1"]["b"])
        att = _attention(h @ lyr["wq"], h @ lyr["wk"], h @ lyr["wv"], mask,
                         heads=heads, use_flash=use_flash)
        x = x + att @ lyr["wo"]
        h = _ln(x, lyr["ln2"]["g"], lyr["ln2"]["b"])
        x = x + jax.nn.gelu(h @ lyr["w1"]) @ lyr["w2"]
    x = _ln(x, params["ln_f"]["g"], params["ln_f"]["b"])
    # masked mean pool + tanh pooler (sentence-transformers style)
    w = mask[:, :, None].astype(x.dtype)
    pooled = jnp.sum(x * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    pooled = jnp.tanh(pooled @ params["pooler"])
    score = (pooled @ params["cls_head"])[:, 0]
    return {"hidden": x, "pooled": pooled, "score": score}


class TextEmbedder:
    """Sentence embedder over the encoder (embed_text parity,
    src/ml/embeddings.c:332)."""

    def __init__(self, params: Optional[Dict] = None, *, dim: int = 256,
                 heads: int = 4, max_len: int = 128, seed: int = 0,
                 use_flash: Optional[bool] = None):
        if params is None:
            params = init_encoder_params(jax.random.PRNGKey(seed),
                                         hidden=dim)
        self.params = params
        self.heads = heads
        self.max_len = max_len
        self.tok = HashTokenizer(params["tok_emb"].shape[0])
        self.use_flash = (jax.default_backend() == "tpu"
                          if use_flash is None else use_flash)

    @property
    def dim(self) -> int:
        return self.params["tok_emb"].shape[1]

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        ids = np.stack([self.tok.encode(t, self.max_len) for t in texts])
        out = encode(self.params, jnp.asarray(ids), heads=self.heads,
                     use_flash=self.use_flash)
        emb = np.asarray(out["pooled"])
        return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12)


class CrossEncoder:
    """(query, doc) pair scorer — rerank_cross_encoder / rerank_flash
    backend (src/ml/reranking.c:92, ml_reranking_flash.c:64).

    Large doc lists are scored in ``batch``-sized sub-batches with the
    host tokenizer PIPELINED against the device encoder: each sub-batch
    is dispatched asynchronously (no value fetch), so tokenizing
    sub-batch i+1 overlaps encoding of sub-batch i, and only the final
    score fetch synchronizes. The r3 rerank profile measured the
    tokenizer at ~20% of end-to-end wall (BASELINE.md cross-encoder
    row); overlapping it folds that share into the device window. The
    tail sub-batch is padded to ``batch`` rows so every dispatch reuses
    one compiled shape (each new shape is a fresh tunnel compile)."""

    def __init__(self, params: Optional[Dict] = None, *, dim: int = 256,
                 heads: int = 4, max_len: int = 256, seed: int = 0,
                 use_flash: Optional[bool] = None, batch: int = 64):
        if params is None:
            params = init_encoder_params(jax.random.PRNGKey(seed),
                                         hidden=dim)
        self.params = params
        self.heads = heads
        self.max_len = max_len
        self.batch = batch
        self.tok = HashTokenizer(params["tok_emb"].shape[0])
        self.use_flash = (jax.default_backend() == "tpu"
                          if use_flash is None else use_flash)

    def __call__(self, query: str, docs: Sequence[str],
                 batch: Optional[int] = None) -> np.ndarray:
        bs = self.batch if batch is None else batch
        n = len(docs)
        if not bs or n <= bs:
            ids = np.stack([self.tok.encode_pair(query, d, self.max_len)
                            for d in docs])
            out = encode(self.params, jnp.asarray(ids), heads=self.heads,
                         use_flash=self.use_flash)
            return np.asarray(out["score"])
        outs = []
        for s in range(0, n, bs):
            chunk = list(docs[s: s + bs])
            if len(chunk) < bs:                 # pad tail: one jit shape
                chunk += [chunk[-1]] * (bs - len(chunk))
            ids = np.stack([self.tok.encode_pair(query, d, self.max_len)
                            for d in chunk])
            out = encode(self.params, jnp.asarray(ids), heads=self.heads,
                         use_flash=self.use_flash)
            outs.append(out["score"])           # async dispatch, no sync
        return np.concatenate([np.asarray(o) for o in outs])[:n]


class PretrainedEmbedder:
    """Sentence embedder over REAL exported weights (scripts/export_hf.py
    output dir: weights.npz + vocab.txt + config.json): WordPiece
    tokenization + HF-compatible BERT encoder + masked mean pooling +
    L2 norm (sentence-transformers semantics). The engine-side half of
    the reference's HF runtime (gpu_hf_kernels.cu / neurondb_hf.c)."""

    def __init__(self, weights_dir: str, *, max_len: int = 128,
                 use_flash: Optional[bool] = None):
        import json
        import os
        from neurondb_tpu.ml.bert import load_bert_npz
        from neurondb_tpu.ml.tokenizer import WordPieceTokenizer
        with open(os.path.join(weights_dir, "config.json")) as f:
            cfg = json.load(f)
        self.params = load_bert_npz(os.path.join(weights_dir,
                                                 "weights.npz"))
        self.tok = WordPieceTokenizer.from_file(
            os.path.join(weights_dir, "vocab.txt"),
            lowercase=cfg.get("lowercase", True))
        self.heads = int(cfg["heads"])
        self.max_len = min(max_len, int(cfg.get("max_len", 512)))
        self.use_flash = (jax.default_backend() == "tpu"
                          if use_flash is None else use_flash)

    @property
    def dim(self) -> int:
        return self.params["tok_emb"].shape[1]

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        from neurondb_tpu.ml.bert import bert_encode
        ids, types = self.tok.encode_batch(list(texts), self.max_len)
        out = bert_encode(self.params, jnp.asarray(ids),
                          jnp.asarray(types), heads=self.heads,
                          use_flash=self.use_flash)
        emb = np.asarray(out["mean_pooled"])
        return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12)


class PretrainedCrossEncoder:
    """(query, doc) scorer over exported sequence-classification
    weights (export_hf.py --cross-encoder)."""

    def __init__(self, weights_dir: str, *, max_len: int = 256,
                 use_flash: Optional[bool] = None, batch: int = 64):
        import json
        import os
        from neurondb_tpu.ml.bert import load_bert_npz
        from neurondb_tpu.ml.tokenizer import WordPieceTokenizer
        with open(os.path.join(weights_dir, "config.json")) as f:
            cfg = json.load(f)
        self.params = load_bert_npz(os.path.join(weights_dir,
                                                 "weights.npz"))
        self.tok = WordPieceTokenizer.from_file(
            os.path.join(weights_dir, "vocab.txt"),
            lowercase=cfg.get("lowercase", True))
        self.heads = int(cfg["heads"])
        self.max_len = min(max_len, int(cfg.get("max_len", 512)))
        self.batch = batch
        self.use_flash = (jax.default_backend() == "tpu"
                          if use_flash is None else use_flash)

    def __call__(self, query: str, docs: Sequence[str],
                 batch: Optional[int] = None) -> np.ndarray:
        """Tokenizer-pipelined like CrossEncoder.__call__: sub-batches
        dispatch asynchronously so WordPiece tokenization of sub-batch
        i+1 overlaps the device encode of sub-batch i (the tokenizer is
        ~20% of rerank wall — BASELINE.md cross-encoder row)."""
        from neurondb_tpu.ml.bert import bert_encode
        bs = self.batch if batch is None else batch
        n = len(docs)
        outs = []
        for s in range(0, n, bs or n):
            chunk = list(docs[s: s + (bs or n)])
            if bs and len(chunk) < bs and n > bs:  # pad tail: one shape
                chunk += [chunk[-1]] * (bs - len(chunk))
            enc = [self.tok.encode_pair(query, d, self.max_len)
                   for d in chunk]
            ids = np.stack([e[0] for e in enc])
            types = np.stack([e[1] for e in enc])
            out = bert_encode(self.params, jnp.asarray(ids),
                              jnp.asarray(types), heads=self.heads,
                              use_flash=self.use_flash)
            outs.append(out["score"])          # async dispatch, no sync
        return np.concatenate([np.asarray(o) for o in outs])[:n]


def default_embedder(*, dim: int = 256, seed: int = 0):
    """PretrainedEmbedder when NEURONDB_TPU_WEIGHTS points at an export
    dir; otherwise the deterministic offline TextEmbedder."""
    import os
    wdir = os.environ.get("NEURONDB_TPU_WEIGHTS")
    if wdir and os.path.isfile(os.path.join(wdir, "weights.npz")):
        return PretrainedEmbedder(wdir)
    return TextEmbedder(dim=dim, seed=seed)


def load_params_npz(path: str) -> Dict:
    """Load encoder params exported as flat npz (layer keys
    'layers.<i>.<name>'); the ONNX-export tooling counterpart."""
    data = np.load(path)
    p: Dict = {"layers": []}
    layer_keys: Dict[int, Dict] = {}
    for k in data.files:
        if k.startswith("layers."):
            _, i, rest = k.split(".", 2)
            layer_keys.setdefault(int(i), {})[rest] = jnp.asarray(data[k])
        elif "." in k:
            a, b = k.split(".", 1)
            p.setdefault(a, {})[b] = jnp.asarray(data[k])
        else:
            p[k] = jnp.asarray(data[k])
    for i in sorted(layer_keys):
        lyr = {}
        for kk, vv in layer_keys[i].items():
            if "." in kk:
                a, b = kk.split(".", 1)
                lyr.setdefault(a, {})[b] = vv
            else:
                lyr[kk] = vv
        p["layers"].append(lyr)
    return p
