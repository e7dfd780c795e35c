"""BERT-architecture encoder — bit-compatible with HF BertModel weights.

Reference: the GPU HF inference runtime (NeuronDB/src/gpu/cuda/
gpu_hf_kernels.cu — embedding/attention/layernorm/gelu kernels behind
hf_{embed,rerank} vtable entries) and the ONNX session runtime
(src/onnx/neurondb_hf.c). Round 1's from-scratch encoder
(ml/transformer.py) used pre-LN without biases and could not load real
checkpoints; this module matches HF `BertModel` exactly (post-LN,
q/k/v/o + FFN biases, token-type embeddings, embedding LayerNorm, CLS
pooler) so MiniLM-class weights exported by scripts/export_hf.py
produce real semantic embeddings. Parity is asserted against
transformers' BertModel in tests/test_bert.py (random-init — no
downloads needed).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def init_bert_params(key, *, vocab_size=30522, hidden=256, layers=4,
                     heads=4, ff=1024, max_len=512, type_vocab=2) -> Dict:
    ks = jax.random.split(key, 5 + layers)
    std = 0.02
    rnd = lambda k, shape: jax.random.normal(k, shape) * std  # noqa: E731
    p = {
        "tok_emb": rnd(ks[0], (vocab_size, hidden)),
        "pos_emb": rnd(ks[1], (max_len, hidden)),
        "type_emb": rnd(ks[2], (type_vocab, hidden)),
        "emb_ln": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
        "pooler": {"w": rnd(ks[3], (hidden, hidden)),
                   "b": jnp.zeros(hidden)},
        "cls_head": {"w": rnd(ks[4], (hidden, 1)), "b": jnp.zeros(1)},
        "layers": [],
    }
    for i in range(layers):
        k = jax.random.split(ks[5 + i], 6)
        p["layers"].append({
            "wq": rnd(k[0], (hidden, hidden)), "bq": jnp.zeros(hidden),
            "wk": rnd(k[1], (hidden, hidden)), "bk": jnp.zeros(hidden),
            "wv": rnd(k[2], (hidden, hidden)), "bv": jnp.zeros(hidden),
            "wo": rnd(k[3], (hidden, hidden)), "bo": jnp.zeros(hidden),
            "ln1": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
            "w1": rnd(k[4], (hidden, ff)), "b1": jnp.zeros(ff),
            "w2": rnd(k[5], (ff, hidden)), "b2": jnp.zeros(hidden),
            "ln2": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
        })
    return p


def _ln(x, g, b, eps=1e-12):           # HF BertLayerNorm eps
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


@functools.partial(jax.jit, static_argnames=("heads", "use_flash"))
def bert_encode(params: Dict, ids: jax.Array,
                type_ids: Optional[jax.Array] = None, *,
                heads: int = 4, use_flash: bool = False) -> Dict:
    """ids [B, S] (0 = pad) -> {'hidden', 'pooled' (CLS+tanh),
    'mean_pooled' (masked mean, sentence-transformers style), 'score'}."""
    B, S = ids.shape
    mask = ids > 0
    if type_ids is None:
        type_ids = jnp.zeros_like(ids)
    x = (params["tok_emb"][ids] + params["pos_emb"][None, :S, :]
         + params["type_emb"][type_ids])
    x = _ln(x, params["emb_ln"]["g"], params["emb_ln"]["b"])
    dh = x.shape[-1] // heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    neg = jnp.finfo(jnp.float32).min
    for lyr in params["layers"]:
        q = x @ lyr["wq"] + lyr["bq"]
        k = x @ lyr["wk"] + lyr["bk"]
        v = x @ lyr["wv"] + lyr["bv"]
        qh = q.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        if use_flash:
            from neurondb_tpu.ops.pallas.flash_attention import (
                flash_attention)
            o = flash_attention(qh, kh, vh, mask)
        else:
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask[:, None, None, :], s, neg)
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, vh,
                           preferred_element_type=jnp.float32)
        att = o.transpose(0, 2, 1, 3).reshape(B, S, heads * dh)
        x = _ln(x + att @ lyr["wo"] + lyr["bo"],
                lyr["ln1"]["g"], lyr["ln1"]["b"])
        ffn = jax.nn.gelu(x @ lyr["w1"] + lyr["b1"],
                          approximate=False) @ lyr["w2"] + lyr["b2"]
        x = _ln(x + ffn, lyr["ln2"]["g"], lyr["ln2"]["b"])
    w = mask[:, :, None].astype(x.dtype)
    mean_pooled = jnp.sum(x * w, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1.0)
    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"]
                      + params["pooler"]["b"])
    score = (pooled @ params["cls_head"]["w"]
             + params["cls_head"]["b"])[:, 0]
    return {"hidden": x, "pooled": pooled, "mean_pooled": mean_pooled,
            "score": score}


# --------------------------------------------------------------------------
# HF state-dict mapping (scripts/export_hf.py writes, this loads)
# --------------------------------------------------------------------------

_HF_MAP = {
    "embeddings.word_embeddings.weight": ("tok_emb", False),
    "embeddings.position_embeddings.weight": ("pos_emb", False),
    "embeddings.token_type_embeddings.weight": ("type_emb", False),
    "embeddings.LayerNorm.weight": ("emb_ln.g", False),
    "embeddings.LayerNorm.bias": ("emb_ln.b", False),
    "pooler.dense.weight": ("pooler.w", True),
    "pooler.dense.bias": ("pooler.b", False),
}

_HF_LAYER_MAP = {
    "attention.self.query.weight": ("wq", True),
    "attention.self.query.bias": ("bq", False),
    "attention.self.key.weight": ("wk", True),
    "attention.self.key.bias": ("bk", False),
    "attention.self.value.weight": ("wv", True),
    "attention.self.value.bias": ("bv", False),
    "attention.output.dense.weight": ("wo", True),
    "attention.output.dense.bias": ("bo", False),
    "attention.output.LayerNorm.weight": ("ln1.g", False),
    "attention.output.LayerNorm.bias": ("ln1.b", False),
    "intermediate.dense.weight": ("w1", True),
    "intermediate.dense.bias": ("b1", False),
    "output.dense.weight": ("w2", True),
    "output.dense.bias": ("b2", False),
    "output.LayerNorm.weight": ("ln2.g", False),
    "output.LayerNorm.bias": ("ln2.b", False),
}


def params_from_hf_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """Map an HF BertModel state dict (name -> array; torch Linear
    weights are [out, in] and get transposed) to our param pytree.
    Accepts keys with or without a leading 'bert.' prefix; the
    cross-encoder classifier head ('classifier.weight/bias') maps to
    cls_head when present."""
    flat: Dict[str, np.ndarray] = {}
    nlayers = 0
    for name, arr in state.items():
        if name.startswith("bert."):
            name = name[5:]
        a = np.asarray(arr)
        if name in _HF_MAP:
            tgt, transpose = _HF_MAP[name]
            flat[tgt] = a.T if transpose else a
        elif name.startswith("encoder.layer."):
            _, _, i, rest = name.split(".", 3)
            if rest in _HF_LAYER_MAP:
                tgt, transpose = _HF_LAYER_MAP[rest]
                flat[f"layers.{i}.{tgt}"] = a.T if transpose else a
                nlayers = max(nlayers, int(i) + 1)
        elif name == "classifier.weight":
            flat["cls_head.w"] = a.T
        elif name == "classifier.bias":
            flat["cls_head.b"] = a
    hidden = flat["tok_emb"].shape[1]
    p: Dict = {
        "tok_emb": jnp.asarray(flat["tok_emb"]),
        "pos_emb": jnp.asarray(flat["pos_emb"]),
        "type_emb": jnp.asarray(flat["type_emb"]),
        "emb_ln": {"g": jnp.asarray(flat["emb_ln.g"]),
                   "b": jnp.asarray(flat["emb_ln.b"])},
        "pooler": {"w": jnp.asarray(flat.get(
            "pooler.w", np.eye(hidden, dtype=np.float32))),
            "b": jnp.asarray(flat.get(
                "pooler.b", np.zeros(hidden, np.float32)))},
        "cls_head": {"w": jnp.asarray(flat.get(
            "cls_head.w", np.zeros((hidden, 1), np.float32))),
            "b": jnp.asarray(flat.get("cls_head.b",
                                      np.zeros(1, np.float32)))},
        "layers": [],
    }
    for i in range(nlayers):
        lyr = {}
        for tgt in ("wq bq wk bk wv bv wo bo w1 b1 w2 b2".split()):
            lyr[tgt] = jnp.asarray(flat[f"layers.{i}.{tgt}"])
        for ln in ("ln1", "ln2"):
            lyr[ln] = {"g": jnp.asarray(flat[f"layers.{i}.{ln}.g"]),
                       "b": jnp.asarray(flat[f"layers.{i}.{ln}.b"])}
        p["layers"].append(lyr)
    return p


def load_bert_npz(path: str) -> Dict:
    """Load params exported by scripts/export_hf.py (flat npz with the
    HF names, straight from the state dict)."""
    data = np.load(path)
    return params_from_hf_state_dict({k: data[k] for k in data.files})
