"""GPT-2-architecture causal LM — HF GPT2LMHeadModel-weight compatible.

Rebuilds the reference's *local* completion runtime: NeuronDB routes
``ndb_llm_complete`` to the "huggingface-local" provider
(NeuronDB/src/llm/llm_router.c:66-95), whose GPU implementation is the
transformer inference kernels in
NeuronDB/src/gpu/cuda/gpu_hf_kernels.cu (embedding/attention/layernorm/
gelu behind the ``hf_complete`` vtable entry,
include/neurondb_gpu_backend.h hf_* rows). TPU-first design, not a
kernel-by-kernel translation:

- **Prefill** is one batched forward — every matmul is an [B*S, H] MXU
  GEMM, attention is causal softmax(QK^T)V with f32 accumulation.
- **Decode** is a single jitted ``lax.scan`` over a static-shape KV
  cache ``[B, heads, P, dh]`` per layer (dynamic_update_slice at the
  step position, mask-bounded attention) — one dispatch for the whole
  generation, no per-token host round-trips and no dynamic shapes.
- Sampling (greedy / temperature / top-k / top-p) runs on device inside
  the same scan; after an EOS is emitted a row keeps emitting EOS.

Weight parity: ``params_from_hf_state_dict`` maps GPT2LMHeadModel state
dicts (HF Conv1D stores [in, out] — loaded untransposed; lm_head is
tied to wte). Asserted against transformers' GPT2LMHeadModel on random
init in tests/test_gpt.py, the same zero-egress protocol as ml/bert.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = jnp.finfo(jnp.float32).min


def init_gpt_params(key, *, vocab_size=50257, hidden=768, layers=12,
                    heads=12, max_len=1024, ff: Optional[int] = None) -> Dict:
    ff = 4 * hidden if ff is None else ff
    ks = jax.random.split(key, 2 + layers)
    std = 0.02
    rnd = lambda k, shape: jax.random.normal(k, shape) * std  # noqa: E731
    p: Dict = {
        "wte": rnd(ks[0], (vocab_size, hidden)),
        "wpe": rnd(ks[1], (max_len, hidden)),
        "ln_f": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
        "blocks": [],
    }
    for i in range(layers):
        k = jax.random.split(ks[2 + i], 4)
        p["blocks"].append({
            "ln1": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
            "w_qkv": rnd(k[0], (hidden, 3 * hidden)),
            "b_qkv": jnp.zeros(3 * hidden),
            "w_o": rnd(k[1], (hidden, hidden)), "b_o": jnp.zeros(hidden),
            "ln2": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
            "w_fc": rnd(k[2], (hidden, ff)), "b_fc": jnp.zeros(ff),
            "w_pr": rnd(k[3], (ff, hidden)), "b_pr": jnp.zeros(hidden),
        })
    return p


def _mm(x, w):
    """Matmul against a plain weight array or an int8-quantized
    ``(codes int8 [in, out], scale f32 [out])`` pair.

    The quantized path is W8A8: activations are quantized per row
    (per-token max-abs scale) so the dot runs the MXU's native
    int8 x int8 -> int32 path and the weight matrix is read from HBM at
    1 byte/param — decode is weight-bandwidth-bound, so halving the
    bytes vs bf16 is the whole win. Dequant is a rank-1 rescale
    (row scale x column scale) fused into the epilogue by XLA."""
    if isinstance(w, tuple):
        wq, sw = w
        sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx.astype(jnp.float32), 1e-12)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * sw
    return x @ w


def _lm_head(x, params):
    lm = params.get("lm_head")
    if lm is not None:
        return _mm(x, lm)
    return x @ params["wte"].T                   # tied lm head


def quantize_gpt_params(params: Dict, *, lm_head: bool = True) -> Dict:
    """Symmetric per-output-channel int8 weight quantization for the
    serving decode path (W8A8 through ``_mm``). Block matmul weights
    (w_qkv/w_o/w_fc/w_pr) and — by default — a detached int8 copy of the
    tied lm head become ``(int8 codes, f32 scale)`` pairs; embeddings,
    biases, and layernorm params stay in their float dtype (gathers and
    vector adds are not bandwidth-relevant). GPT-2-small: 248 MB of
    bf16 matmul weights -> 124 MB, the dominant per-step HBM read."""
    def q(w):
        w = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return (wq, s)

    out = {k: v for k, v in params.items()}
    out["blocks"] = [
        {**blk, **{t: q(blk[t]) for t in ("w_qkv", "w_o", "w_fc", "w_pr")}}
        for blk in params["blocks"]]
    if lm_head:
        out["lm_head"] = q(params["wte"].T)
    return out


def _cache_dtype(params):
    """KV-cache storage dtype. At serving geometries the per-step KV
    read dwarfs the weight read (B=128, 12L, cache 256: 2.4 GB/step vs
    124 MB of int8 weights — measured 482 GB/s wall on v5e), so serving
    configs (bf16 or int8 weights) store the cache in bf16, halving the
    dominant HBM stream. f32 weights keep an f32 cache: the research
    path stays bit-exact vs the no-cache oracle."""
    w = params["blocks"][0]["w_qkv"]
    if isinstance(w, tuple) or w.dtype in (jnp.bfloat16, jnp.float16):
        return jnp.bfloat16
    return w.dtype


def _quant_kv(t):
    """Per-token-per-head symmetric int8 KV quantization: t [..., dh]
    f32/bf16 -> (codes int8 [..., dh], scales f32 [...]). At serving
    geometries the per-step KV read is the dominant HBM stream (B=128,
    cache 256: 1.21 GB/step vs 124 MB int8 weights), so storing the
    cache at 1 B/elem halves what bf16 already halved; the scales add
    1/dh overhead. Dequant is a rank-1 rescale XLA fuses into the
    attention dot's operand load."""
    t = t.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(t), axis=-1) / 127.0, 1e-12)
    codes = jnp.round(t / s[..., None]).astype(jnp.int8)
    return codes, s


def _dequant_kv(entry):
    if isinstance(entry, tuple):
        codes, s = entry
        return codes.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[..., None]
    return entry


def _cache_update(entry, t, pos):
    """Write one new token's [B, H, 1, dh] KV at sequence index ``pos``
    (traced) into a cache entry — array or (codes, scales) pair."""
    if isinstance(entry, tuple):
        codes, sc = entry
        tc, ts = _quant_kv(t)
        return (jax.lax.dynamic_update_slice(codes, tc, (0, 0, pos, 0)),
                jax.lax.dynamic_update_slice(sc, ts, (0, 0, pos)))
    return jax.lax.dynamic_update_slice(entry, t.astype(entry.dtype),
                                        (0, 0, pos, 0))


def _ln(x, g, b, eps=1e-5):                     # GPT-2 LayerNorm eps
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _gelu(x):                                   # HF "gelu_new" (tanh approx)
    return jax.nn.gelu(x, approximate=True)


def _split_heads(x, heads):
    B, S, H = x.shape
    return x.reshape(B, S, heads, H // heads).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("heads",))
def gpt_logits(params: Dict, ids: jax.Array, *, heads: int,
               lens: Optional[jax.Array] = None) -> jax.Array:
    """Full causal forward: ids [B, S] -> logits [B, S, V].

    ``lens`` marks LEFT-padded prompts: row b's valid tokens occupy
    positions [S - lens[b], S); pads are masked out of attention and
    position ids count valid tokens only (0..len-1), matching HF's
    attention_mask + derived position_ids convention."""
    B, S = ids.shape
    if lens is None:
        valid = jnp.ones((B, S), bool)
        pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    else:
        valid = jnp.arange(S)[None, :] >= (S - lens)[:, None]
        pos = jnp.clip(jnp.cumsum(valid, axis=1) - 1, 0)
    x = params["wte"][ids] + params["wpe"][pos]
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = causal[None, None] & valid[:, None, None, :]
    dh = x.shape[-1] // heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    for blk in params["blocks"]:
        h = _ln(x, blk["ln1"]["g"], blk["ln1"]["b"])
        qkv = _mm(h, blk["w_qkv"]) + blk["b_qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, _NEG)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, vh,
                       preferred_element_type=jnp.float32)
        att = o.transpose(0, 2, 1, 3).reshape(B, S, heads * dh)
        x = x + _mm(att, blk["w_o"]) + blk["b_o"]
        h = _ln(x, blk["ln2"]["g"], blk["ln2"]["b"])
        x = x + _mm(_gelu(_mm(h, blk["w_fc"]) + blk["b_fc"]),
                    blk["w_pr"]) + blk["b_pr"]
    x = _ln(x, params["ln_f"]["g"], params["ln_f"]["b"])
    return _lm_head(x, params)


# ---------------------------------------------------------------------------
# KV-cache decode
# ---------------------------------------------------------------------------

def _prefill(params, ids, lens, heads, cache_len, kv_int8=False):
    """Forward over the prompt, returning per-layer KV caches padded to
    ``cache_len`` and the last valid token's hidden logits. With
    ``kv_int8`` each cache entry is an ``(int8 codes, f32 scales)``
    pair from :func:`_quant_kv` instead of a bf16/f32 array."""
    B, S = ids.shape
    valid = jnp.arange(S)[None, :] >= (S - lens)[:, None]
    pos = jnp.clip(jnp.cumsum(valid, axis=1) - 1, 0)
    x = params["wte"][ids] + params["wpe"][pos]
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = causal[None, None] & valid[:, None, None, :]
    dh = x.shape[-1] // heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    ks, vs = [], []
    for blk in params["blocks"]:
        h = _ln(x, blk["ln1"]["g"], blk["ln1"]["b"])
        qkv = _mm(h, blk["w_qkv"]) + blk["b_qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = (_split_heads(t, heads) for t in (q, k, v))
        pad = ((0, 0), (0, 0), (0, cache_len - S), (0, 0))
        if kv_int8:
            ks.append(_quant_kv(jnp.pad(kh, pad)))
            vs.append(_quant_kv(jnp.pad(vh, pad)))
        else:
            cdt = _cache_dtype(params)
            ks.append(jnp.pad(kh, pad).astype(cdt))
            vs.append(jnp.pad(vh, pad).astype(cdt))
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, _NEG)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, vh,
                       preferred_element_type=jnp.float32)
        att = o.transpose(0, 2, 1, 3).reshape(B, S, heads * dh)
        x = x + _mm(att, blk["w_o"]) + blk["b_o"]
        h = _ln(x, blk["ln2"]["g"], blk["ln2"]["b"])
        x = x + _mm(_gelu(_mm(h, blk["w_fc"]) + blk["b_fc"]),
                    blk["w_pr"]) + blk["b_pr"]
    x = _ln(x, params["ln_f"]["g"], params["ln_f"]["b"])
    logits_last = _lm_head(x[:, -1], params)
    cache = {"k": ks, "v": vs}
    return logits_last, cache


def _decode_step(params, cache, token, step, S, lens, heads,
                 int8_dot=False):
    """One-token forward attending to the cache. ``step`` counts decoded
    tokens so the new KV lands at index S + step; key j is visible iff
    j >= S - len (prompt region, left-padded) or S <= j <= S + step.

    ``int8_dot`` (int8 caches only): both attention dots run on the
    MXU's int8 x int8 -> int32 path against the RAW cache codes — the
    r5 int8-KV A/B showed the per-step whole-cache dequant
    (O(B*H*P*dh) VPU work) eating the bandwidth win (finding 1). Here
    the per-token scales fold as rank-1 rescales on O(B*H*P) operands:
    scores = (q_codes @ k_codes) * (sq * k_scales); for the output dot
    the value scales fold INTO the attention weights before they are
    quantized (o_d = sum_k a_k*sv_k*v_codes[k,d]), so the only
    quantization added beyond the cache itself is the int8 rounding of
    q and of the softmax weights (~2^-7 relative each)."""
    B = token.shape[0]
    pos = lens + step                               # per-row position id
    x = params["wte"][token] + params["wpe"][pos]   # [B, H]
    H = x.shape[-1]
    dh = H // heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    e0 = cache["k"][0]
    P = (e0[0] if isinstance(e0, tuple) else e0).shape[2]
    j = jnp.arange(P)
    visible = ((j[None, :] >= (S - lens)[:, None]) & (j[None, :] <= S + step))
    new_k, new_v = [], []
    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln1"]["g"], blk["ln1"]["b"])
        qkv = _mm(h, blk["w_qkv"]) + blk["b_qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(B, heads, dh)
        kh = k.reshape(B, heads, 1, dh)
        vh = v.reshape(B, heads, 1, dh)
        ck = _cache_update(cache["k"][li], kh, S + step)
        cv = _cache_update(cache["v"][li], vh, S + step)
        new_k.append(ck)
        new_v.append(cv)
        if int8_dot and isinstance(ck, tuple):
            kc, ksc = ck                     # [B,H,P,dh] i8, [B,H,P] f32
            sq = jnp.maximum(jnp.max(jnp.abs(qh), axis=-1) / 127.0,
                             1e-12)          # [B,H]
            qq = jnp.round(qh / sq[..., None]).astype(jnp.int8)
            si = jnp.einsum("bhd,bhkd->bhk", qq, kc,
                            preferred_element_type=jnp.int32)
            s = si.astype(jnp.float32) * (sq[..., None] * ksc) * scale
        else:
            s = jnp.einsum("bhd,bhkd->bhk", qh, _dequant_kv(ck),
                           preferred_element_type=jnp.float32) * scale
        s = jnp.where(visible[:, None, :], s, _NEG)
        a = jax.nn.softmax(s, axis=-1)
        if int8_dot and isinstance(cv, tuple):
            vc, vsc = cv
            aw = a * vsc                     # value scales fold here
            sa = jnp.maximum(jnp.max(jnp.abs(aw), axis=-1) / 127.0,
                             1e-12)          # [B,H]
            aq = jnp.round(aw / sa[..., None]).astype(jnp.int8)
            oi = jnp.einsum("bhk,bhkd->bhd", aq, vc,
                            preferred_element_type=jnp.int32)
            o = oi.astype(jnp.float32) * sa[..., None]
        else:
            o = jnp.einsum("bhk,bhkd->bhd", a, _dequant_kv(cv),
                           preferred_element_type=jnp.float32)
        att = o.reshape(B, H)
        x = x + _mm(att, blk["w_o"]) + blk["b_o"]
        h = _ln(x, blk["ln2"]["g"], blk["ln2"]["b"])
        x = x + _mm(_gelu(_mm(h, blk["w_fc"]) + blk["b_fc"]),
                    blk["w_pr"]) + blk["b_pr"]
    x = _ln(x, params["ln_f"]["g"], params["ln_f"]["b"])
    logits = _lm_head(x, params)
    return logits, {"k": new_k, "v": new_v}


def _sample(logits, key, temperature, top_k, top_p, do_sample):
    """``do_sample`` and ``top_k`` are static, so the sampling structure
    compiles away: greedy decode never touches a sort, and with top_k
    set the top-p mask + categorical run in the K-wide top-k space
    (lax.top_k returns it sorted) instead of over the full vocab —
    the [B, V] per-step sort was the decode bottleneck at V=50k.
    top_p in (0, 1) keeps the smallest sorted prefix whose mass reaches
    p (always >= 1 token)."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temperature, 1e-6)
    if top_k:
        vals, idxs = jax.lax.top_k(logits, top_k)   # sorted desc
        lg = vals / t
        pr = jax.nn.softmax(lg, axis=-1)
        cum = jnp.cumsum(pr, axis=-1)
        keep = (cum - pr) < top_p                   # first token always kept
        lg = jnp.where(keep, lg, _NEG)
        choice = jax.random.categorical(key, lg, axis=-1)
        return jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]
    lg = logits / t
    srt = jnp.sort(lg, axis=-1)[..., ::-1]
    pr = jax.nn.softmax(srt, axis=-1)
    cum = jnp.cumsum(pr, axis=-1)
    keep = (cum - pr) < top_p
    cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
    lg = jnp.where(lg < cutoff, _NEG, lg)
    return jax.random.categorical(key, lg, axis=-1)


def generate_ids(params: Dict, ids, lens, key, *, heads: int, max_new: int,
                 cache_len: int, temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, eos_id: int = -1,
                 kv_int8: bool = False,
                 int8_dot: bool = False) -> Tuple[jax.Array, jax.Array]:
    """ids [B, S] LEFT-padded prompts (lens [B] valid suffix lengths) ->
    (tokens [B, max_new], n_valid [B]). One prefill + one lax.scan; rows
    that emit ``eos_id`` keep emitting it (n_valid counts through the
    first eos). The sampling structure is specialized at trace time:
    temperature <= 0 compiles a pure-argmax decode. ``kv_int8`` stores
    the KV cache as (int8 codes, per-token f32 scales) — the serving
    option when the per-step KV read dominates HBM traffic. ``int8_dot``
    (implies the int8 cache) additionally runs both attention dots on
    the MXU int8 path against the raw codes — see _decode_step."""
    return _generate_ids(params, jnp.asarray(ids), jnp.asarray(lens), key,
                         heads=heads, max_new=max_new, cache_len=cache_len,
                         temperature=float(temperature), top_k=top_k,
                         top_p=top_p, eos_id=eos_id,
                         do_sample=float(temperature) > 0.0,
                         kv_int8=bool(kv_int8) or bool(int8_dot),
                         int8_dot=bool(int8_dot))


@functools.partial(jax.jit, static_argnames=("heads", "max_new", "top_k",
                                             "cache_len", "eos_id",
                                             "do_sample", "kv_int8",
                                             "int8_dot"))
def _generate_ids(params: Dict, ids: jax.Array, lens: jax.Array,
                  key: jax.Array, *, heads: int, max_new: int,
                  cache_len: int, temperature: float, top_k: int,
                  top_p: float, eos_id: int, do_sample: bool,
                  kv_int8: bool = False,
                  int8_dot: bool = False) -> Tuple[jax.Array, jax.Array]:
    B, S = ids.shape
    logits0, cache = _prefill(params, ids, lens, heads, cache_len,
                              kv_int8=kv_int8)
    temperature = jnp.float32(temperature)
    top_p = jnp.float32(top_p)

    def step(carry, k_step):
        logits, cache, done, i = carry
        tok = _sample(logits, k_step, temperature, top_k, top_p, do_sample)
        tok = jnp.where(done, eos_id, tok)
        done = done | (tok == eos_id)
        logits, cache = _decode_step(params, cache, tok, i, S, lens,
                                     heads, int8_dot=int8_dot)
        return (logits, cache, done, i + 1), tok

    keys = jax.random.split(key, max_new)
    done0 = jnp.zeros(B, bool)
    (_, _, _, _), toks = jax.lax.scan(
        step, (logits0, cache, done0, jnp.int32(0)), keys)
    toks = toks.T                                   # [B, max_new]
    before_eos = jnp.cumsum((toks == eos_id).astype(jnp.int32), axis=1) \
        <= (1 if eos_id >= 0 else 0)
    n_valid = jnp.sum(before_eos, axis=1) if eos_id >= 0 \
        else jnp.full(B, max_new)
    return toks, n_valid


# ---------------------------------------------------------------------------
# HF weight mapping (GPT2LMHeadModel / GPT2Model state dicts)
# ---------------------------------------------------------------------------

def params_from_hf_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """HF Conv1D weights are stored [in, out] — loaded untransposed;
    ``lm_head.weight`` is tied to wte and skipped; the causal-mask
    buffers (attn.bias / attn.masked_bias) are dropped."""
    flat: Dict[str, np.ndarray] = {}
    nblk = 0
    for name, arr in state.items():
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "lm_head.weight":   # tied to wte
            continue                   # (mask buffers drop via the key map)
        a = np.asarray(arr)
        if name in ("wte.weight", "wpe.weight"):
            flat[name.split(".")[0]] = a
        elif name.startswith("ln_f."):
            flat["ln_f." + ("g" if name.endswith("weight") else "b")] = a
        elif name.startswith("h."):
            _, i, rest = name.split(".", 2)
            nblk = max(nblk, int(i) + 1)
            key = {
                "ln_1.weight": "ln1.g", "ln_1.bias": "ln1.b",
                "ln_2.weight": "ln2.g", "ln_2.bias": "ln2.b",
                "attn.c_attn.weight": "w_qkv", "attn.c_attn.bias": "b_qkv",
                "attn.c_proj.weight": "w_o", "attn.c_proj.bias": "b_o",
                "mlp.c_fc.weight": "w_fc", "mlp.c_fc.bias": "b_fc",
                "mlp.c_proj.weight": "w_pr", "mlp.c_proj.bias": "b_pr",
            }.get(rest)
            if key is not None:
                flat[f"h.{i}.{key}"] = a
    p: Dict = {
        "wte": jnp.asarray(flat["wte"]),
        "wpe": jnp.asarray(flat["wpe"]),
        "ln_f": {"g": jnp.asarray(flat["ln_f.g"]),
                 "b": jnp.asarray(flat["ln_f.b"])},
        "blocks": [],
    }
    for i in range(nblk):
        blk = {}
        for t in ("w_qkv b_qkv w_o b_o w_fc b_fc w_pr b_pr".split()):
            blk[t] = jnp.asarray(flat[f"h.{i}.{t}"])
        for ln in ("ln1", "ln2"):
            blk[ln] = {"g": jnp.asarray(flat[f"h.{i}.{ln}.g"]),
                       "b": jnp.asarray(flat[f"h.{i}.{ln}.b"])}
        p["blocks"].append(blk)
    return p


def load_gpt_npz(path: str) -> Dict:
    data = np.load(path)
    return params_from_hf_state_dict({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# service-facing wrapper
# ---------------------------------------------------------------------------

def _pow2_at_least(n: int, floor: int = 64) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class GPT2LM:
    """Tokenizer + params + jitted generate, the local ``complete``
    engine. ``from_dir`` loads a scripts/export_hf.py --gpt export
    (weights.npz + vocab.json + merges.txt + config.json)."""

    def __init__(self, params: Dict, tokenizer, heads: int,
                 eos_id: Optional[int] = None,
                 dtype: Optional[str] = None,
                 kv_dtype: Optional[str] = None):
        if kv_dtype not in (None, "auto", "int8"):
            raise ValueError(f"kv_dtype must be None/'auto'/'int8', "
                             f"got {kv_dtype!r}")
        # int8 KV cache: opt-in serving mode (per-token quantization of
        # the dominant HBM stream); None keeps bf16 (serving dtypes) or
        # f32 (research path) via _cache_dtype. "auto" picks per call:
        # the r5 same-slot A/B measured int8 KV 1.32x at B=128 but a
        # LOSS below B~64 (the per-step whole-cache dequant turns the
        # attention loop VPU-bound — IMPLEMENTATION_NOTES r5 finding 1),
        # so auto routes batches >= 64 to int8 and smaller ones to bf16.
        self.kv_int8 = kv_dtype == "int8"
        self.kv_auto = kv_dtype == "auto"
        if dtype == "int8":
            # W8A8 serving mode: matmul weights quantized per output
            # channel (quantize_gpt_params); embeddings/biases/ln stay
            # float. Decode is weight-bandwidth-bound, so 1 B/param on
            # the dominant reads is the point.
            params = quantize_gpt_params(params)
        elif dtype is not None:
            dt = jnp.dtype(dtype)
            params = jax.tree.map(
                lambda a: a.astype(dt) if hasattr(a, "dtype")
                and a.dtype == jnp.float32 else a, params)
        self.params = params
        self.tok = tokenizer
        self.heads = heads
        self.eos_id = tokenizer.eos_id if eos_id is None else eos_id
        self.max_len = int(params["wpe"].shape[0])

    @classmethod
    def from_dir(cls, path: str, dtype: Optional[str] = "bfloat16",
                 kv_dtype: Optional[str] = None) -> "GPT2LM":
        """``dtype="bfloat16"`` (default) halves weight HBM traffic —
        measured ~10-15% decode throughput at GPT-2-small geometry with
        f32 attention/softmax accumulation; pass None for exact f32.
        ``kv_dtype="int8"`` opts the KV cache into per-token int8."""
        import json
        import os
        from neurondb_tpu.ml.bpe import BPETokenizer
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tok = BPETokenizer.from_dir(path)
        params = load_gpt_npz(os.path.join(path, "weights.npz"))
        return cls(params, tok, heads=int(cfg["heads"]), dtype=dtype,
                   kv_dtype=kv_dtype)

    @classmethod
    def random_init(cls, *, vocab_size=257, hidden=64, layers=2, heads=2,
                    max_len=256, seed=0) -> "GPT2LM":
        from neurondb_tpu.ml.bpe import BPETokenizer
        tok = BPETokenizer.byte_fallback()
        params = init_gpt_params(jax.random.PRNGKey(seed),
                                 vocab_size=max(vocab_size, len(tok)),
                                 hidden=hidden, layers=layers, heads=heads,
                                 max_len=max_len)
        return cls(params, tok, heads=heads)

    def _kv_for_batch(self, batch: int) -> bool:
        """KV-cache mode for one call: int8 when pinned, and under
        "auto" only at batch >= 64 — the measured crossover where KV
        reads dominate enough that the cache's bandwidth saving beats
        its dequant compute (BASELINE.md GPT row, r5 A/B)."""
        return self.kv_int8 or (self.kv_auto and batch >= 64)

    def complete(self, prompt: str, *, max_tokens: int = 64,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, seed: int = 0) -> str:
        return self.complete_batch(
            [self.tok.encode(prompt)], max_tokens=max_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p, seed=seed)[0]

    def complete_batch(self, id_lists: List[List[int]], *,
                       max_tokens: int = 64, temperature: float = 0.0,
                       top_k: int = 0, top_p: float = 1.0,
                       seed: int = 0) -> List[str]:
        # Decode positions reach len(prompt)+max_tokens-1; anything past
        # max_len would silently clamp the wpe gather (JAX gather semantics)
        # and reuse the last position embedding. Clamp max_tokens and keep
        # only the tail of each prompt so positions stay in range.
        max_tokens = min(int(max_tokens), self.max_len - 1)
        keep = max(self.max_len - max_tokens, 1)
        id_lists = [list(x)[-keep:] for x in id_lists]
        B = len(id_lists)
        lens = np.asarray([max(len(x), 1) for x in id_lists], np.int32)
        S = _pow2_at_least(int(lens.max()))
        pad_id = self.eos_id if self.eos_id is not None else 0
        ids = np.full((B, S), pad_id, np.int32)
        for b, row in enumerate(id_lists):
            row = row or [pad_id]
            ids[b, S - len(row):] = row
        cache_len = S + _pow2_at_least(max_tokens, 32)
        toks, n_valid = generate_ids(
            self.params, jnp.asarray(ids), jnp.asarray(lens),
            jax.random.PRNGKey(seed), heads=self.heads,
            max_new=max_tokens, cache_len=cache_len,
            temperature=temperature, top_k=top_k, top_p=top_p,
            eos_id=-1 if self.eos_id is None else int(self.eos_id),
            kv_int8=self._kv_for_batch(B))
        toks = np.asarray(toks)
        n_valid = np.asarray(n_valid)
        return [self.tok.decode(toks[b, :n_valid[b]]) for b in range(B)]
