"""GPT-2 causal LM + byte-level BPE: HF parity and generation semantics.

Same zero-egress protocol as test_bert.py: random-init HF models
(transformers is installed, random init downloads nothing) are the
oracle for weight-mapping/forward parity; the BPE tokenizer is
differential-tested against transformers' GPT2Tokenizer on a
constructed vocab. Reference behavior being rebuilt: the
"huggingface-local" completion provider
(NeuronDB/src/llm/llm_router.c:66-95 ->
src/gpu/cuda/gpu_hf_kernels.cu hf_complete).
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neurondb_tpu.ml.bpe import BPETokenizer, bytes_to_unicode  # noqa: E402
from neurondb_tpu.ml.gpt import (GPT2LM, generate_ids, gpt_logits,  # noqa: E402
                                 init_gpt_params, params_from_hf_state_dict)


# ---------------------------------------------------------------------------
# BPE tokenizer
# ---------------------------------------------------------------------------

def _toy_assets(tmp_path):
    """Byte-level base vocab + a few real merges, in HF file format."""
    b2u = bytes_to_unicode()
    units = [b2u[b] for b in range(256)]
    merges = [("h", "e"), ("Ġ", "t"), ("Ġt", "he"), ("l", "l"),
              ("he", "ll"), ("hell", "o")]
    vocab = {u: i for i, u in enumerate(units)}
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp, mp = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab, ensure_ascii=False), encoding="utf-8")
    mp.write_text("#version: 0.2\n"
                  + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
                  encoding="utf-8")
    return str(vp), str(mp), vocab


SAMPLES = [
    "hello the world", " the he hello", "hello,  hello!",
    "don't they're", "tabs\tand\nnewlines  ", "naïve café 日本語",
    "123 abc456", "'s 'll x", "trailing space ", "",
]


def test_bpe_matches_hf_gpt2_tokenizer(tmp_path):
    vp, mp, _ = _toy_assets(tmp_path)
    t_hf = pytest.importorskip("transformers").GPT2Tokenizer(
        vocab_file=vp, merges_file=mp)
    t_us = BPETokenizer.from_files(vp, mp)
    for s in SAMPLES:
        assert t_us.tokenize(s) == t_hf.tokenize(s), s
        assert t_us.encode(s) == t_hf.encode(s), s


def test_bpe_roundtrip_unicode(tmp_path):
    vp, mp, _ = _toy_assets(tmp_path)
    t = BPETokenizer.from_files(vp, mp)
    for s in SAMPLES:
        assert t.decode(t.encode(s)) == s
    # eos stripped on decode
    assert t.decode(t.encode("hello") + [t.eos_id]) == "hello"


def test_bpe_merge_priority(tmp_path):
    vp, mp, _ = _toy_assets(tmp_path)
    t = BPETokenizer.from_files(vp, mp)
    # "hello" -> he+ll -> hell -> hello via ranked merges
    assert t.tokenize("hello") == ["hello"]
    assert t.tokenize("the") == ["t", "he"]       # no (t, he) merge exists
    assert t.tokenize(" the") == ["Ġthe"]


def test_byte_fallback_tokenizer():
    t = BPETokenizer.byte_fallback()
    s = "any text — ünïcode"
    assert t.decode(t.encode(s)) == s
    assert len(t) == 257 and t.eos_id == 256


# ---------------------------------------------------------------------------
# HF GPT2LMHeadModel parity (random init, no downloads)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel
    cfg = GPT2Config(vocab_size=160, n_positions=64, n_embd=32,
                     n_layer=2, n_head=2, attn_pdrop=0.0,
                     embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    model = GPT2LMHeadModel(cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, params_from_hf_state_dict(state), cfg


def test_gpt2_logits_parity(hf_pair):
    import torch
    model, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (3, 17))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(gpt_logits(params, jnp.asarray(ids), heads=cfg.n_head))
    assert np.max(np.abs(got - want)) < 2e-4


def test_gpt2_left_pad_matches_unpadded(hf_pair):
    _, params, cfg = hf_pair
    rng = np.random.default_rng(1)
    row = rng.integers(0, cfg.vocab_size, 9)
    plain = np.asarray(gpt_logits(params, jnp.asarray(row[None]),
                                  heads=cfg.n_head))[0]
    padded = np.concatenate([np.zeros(5, np.int64), row])[None]
    lp = np.asarray(gpt_logits(params, jnp.asarray(padded),
                               heads=cfg.n_head,
                               lens=jnp.asarray([9])))[0, 5:]
    assert np.max(np.abs(lp - plain)) < 1e-4


def test_kv_cache_decode_matches_full_forward(hf_pair):
    """Greedy generate via the scan/KV-cache path must equal repeated
    full-context forwards (the no-cache oracle)."""
    _, params, cfg = hf_pair
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, 7).tolist()
    # oracle: token-by-token argmax with full forwards
    seq = list(prompt)
    for _ in range(8):
        lg = np.asarray(gpt_logits(params, jnp.asarray([seq]),
                                   heads=cfg.n_head))
        seq.append(int(lg[0, -1].argmax()))
    want = seq[len(prompt):]

    ids = jnp.asarray([prompt], jnp.int32)
    lens = jnp.asarray([len(prompt)], jnp.int32)
    toks, n = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                           heads=cfg.n_head, max_new=8, cache_len=32,
                           temperature=0.0)
    assert np.asarray(toks)[0].tolist() == want
    assert int(np.asarray(n)[0]) == 8               # no eos hit


def test_int8_kv_cache_decode(hf_pair):
    """The int8 KV cache (per-token, per-head symmetric quantization of
    the dominant decode HBM stream) must (a) bound the cache dequant
    error by half a quantization step and (b) greedy-decode the same
    tokens as the exact cache on this geometry."""
    from neurondb_tpu.ml.gpt import _dequant_kv, _prefill
    _, params, cfg = hf_pair
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, cfg.vocab_size, 9).tolist()
    ids = jnp.asarray([prompt], jnp.int32)
    lens = jnp.asarray([len(prompt)], jnp.int32)

    _, exact = _prefill(params, ids, lens, cfg.n_head, 16)
    _, quant = _prefill(params, ids, lens, cfg.n_head, 16, kv_int8=True)
    for e, qe in zip(exact["k"] + exact["v"], quant["k"] + quant["v"]):
        e = np.asarray(e, np.float32)
        dq = np.asarray(_dequant_kv(qe), np.float32)
        step = np.abs(e).max(-1, keepdims=True) / 127.0
        # half a quantization step, plus bf16 rounding of codes*scales
        assert np.all(np.abs(dq - e) <= 0.5 * step + np.abs(e) * 2**-7
                      + 1e-6)

    want, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                           heads=cfg.n_head, max_new=8, cache_len=32,
                           temperature=0.0)
    got, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                          heads=cfg.n_head, max_new=8, cache_len=32,
                          temperature=0.0, kv_int8=True)
    assert np.asarray(got)[0].tolist() == np.asarray(want)[0].tolist()


def test_int8_dot_decode(hf_pair):
    """int8 attention dots (r5: both decode dots on the MXU int8 path
    against raw cache codes, per-token scales folded as rank-1 output
    rescales) add only int8 rounding of q and of the softmax weights
    on top of the int8 cache — greedy decode must match the exact-cache
    tokens on this geometry."""
    _, params, cfg = hf_pair
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, 9).tolist()
    ids = jnp.asarray([prompt], jnp.int32)
    lens = jnp.asarray([len(prompt)], jnp.int32)
    want, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                           heads=cfg.n_head, max_new=8, cache_len=32,
                           temperature=0.0)
    got, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                          heads=cfg.n_head, max_new=8, cache_len=32,
                          temperature=0.0, int8_dot=True)
    assert np.asarray(got)[0].tolist() == np.asarray(want)[0].tolist()


def test_generate_batch_left_pad_consistency(hf_pair):
    """Rows of a left-padded batch generate the same greedy tokens as
    each row alone."""
    _, params, cfg = hf_pair
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, cfg.vocab_size, 4).tolist()
    p2 = rng.integers(0, cfg.vocab_size, 9).tolist()
    S = 9
    ids = np.zeros((2, S), np.int32)
    ids[0, S - 4:] = p1
    ids[1] = p2
    toks, _ = generate_ids(params, jnp.asarray(ids),
                           jnp.asarray([4, 9], jnp.int32),
                           jax.random.PRNGKey(0), heads=cfg.n_head,
                           max_new=6, cache_len=32, temperature=0.0)
    toks = np.asarray(toks)
    for row, p in ((0, p1), (1, p2)):
        solo_ids = jnp.asarray([p], jnp.int32)
        solo, _ = generate_ids(params, solo_ids,
                               jnp.asarray([len(p)], jnp.int32),
                               jax.random.PRNGKey(0), heads=cfg.n_head,
                               max_new=6, cache_len=32, temperature=0.0)
        assert toks[row].tolist() == np.asarray(solo)[0].tolist()


def test_eos_latch_and_sampling_filters(hf_pair):
    _, params, cfg = hf_pair
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    # greedy with eos = whatever greedy emits first -> all-eos afterwards
    toks, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                           heads=cfg.n_head, max_new=5, cache_len=16,
                           temperature=0.0)
    first = int(np.asarray(toks)[0, 0])
    toks2, n2 = generate_ids(params, ids, lens, jax.random.PRNGKey(0),
                             heads=cfg.n_head, max_new=5, cache_len=16,
                             temperature=0.0, eos_id=first)
    assert np.asarray(toks2)[0].tolist() == [first] * 5
    assert int(np.asarray(n2)[0]) == 1
    # top_k=1 sampling == greedy at any temperature
    toks3, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(7),
                            heads=cfg.n_head, max_new=5, cache_len=16,
                            temperature=1.5, top_k=1)
    assert np.asarray(toks3)[0].tolist() == np.asarray(toks)[0].tolist()
    # top_p ~ 0 also collapses to argmax
    toks4, _ = generate_ids(params, ids, lens, jax.random.PRNGKey(7),
                            heads=cfg.n_head, max_new=5, cache_len=16,
                            temperature=1.5, top_p=1e-6)
    assert np.asarray(toks4)[0].tolist() == np.asarray(toks)[0].tolist()


def test_init_params_shapes_roundtrip():
    p = init_gpt_params(jax.random.PRNGKey(0), vocab_size=64, hidden=16,
                        layers=1, heads=2, max_len=32)
    lg = gpt_logits(p, jnp.zeros((1, 4), jnp.int32), heads=2)
    assert lg.shape == (1, 4, 64)
    assert np.isfinite(np.asarray(lg)).all()


# ---------------------------------------------------------------------------
# service wrapper + router wiring
# ---------------------------------------------------------------------------

def test_gpt2lm_complete_roundtrip():
    lm = GPT2LM.random_init(hidden=32, layers=1, heads=2, max_len=128,
                            seed=0)
    out = lm.complete("ab", max_tokens=4, temperature=0.0)
    assert isinstance(out, str)
    # determinism
    assert out == lm.complete("ab", max_tokens=4, temperature=0.0)
    two = lm.complete_batch([lm.tok.encode("ab"), lm.tok.encode("xyz")],
                            max_tokens=4)
    assert len(two) == 2 and all(isinstance(t, str) for t in two)


def test_kv_auto_routes_by_batch_size():
    """kv_dtype="auto" encodes the measured serving crossover: int8 KV
    wins only once per-step KV reads dominate (B >= 64 — r5 A/B,
    IMPLEMENTATION_NOTES finding 1); below that the dequant compute
    makes it a loss, so auto keeps bf16."""
    lm = GPT2LM.random_init(hidden=32, layers=1, heads=2, max_len=128,
                            seed=0)
    lm.kv_auto, lm.kv_int8 = True, False
    assert not lm._kv_for_batch(8)
    assert not lm._kv_for_batch(63)
    assert lm._kv_for_batch(64)
    assert lm._kv_for_batch(128)
    lm.kv_auto, lm.kv_int8 = False, True          # pinned int8: always
    assert lm._kv_for_batch(1)
    lm.kv_auto = lm.kv_int8 = False               # default: never
    assert not lm._kv_for_batch(1024)
    # auto at small B decodes identically to the default bf16 path
    auto = GPT2LM.random_init(hidden=32, layers=1, heads=2, max_len=128,
                              seed=0)
    auto.kv_auto = True
    assert (auto.complete("ab", max_tokens=4, temperature=0.0)
            == lm.complete("ab", max_tokens=4, temperature=0.0))


def test_local_provider_generative_path(monkeypatch, tmp_path):
    """LocalProvider.complete routes through GPT2LM when weights are
    configured (the huggingface-local provider path), and stays
    extractive otherwise."""
    from neurondb_tpu.service.llm import LocalProvider
    prov = LocalProvider()
    assert prov.complete("a. b. c.").startswith("[extractive-local]")
    lm = GPT2LM.random_init(hidden=32, layers=1, heads=2, max_len=128)
    prov2 = LocalProvider(lm=lm)
    out = prov2.complete("hi", max_tokens=3)
    assert isinstance(out, str)
    assert not out.startswith("[extractive-local]")


# ---------------------------------------------------------------------------
# advisor regressions (round 3 ADVICE.md)
# ---------------------------------------------------------------------------

def test_complete_batch_truncates_long_prompts():
    """Prompts longer than max_len - max_tokens must be tail-truncated so
    decode positions never exceed the wpe table (JAX clamps gathers
    silently, degrading output instead of erroring)."""
    lm = GPT2LM.random_init(hidden=32, layers=1, heads=2, max_len=64)
    long_ids = lm.tok.encode("x" * 500)          # way past max_len
    assert len(long_ids) > lm.max_len
    out = lm.complete_batch([long_ids], max_tokens=8, temperature=0.0)
    # must equal completing from just the kept tail
    tail = long_ids[-(lm.max_len - 8):]
    ref = lm.complete_batch([tail], max_tokens=8, temperature=0.0)
    assert out == ref


def test_complete_max_tokens_clamped_to_context():
    lm = GPT2LM.random_init(hidden=32, layers=1, heads=2, max_len=64)
    # max_tokens >= max_len used to produce a wrong-slice keep; now clamps
    out = lm.complete("ab", max_tokens=lm.max_len + 10, temperature=0.0)
    assert isinstance(out, str)


def test_merges_tolerates_whitespace(tmp_path):
    vp, mp, _ = _toy_assets(tmp_path)
    # rewrite merges with trailing spaces + blank lines, as some real
    # exported files have; HF's GPT2Tokenizer tolerates these
    lines = open(mp, encoding="utf-8").read().splitlines()
    dirty = [lines[0]] + [ln + "  " for ln in lines[1:]] + ["", "   "]
    mp2 = tmp_path / "merges_dirty.txt"
    mp2.write_text("\n".join(dirty) + "\n", encoding="utf-8")
    t_clean = BPETokenizer.from_files(vp, mp)
    t_dirty = BPETokenizer.from_files(vp, str(mp2))
    assert t_dirty.ranks == t_clean.ranks
    assert t_dirty.tokenize("hello the") == t_clean.tokenize("hello the")


def test_decode_truncates_at_first_eos_and_keeps_special_tokens(tmp_path):
    vp, mp, vocab = _toy_assets(tmp_path)
    t = BPETokenizer.from_files(vp, mp)
    h = t.encode("hello")
    # everything after the FIRST eos is generation padding and dropped
    assert t.decode(h + [t.eos_id] + h) == "hello"
    # a special token outside the byte->unicode plane passes through
    # verbatim instead of vanishing
    t.vocab["<|special|>"] = len(t.vocab)
    t.inv_vocab[t.vocab["<|special|>"]] = "<|special|>"
    out = t.decode(h + [t.vocab["<|special|>"]] + h)
    assert out == "hello<|special|>hello"
