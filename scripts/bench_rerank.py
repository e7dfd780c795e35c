#!/usr/bin/env python
"""End-to-end cross-encoder rerank throughput: tokenize + encode + score
(query, doc) pairs at 512 tokens through a BERT-base-shaped encoder with
the flash-attention kernel, as the serving rerank stage would
(NeuronDB/src/ml/ml_reranking_flash.c:64,125 rerank_flash semantics).

Weights are random-init (zero-egress environment) — throughput is
identical to real weights at the same geometry; only the scores differ.
Prints one JSON line per batch size with docs/sec and the tokenizer's
share of wall time (the host-side cost a service must pipeline).

Usage: python scripts/bench_rerank.py   [env: NDB_RERANK_LAYERS=12]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from neurondb_tpu.ml.bert import bert_encode, init_bert_params
    from neurondb_tpu.ml.tokenizer import WordPieceTokenizer

    layers = int(os.environ.get("NDB_RERANK_LAYERS", 12))
    hidden = int(os.environ.get("NDB_RERANK_HIDDEN", 768))
    heads, max_len = hidden // 64, 512
    params = init_bert_params(jax.random.PRNGKey(0), hidden=hidden,
                              layers=layers, heads=heads, ff=4 * hidden,
                              max_len=max_len)

    # WordPiece over a synthetic vocab (HF vocab.txt format)
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + [
        f"w{i}" for i in range(2000)] + [f"##s{i}" for i in range(200)]
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("\n".join(words))
        vocab_path = f.name
    tok = WordPieceTokenizer.from_file(vocab_path)

    rng = np.random.default_rng(0)
    def mktext(n_words):
        return " ".join(f"w{int(i)}" for i in rng.integers(0, 2000, n_words))
    query = mktext(24)
    docs = [mktext(480) for _ in range(256)]     # fills 512 tokens

    import functools
    use_flash = jax.default_backend() == "tpu"
    ITERS = 4

    # block_until_ready is not a reliable device timer through the axon
    # tunnel (IMPLEMENTATION_NOTES hazard); chain ITERS encodes inside
    # one jit with a data dependency and divide the wall by ITERS.
    @jax.jit
    def chain(params, ids, types):
        # params as an argument, NOT a closure: closed-over weights are
        # inlined as HLO constants and the 110M-param program exceeds
        # the remote-compile tunnel's request size limit (HTTP 413)
        def body(c, _):
            out = bert_encode(params, c, types, heads=heads,
                              use_flash=use_flash)
            s = out["score"].sum()
            # REAL data dependency: (s*0) constant-folds and XLA then
            # hoists the loop-invariant encoder out of the scan (it
            # "ran" ITERS iterations in 0.1 ms). Perturb the ids with a
            # value XLA cannot fold; encoder cost is id-independent.
            sint = jax.lax.bitcast_convert_type(s, jnp.int32)
            return jnp.abs(c + sint % 3) % 1000, s
        _, ss = jax.lax.scan(body, ids, None, length=ITERS)
        return ss

    for B in (32, 64):
        pairs = docs[:B]
        # warm (compile)
        enc = [tok.encode_pair(query, d, max_len) for d in pairs]
        ids = jnp.asarray(np.stack([e[0] for e in enc]))
        types = jnp.asarray(np.stack([e[1] for e in enc]))
        np.asarray(chain(params, ids, types))        # warm (compile)
        reps, tok_s, enc_s = 3, 0.0, 0.0
        for _ in range(reps):
            t0 = time.time()
            enc = [tok.encode_pair(query, d, max_len) for d in pairs]
            ids = jnp.asarray(np.stack([e[0] for e in enc]))
            types = jnp.asarray(np.stack([e[1] for e in enc]))
            t1 = time.time()
            # np.asarray forces a VALUE fetch — block_until_ready
            # returns early through the tunnel (0.1 "ms" for a 3.6
            # TFLOP forward); only materialized bytes are honest
            np.asarray(chain(params, ids, types))
            t2 = time.time()
            tok_s += t1 - t0
            enc_s += (t2 - t1) / ITERS
        wall = tok_s + enc_s
        print(json.dumps({
            "metric": "cross_encoder_rerank_docs_per_s",
            "value": round(reps * B / wall, 1), "unit": "docs/s",
            "batch": B, "seq_len": max_len, "layers": layers,
            "hidden": hidden,
            "tokenizer_share": round(tok_s / wall, 3),
            "encode_ms_per_batch": round(1000 * enc_s / reps, 1),
            "encode_bound_docs_per_s": round(reps * B / enc_s, 1),
            "backend": jax.default_backend()}), flush=True)

    # ---- tokenizer-pipelined serving A/B (VERDICT r4 item 8): score
    # 256 docs in sub-batches of 64. serial = tokenize -> dispatch ->
    # FETCH each sub-batch (tokenizer and device strictly alternate);
    # pipelined = dispatch each sub-batch WITHOUT a fetch so tokenizing
    # sub-batch i+1 overlaps encoding sub-batch i, one fetch pass at the
    # end. Same single-encode jit both sides; value fetches only
    # (block_until_ready returns early through the tunnel).
    @jax.jit
    def enc1(params, ids, types):
        return bert_encode(params, ids, types, heads=heads,
                           use_flash=use_flash)["score"]

    B, total = 64, 256
    all_docs = docs[:total]
    e = [tok.encode_pair(query, d, max_len) for d in all_docs[:B]]
    np.asarray(enc1(params, jnp.asarray(np.stack([x[0] for x in e])),
                    jnp.asarray(np.stack([x[1] for x in e]))))  # warm
    for mode in ("serial", "pipelined"):
        walls = []
        for _ in range(3):
            t0 = time.time()
            outs = []
            for s in range(0, total, B):
                e = [tok.encode_pair(query, d, max_len)
                     for d in all_docs[s: s + B]]
                o = enc1(params,
                         jnp.asarray(np.stack([x[0] for x in e])),
                         jnp.asarray(np.stack([x[1] for x in e])))
                if mode == "serial":
                    o = np.asarray(o)
                outs.append(o)
            for o in outs:
                np.asarray(o)
            walls.append(time.time() - t0)
        w = sorted(walls)[1]
        print(json.dumps({
            "metric": f"cross_encoder_{mode}_docs_per_s",
            "value": round(total / w, 1), "unit": "docs/s",
            "batch": B, "total_docs": total, "seq_len": max_len,
            "wall_s_median": round(w, 3),
            "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
