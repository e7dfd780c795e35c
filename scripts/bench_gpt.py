#!/usr/bin/env python
"""Local causal-LM completion throughput (tokens/s) on one TPU chip.

Counterpart of the reference's local hf_complete path
(NeuronDB/src/llm/llm_runtime.c:538 -> gpu_hf_kernels.cu): measures the
ml/gpt.py KV-cache scan decoder at a GPT-2-small-class geometry with
random-init weights — throughput at fixed geometry is identical to real
weights (zero-egress env; same protocol as scripts/bench_rerank.py).

Honest timing through the tunnel (IMPLEMENTATION_NOTES r3 finding 4):
the whole generation is ONE jit (prefill + lax.scan), so a value fetch
of the emitted tokens is a true barrier.

Round 4 (VERDICT r3 item 9): batch sweep + int8 weights + a roofline
note. Per decode step the chip must read every matmul weight once
(shared across the batch) plus each row's KV cache, so

  bytes/step = weight_bytes + 2 * layers * B * cache_len * hidden * kv_bytes
  achieved GB/s = bytes/step / (median_gen_s / max_new)

is a lower bound on HBM traffic (activations and the lm-head logits
are small next to it at these geometries).

  NDB_GPT_DTYPE=int8 NDB_GPT_SWEEP=8,32,128 python scripts/bench_gpt.py

NDB_GPT_KV=int8 additionally stores the KV cache as (int8 codes,
per-token f32 scales) — kv_bytes drops to ~1.06 (1 + 4/head_dim).
NDB_GPT_KV=int8dot also runs both attention dots on the MXU int8 path
against the raw codes (no per-step whole-cache dequant — the VPU work
that capped plain int8 KV at 1.32x; IMPLEMENTATION_NOTES r5 finding 1).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    layers = int(os.environ.get("NDB_GPT_LAYERS", 12))
    hidden = int(os.environ.get("NDB_GPT_HIDDEN", 768))
    heads = int(os.environ.get("NDB_GPT_HEADS", 12))
    prompt_len = int(os.environ.get("NDB_GPT_PROMPT", 128))
    max_new = int(os.environ.get("NDB_GPT_NEW", 128))
    reps = int(os.environ.get("NDB_GPT_REPS", 3))
    sweep = [int(b) for b in os.environ.get(
        "NDB_GPT_SWEEP", os.environ.get("NDB_GPT_B", "32")).split(",")]
    dtype = os.environ.get("NDB_GPT_DTYPE", "bfloat16")  # serving default
    kv_mode = os.environ.get("NDB_GPT_KV", "")
    kv_int8 = kv_mode in ("int8", "int8dot")
    int8_dot = kv_mode == "int8dot"

    import jax
    import jax.numpy as jnp
    from neurondb_tpu.ml.gpt import (generate_ids, init_gpt_params,
                                     quantize_gpt_params)

    vocab = 50257
    params = init_gpt_params(
        jax.random.PRNGKey(0), vocab_size=vocab, hidden=hidden,
        layers=layers, heads=heads, max_len=prompt_len + max_new)
    ff = 4 * hidden
    # matmul params actually read per step (weights shared across batch)
    n_mm = layers * (hidden * 3 * hidden + hidden * hidden
                     + 2 * hidden * ff) + hidden * vocab
    if dtype == "int8":
        params = quantize_gpt_params(params)
        w_bytes = n_mm          # 1 B/param on every matmul weight
        kv_bytes = 2            # serving cache is bf16 (_cache_dtype)
    else:
        dt = jnp.dtype(dtype)
        if dtype != "float32":
            params = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                params)
        w_bytes = n_mm * dt.itemsize
        kv_bytes = 2 if dtype != "float32" else 4   # _cache_dtype rule
    if kv_int8:
        kv_bytes = 1.0 + 4.0 / (hidden // heads)    # codes + f32 scales
    rng = np.random.default_rng(0)
    cache_len = prompt_len + max_new

    rows = []
    for B in sweep:
        ids = rng.integers(0, vocab, (B, prompt_len)).astype(np.int32)
        lens = np.full(B, prompt_len, np.int32)

        def run(seed: int) -> float:
            t0 = time.perf_counter()
            toks, _ = generate_ids(
                params, ids, lens, jax.random.PRNGKey(seed), heads=heads,
                max_new=max_new, cache_len=cache_len, temperature=0.8,
                top_k=40, top_p=0.95, kv_int8=kv_int8,
                int8_dot=int8_dot)
            np.asarray(toks)              # value fetch = true barrier
            return time.perf_counter() - t0

        warm = run(0)                      # compile
        times = sorted(run(1 + r) for r in range(reps))
        med = times[reps // 2]
        step_s = med / max_new
        bytes_step = w_bytes + 2 * layers * B * cache_len * hidden * kv_bytes
        rows.append({
            "batch": B,
            "tokens_per_s": round(B * max_new / med, 1),
            "seconds_per_gen_median": round(med, 3),
            "samples_s": [round(t, 3) for t in times],
            "ms_per_token_step": round(1000.0 * step_s, 2),
            "weight_mb_per_step": round(w_bytes / 1e6, 1),
            "kv_mb_per_step": round((bytes_step - w_bytes) / 1e6, 1),
            "achieved_gb_s": round(bytes_step / step_s / 1e9, 1),
            "compile_plus_first_s": round(warm, 1),
        })

    best = max(rows, key=lambda r: r["tokens_per_s"])
    print(json.dumps({
        "metric": "gpt2_decode_tokens_per_s",
        "value": best["tokens_per_s"],
        "unit": "tokens/s",
        "config": {"layers": layers, "hidden": hidden, "heads": heads,
                   "batch": best["batch"], "prompt": prompt_len,
                   "new": max_new, "dtype": dtype,
                   "kv": kv_mode if kv_mode else "default"},
        "seconds_per_gen_median": best["seconds_per_gen_median"],
        "ms_per_token_step": best["ms_per_token_step"],
        "achieved_gb_s": best["achieved_gb_s"],
        "batch_sweep": rows,
    }))


if __name__ == "__main__":
    main()
