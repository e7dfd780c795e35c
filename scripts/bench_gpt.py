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

  NDB_GPT_LAYERS=12 NDB_GPT_HIDDEN=768 NDB_GPT_B=8 python scripts/bench_gpt.py
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
    B = int(os.environ.get("NDB_GPT_B", 8))
    prompt_len = int(os.environ.get("NDB_GPT_PROMPT", 128))
    max_new = int(os.environ.get("NDB_GPT_NEW", 128))
    reps = int(os.environ.get("NDB_GPT_REPS", 3))

    import jax
    import jax.numpy as jnp
    from neurondb_tpu.ml.gpt import generate_ids, init_gpt_params

    params = init_gpt_params(
        jax.random.PRNGKey(0), vocab_size=50257, hidden=hidden,
        layers=layers, heads=heads, max_len=prompt_len + max_new)
    dtype = os.environ.get("NDB_GPT_DTYPE", "bfloat16")  # serving default
    if dtype != "float32":
        dt = jnp.dtype(dtype)
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 50257, (B, prompt_len)).astype(np.int32)
    lens = np.full(B, prompt_len, np.int32)
    cache_len = prompt_len + max_new

    def run(seed: int) -> float:
        t0 = time.perf_counter()
        toks, _ = generate_ids(
            params, ids, lens, jax.random.PRNGKey(seed), heads=heads,
            max_new=max_new, cache_len=cache_len, temperature=0.8,
            top_k=40, top_p=0.95)
        np.asarray(toks)                      # value fetch = true barrier
        return time.perf_counter() - t0

    warm = run(0)                              # compile
    times = sorted(run(1 + r) for r in range(reps))
    med = times[reps // 2]
    toks_per_s = B * max_new / med
    print(json.dumps({
        "metric": "gpt2_decode_tokens_per_s",
        "value": round(toks_per_s, 1),
        "unit": "tokens/s",
        "config": {"layers": layers, "hidden": hidden, "heads": heads,
                   "batch": B, "prompt": prompt_len, "new": max_new,
                   "dtype": dtype},
        "seconds_per_gen_median": round(med, 3),
        "samples_s": [round(t, 3) for t in times],
        "compile_plus_first_s": round(warm, 1),
        "ms_per_token_step": round(1000.0 * med / max_new, 2),
    }))


if __name__ == "__main__":
    main()
