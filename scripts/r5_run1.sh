#!/bin/bash
# Round-5 measurement batch, reordered: highest-value phases first so a
# wall-clock cutoff loses the least. ONE TPU process at a time.
cd "$(dirname "$0")/.."
set -u

echo "=== calibration $(date +%H:%M:%S) ==="
timeout 420 python -u -c "
import importlib.util
spec = importlib.util.spec_from_file_location('bench', 'bench.py')
b = importlib.util.module_from_spec(spec); spec.loader.exec_module(b)
print('calibration:', b.calibration_probe(), flush=True)
" 2>&1 | grep --line-buffered -v WARNING

echo "=== gpt int8dot A/B $(date +%H:%M:%S) ==="
for KV in "" int8 int8dot; do
    echo "--- NDB_GPT_KV=$KV"
    NDB_GPT_DTYPE=int8 NDB_GPT_KV=$KV NDB_GPT_SWEEP=32,128 \
        timeout 1200 python -u scripts/bench_gpt.py 2>&1 \
        | grep --line-buffered -v WARNING
done

echo "=== hnsw 1M build+qps $(date +%H:%M:%S) ==="
NDB_BENCH_N=1000000 timeout 2400 python -u scripts/bench_hnsw.py 2>&1 \
    | grep --line-buffered -v WARNING

echo "=== bm25 zipf 4M $(date +%H:%M:%S) ==="
NDB_BENCH_DOCS=4000000 \
    timeout 3000 python -u scripts/bench_bm25_zipf.py 2>&1 \
    | grep --line-buffered -v WARNING

echo "=== rest wire A/B 200k $(date +%H:%M:%S) ==="
for W in json bin; do
    NDB_BENCH_N=200000 NDB_REST_SECONDS=10 NDB_REST_WIRE=$W \
        timeout 900 python -u scripts/bench_rest.py 2>&1 \
        | grep --line-buffered -v WARNING | tail -1
done

echo "=== hybrid 1M $(date +%H:%M:%S) ==="
NDB_BENCH_N=1000000 NDB_BENCH_DOCS=1000000 \
    timeout 2400 python -u scripts/bench_extra.py 2>&1 \
    | grep --line-buffered -v WARNING

echo "=== done $(date +%H:%M:%S) ==="
